package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{EventKpis, ExtQueries, TpchQueries, TextQueries, SimilarityQueries}
import graft.operators.{AsOfJoin, Multimodal, NearDup, Sessionize}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query has a DuckDB oracle in [[oracleSql]]; the per-module
  * maps keep query/oracle pairs adjacent to the implementation they verify.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventKpis.queries ++
      TpchQueries.queries ++
      TextQueries.queries ++
      SimilarityQueries.queries ++
      NearDup.queries ++
      Multimodal.queries ++
      ExtQueries.queries ++
      Map(
        "q_asof_join" -> (AsOfJoin.purchaseAsofSignup _),
        // same semantics through the custom LogicalPlan/Strategy/SparkPlan
        // operator (graft.plans.NativeAsOfJoin) — one exchange+sort per side,
        // streaming merge, no union materialization
        "q_asof_native" -> ((s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions.{col, to_date}
          val ev = graft.sources.Tables.events(s, dir)
          graft.plans.NativeAsOfJoin.backward(
              ev.filter(col("event_type") === "purchase")
                .select(col("event_id"), col("user_id"), col("ts")),
              ev.filter(col("event_type") === "signup")
                .select(col("user_id"), col("ts"), col("event_id").as("sid")),
              Seq("user_id"), "ts", "ts", Map("sid" -> "signup_event_id"))
            .select(col("event_id"), col("user_id"),
              to_date(col("ts")).as("p_date"), col("signup_event_id"))
        }),
        "q_sessionize" -> (Sessionize.sessionStats _),
        // approximate distinct sketch (HLL++): rows-only check — approx
        // values are engine-specific so no DuckDB oracle is declared
        "q_approx_distinct" -> ((s: SparkSession, dir: String) =>
          graft.sources.Tables.lineitem(s, dir)
            .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
            .agg(
              org.apache.spark.sql.functions
                .approx_count_distinct(org.apache.spark.sql.functions.col("l_partkey"))
                .as("approx_parts"),
              org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("n_rows"))),
      )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventKpis.oracles ++
      TpchQueries.oracles ++
      TextQueries.oracles ++
      SimilarityQueries.oracles ++
      NearDup.oracles ++
      Multimodal.oracles ++
      ExtQueries.oracles ++
      Map(
        "q_asof_join" -> AsOfJoin.purchaseAsofSignupSql,
        "q_asof_native" -> AsOfJoin.purchaseAsofSignupSql,
        "q_sessionize" -> Sessionize.sessionStatsSql,
      )
}
