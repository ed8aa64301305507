package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{EventKpis, ExtQueries, SkippingQueries, TpchQueries, TextQueries, SimilarityQueries}
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
      SkippingQueries.queries ++
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
        // approximate distinct via the deterministic KMV sketch
        // (graft.functions.KmvSketchAgg): same mergeable-bounded-state shape
        // as HLL++, but the estimate is a pure function of md5 hashes, so
        // the VALUE (not just the row count) checks against the DuckDB
        // oracle. At sf0.001 groups stay under k (exact path); at sf0.01
        // they exceed it (estimator path) — both branches are oracle-hit.
        "q_approx_distinct" -> ((s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions.{col, count, lit}
          graft.sources.Tables.lineitem(s, dir)
            .groupBy(col("l_returnflag"))
            .agg(
              // the agg md5-hashes its input internally
              graft.functions.KmvSketchAgg(
                col("l_partkey").cast("string"), KmvK).as("approx_parts"),
              count(lit(1)).as("n_rows"))
        }),
      )

  private val KmvK = 1024

  private val approxDistinctSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS hx
       |  FROM lineitem),
       |r AS (
       |  SELECT l_returnflag, hx,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hx) AS rn,
       |    COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
       |  FROM h),
       |est AS (
       |  SELECT l_returnflag,
       |    CASE WHEN MAX(nd) < $KmvK THEN MAX(nd)
       |      ELSE CAST(FLOOR(CAST(${KmvK - 1} AS DOUBLE) * CAST(4503599627370496 AS DOUBLE) /
       |        GREATEST(CAST(concat('0x',
       |          substr(MAX(CASE WHEN rn = $KmvK THEN hx END), 1, 13)) AS BIGINT), 1))
       |        AS BIGINT)
       |    END AS approx_parts
       |  FROM r GROUP BY 1),
       |cnt AS (SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem GROUP BY 1)
       |SELECT e.l_returnflag, CAST(e.approx_parts AS BIGINT) AS approx_parts, c.n_rows
       |FROM est e JOIN cnt c USING (l_returnflag)""".stripMargin

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
      SkippingQueries.oracles ++
      Map(
        "q_asof_join" -> AsOfJoin.purchaseAsofSignupSql,
        "q_asof_native" -> AsOfJoin.purchaseAsofSignupSql,
        "q_sessionize" -> Sessionize.sessionStatsSql,
        "q_approx_distinct" -> approxDistinctSql,
      )
}
