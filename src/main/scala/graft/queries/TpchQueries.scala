package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Capability extensions beyond the reference's own operator set (SURVEY.md
  * §7.2 step 4): the join family, top-k, rollup, distinct aggregation and set
  * operations, exercised on the TPC-H-style harness tables.
  *
  * Scale notes (the point of this library): dimension tables (region, nation,
  * and at bench scale customer) are broadcast so the fact-side scan never
  * shuffles for the join; aggregations rely on Catalyst's partial/final
  * hash-aggregate split so only group keys cross the wire; AQE (on by
  * default in Spark 4) coalesces post-shuffle partitions and handles skew.
  */
object TpchQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  // --------------------------------------------------------------------------
  // q1_agg — the TPC-H Q1 pricing-summary shape: scan-heavy filter + wide
  // hash aggregation. Filter + projection are pushed into the parquet scan.
  // --------------------------------------------------------------------------
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    // NOT spread: A/B-measured 1.6x slower — the keyless fan-out pays a
    // sort-before-repartition plus an exchange that the single-task decimal
    // partial aggregation never earns back at this row count
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1999-12-31 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(LongType)).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty").cast(DoubleType) / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------------------
  // q_join_agg — multiway star join orders→customer→nation→region with
  // explicit broadcast of the small dimensions (no shuffle on the dim side).
  // --------------------------------------------------------------------------
  def joinAgg(spark: SparkSession, dir: String): DataFrame =
    // NOT spread: bench-methodology A/B across four runs read the keyed
    // fan-out 1.2-1.6x slower (broadcast dims + low-cardinality rollup
    // never reuse the exchange)
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))

  val joinAggSql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // --------------------------------------------------------------------------
  // q_semi_join — EXISTS as left_semi: customers with at least one big order.
  // --------------------------------------------------------------------------
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_totalprice") > 400000).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  val semiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin

  // --------------------------------------------------------------------------
  // q_anti_join — NOT EXISTS as left_anti: customers with no open order.
  // --------------------------------------------------------------------------
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderstatus") === "O").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin

  // --------------------------------------------------------------------------
  // q_topk — global top-k with deterministic tiebreak (sort + limit; Spark
  // plans this as TakeOrderedAndProject — no full sort of the big side).
  // --------------------------------------------------------------------------
  def topk(spark: SparkSession, dir: String): DataFrame =
    // spread keyed by o_custkey: the per-customer aggregate reuses it
    Tables.spread(Tables.orders(spark, dir), col("o_custkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_spend"), count(lit(1)).as("n_orders"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .orderBy(col("total_spend").desc, col("c_custkey").asc)
      .limit(10)
      .select(col("c_custkey"), col("c_name"), col("total_spend"), col("n_orders"))

  val topkSql: String =
    """SELECT c_custkey, c_name, total_spend, n_orders FROM (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY o_custkey) t
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_spend DESC, c_custkey ASC
      |LIMIT 10""".stripMargin

  // --------------------------------------------------------------------------
  // q_window_rank — per-group top-n via row_number (the ranking window the
  // reference lacks but its dedupe spec implies, SURVEY.md §2.6/§2.10).
  // --------------------------------------------------------------------------
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // spread keyed by o_custkey: the ranking window reuses it
    Tables.spread(Tables.orders(spark, dir), col("o_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  val windowRankSql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders) t
      |WHERE rk <= 3""".stripMargin

  // --------------------------------------------------------------------------
  // q_rollup — hierarchical aggregate (GROUPING SETS family).
  // --------------------------------------------------------------------------
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    // NOT spread: A/B-measured 2.1x slower (see q1Agg)
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(LongType)).as("sum_qty"))

  val rollupAggSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // --------------------------------------------------------------------------
  // q_distinct_agg — multi-column COUNT(DISTINCT) (Catalyst expand+two-phase).
  // --------------------------------------------------------------------------
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    // NOT spread: A/B-measured 1.9x slower (see q1Agg)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  val distinctAggSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // --------------------------------------------------------------------------
  // q_cube — full grouping-sets lattice over two dimensions.
  // --------------------------------------------------------------------------
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    // NOT spread: A/B-measured 1.2x slower (see q1Agg)
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))

  val cubeAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // --------------------------------------------------------------------------
  // q_running_sum — explicit window frame (ROWS UNBOUNDED PRECEDING..CURRENT):
  // cumulative revenue per customer in order-date order.
  // --------------------------------------------------------------------------
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NOT spread: A/B-measured slower (the window pays its exchange anyway)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"),
        count(lit(1)).over(w).as("nth_order"))
  }

  val runningSumSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend,
      |  COUNT(*) OVER w AS nth_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // --------------------------------------------------------------------------
  // q_intersect / q_except — set operations (absent from the reference,
  // SURVEY.md §2.7; DISTINCT semantics match ANSI INTERSECT/EXCEPT).
  // --------------------------------------------------------------------------
  private def custsWithStatus(spark: SparkSession, dir: String, st: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_orderstatus") === st)
      .select(col("o_custkey")).distinct()

  def intersectOp(spark: SparkSession, dir: String): DataFrame =
    custsWithStatus(spark, dir, "O").intersect(custsWithStatus(spark, dir, "F"))

  val intersectSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  def exceptOp(spark: SparkSession, dir: String): DataFrame =
    custsWithStatus(spark, dir, "O").except(custsWithStatus(spark, dir, "F"))

  val exceptSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  // --------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"         -> (q1Agg _),
    "q_join_agg"     -> (joinAgg _),
    "q_semi_join"    -> (semiJoin _),
    "q_anti_join"    -> (antiJoin _),
    "q_topk"         -> (topk _),
    "q_window_rank"  -> (windowRank _),
    "q_rollup"       -> (rollupAgg _),
    "q_distinct_agg" -> (distinctAgg _),
    "q_intersect"    -> (intersectOp _),
    "q_except"       -> (exceptOp _),
    "q_cube"         -> (cubeAgg _),
    "q_running_sum"  -> (runningSum _),
  )

  val oracles: Map[String, String] = Map(
    "q1_agg"         -> q1AggSql,
    "q_join_agg"     -> joinAggSql,
    "q_semi_join"    -> semiJoinSql,
    "q_anti_join"    -> antiJoinSql,
    "q_topk"         -> topkSql,
    "q_window_rank"  -> windowRankSql,
    "q_rollup"       -> rollupAggSql,
    "q_distinct_agg" -> distinctAggSql,
    "q_intersect"    -> intersectSql,
    "q_except"       -> exceptSql,
    "q_cube"         -> cubeAggSql,
    "q_running_sum"  -> runningSumSql,
  )
}
