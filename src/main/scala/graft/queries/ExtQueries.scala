package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Salting
import graft.sources.Tables

/** Second wave of capability extensions: deeper multi-join TPC-H shapes,
  * an equi+range join, skew-salted aggregation, and a rolling-hash
  * document fingerprint.
  */
object ExtQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def revenue: Column =
    sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
      .cast(DoubleType)

  // --------------------------------------------------------------------------
  // q_tpch_q3 — shipping-priority shape: segment filter → 3-way join →
  // revenue per order → top-20. Both date filters push to the scans; the
  // order-side join is shuffle, the final top-k is TakeOrderedAndProject.
  // --------------------------------------------------------------------------
  def tpchQ3(spark: SparkSession, dir: String): DataFrame =
    // NOT spread: A/B-measured slower (selective customer filter shrinks
    // the join early; the fan-out exchanges never pay off)
    Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-07-01 00:00:00").cast(TimestampType))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-07-01 00:00:00").cast(TimestampType))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(20)

  val tpchQ3Sql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey ASC
      |LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q5 — local-supplier-volume shape: 6-table join with the
  // customer-nation = supplier-nation co-location condition; region filter
  // prunes via the broadcast dimension chain.
  // --------------------------------------------------------------------------
  def tpchQ5(spark: SparkSession, dir: String): DataFrame =
    // fact sides spread keyed by the l⋈o join key (see tpchQ3); dims broadcast
    Tables.customer(spark, dir)
      .join(Tables.spread(Tables.orders(spark, dir), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
      .join(Tables.spread(Tables.lineitem(spark, dir), col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))

  val tpchQ5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q17 — small-quantity-revenue shape (TPC-H Q17): lineitems whose
  // quantity is below half the per-part average, grouped by brand. The
  // per-part average is a CORRELATED scalar subquery — Catalyst's
  // decorrelation (RewriteCorrelatedScalarSubquery) turns each subquery
  // into a per-partkey aggregate joined back on the correlation key, so the
  // physical plan is two shuffled aggregates + equi-joins, never a
  // per-outer-row re-scan. That rewrite is what makes the shape viable at
  // 100 TB: the subquery aggregate is computed ONCE per part, not once per
  // probing lineitem.
  //
  // Determinism: `qty < 0.5 * avg(qty)` is restated as `2*qty*cnt < sum`
  // in exact DECIMAL/BIGINT arithmetic — a floating-point average would be
  // summation-order-dependent and could flip boundary rows between engines.
  // --------------------------------------------------------------------------
  def tpchQ17(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread: A/B-measured 1.24x slower — the decorrelated aggregates
    // already share their exchange via ReuseExchange
    Tables.lineitem(spark, dir).createOrReplaceTempView("q17_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("q17_part")
    // the quantity half of the comparison runs in BIGINT, not DECIMAL:
    // l_quantity is integral (1..50, all SFs), so `2*qty*cnt < sum(qty)`
    // over longs is the same exact predicate (2*50*cnt stays far below
    // 2^63 at any scale) while both per-part aggregates sum a primitive in
    // codegen instead of per-row Decimal objects. The revenue sum keeps
    // DECIMAL — extendedprice has cents, where doubles/longs would not be
    // exact without a cents re-encoding. Oracle unchanged (it may keep the
    // decimal spelling; the qualifying row set is provably identical).
    spark.sql(
      """SELECT p.p_brand,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue,
        |  COUNT(*) AS n_small
        |FROM q17_lineitem l JOIN q17_part p ON p.p_partkey = l.l_partkey
        |WHERE 2 * CAST(l.l_quantity AS BIGINT) *
        |      (SELECT COUNT(*) FROM q17_lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        |    < (SELECT SUM(CAST(l3.l_quantity AS BIGINT))
        |       FROM q17_lineitem l3 WHERE l3.l_partkey = p.p_partkey)
        |GROUP BY p.p_brand""".stripMargin)
  }

  val tpchQ17Sql: String =
    """SELECT p.p_brand,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_small
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE CAST(2 AS DECIMAL(2,0)) * CAST(l.l_quantity AS DECIMAL(18,2)) *
      |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      |    < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,2)))
      |       FROM lineitem l3 WHERE l3.l_partkey = p.p_partkey)
      |GROUP BY p.p_brand""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q20 — dominant-supplier shape (TPC-H Q20's nesting: an IN
  // subquery whose body contains a CORRELATED scalar aggregate; adapted to
  // this schema's columns — no partsupp table, so "availqty vs half the
  // shipped quantity" becomes "supplier ships >20% of a part's total").
  // Catalyst decorrelates BOTH levels: the scalar subquery becomes a
  // per-partkey aggregate joined back on the correlation key, and the IN
  // becomes a left-semi hash join — so the plan is three shuffled
  // aggregates/joins, never a per-row re-scan (PlanAuditSpec asserts no
  // nested-loop join survives). Exact DECIMAL arithmetic on both engines —
  // no float share-of-total that could flip boundary suppliers.
  // --------------------------------------------------------------------------
  def tpchQ20(spark: SparkSession, dir: String): DataFrame = {
    // spread keyed by l_partkey: the (suppkey, partkey) rollup and the
    // correlated per-partkey total both cluster on it (no-op at 100 TB)
    Tables.spread(Tables.lineitem(spark, dir), col("l_partkey"))
      .createOrReplaceTempView("q20_lineitem")
    Tables.supplier(spark, dir).createOrReplaceTempView("q20_supplier")
    // BIGINT quantity sums for the same integral-quantity exactness
    // argument as q17/q18 (5*sum stays far below 2^63 at any scale);
    // primitive codegen aggregation instead of Decimal objects
    spark.sql(
      """SELECT s.s_suppkey, s.s_name
        |FROM q20_supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT sp.l_suppkey
        |  FROM (SELECT l_suppkey, l_partkey,
        |          SUM(CAST(l_quantity AS BIGINT)) AS q
        |        FROM q20_lineitem GROUP BY l_suppkey, l_partkey) sp
        |  WHERE 5 * sp.q >
        |    (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
        |     FROM q20_lineitem l2 WHERE l2.l_partkey = sp.l_partkey))""".stripMargin)
  }

  val tpchQ20Sql: String =
    """SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT sp.l_suppkey
      |  FROM (SELECT l_suppkey, l_partkey,
      |          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
      |        FROM lineitem GROUP BY l_suppkey, l_partkey) sp
      |  WHERE CAST(5 AS DECIMAL(2,0)) * sp.q >
      |    (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
      |     FROM lineitem l2 WHERE l2.l_partkey = sp.l_partkey))""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q21 — waiting-orders shape (TPC-H Q21: correlated EXISTS plus
  // correlated NOT EXISTS on the same fact table; "late" adapted to this
  // schema as shipping >60 days after the order date, with the order date an
  // OUTER reference inside the NOT EXISTS). Timestamp comparisons are exact
  // in both engines.
  //
  // PLAN (r19): the EXISTS/NOT-EXISTS spelling decorrelates to a left-semi
  // plus a left-anti join — THREE shuffles of lineitem by l_orderkey. Both
  // predicates are per-ORDER set properties, so they fold into one grouped
  // aggregate over the l⋈o join (the classic Q21 rewrite):
  //   per (orderkey, suppkey): has_late, n_late rows;
  //   per orderkey: n_supp = COUNT(*) over supplier groups,
  //                 n_late_supp = # suppliers with a late row,
  //                 late_supp = the (unique when n_late_supp=1) late supplier,
  //                 n_late_rows = total late rows.
  // Row l1 qualifies iff l1 is late, the order has ≥2 distinct suppliers
  // (EXISTS: some row with another suppkey), and NO OTHER supplier has a
  // late row (NOT EXISTS) ⇔ n_late_supp = 1 — in which case every late row
  // of the order belongs to late_supp, so the order contributes exactly
  // n_late_rows waits to that one supplier. Both grouped aggregates cluster
  // on l_orderkey, so they reuse the l⋈o join's exchange: ONE shuffle of
  // lineitem instead of three, no semi/anti joins. The inner supplier join
  // and s_name rollup are unchanged. Oracle keeps the EXISTS spelling —
  // equivalence re-proven against it at every SF (174/174 hash match).
  // --------------------------------------------------------------------------
  def tpchQ21(spark: SparkSession, dir: String): DataFrame = {
    // spread keyed by orderkey: the l⋈o join co-partitions off the fan-out
    // exchanges and both stacked aggregates cluster on l_orderkey
    Tables.spread(Tables.lineitem(spark, dir), col("l_orderkey"))
      .createOrReplaceTempView("q21_lineitem")
    Tables.spread(Tables.orders(spark, dir), col("o_orderkey"))
      .createOrReplaceTempView("q21_orders")
    Tables.supplier(spark, dir).createOrReplaceTempView("q21_supplier")
    spark.sql(
      """SELECT s.s_name, CAST(SUM(g.n_late_rows) AS BIGINT) AS numwait
        |FROM (
        |  SELECT l_orderkey,
        |         MAX(CASE WHEN has_late THEN l_suppkey END) AS late_supp,
        |         SUM(CASE WHEN has_late THEN 1 ELSE 0 END) AS n_late_supp,
        |         COUNT(*) AS n_supp,
        |         SUM(n_late) AS n_late_rows
        |  FROM (
        |    SELECT l.l_orderkey, l.l_suppkey,
        |           MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
        |               THEN 1 ELSE 0 END) = 1 AS has_late,
        |           SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
        |               THEN 1 ELSE 0 END) AS n_late
        |    FROM q21_lineitem l JOIN q21_orders o ON o.o_orderkey = l.l_orderkey
        |    GROUP BY l.l_orderkey, l.l_suppkey) per_supp
        |  GROUP BY l_orderkey) g
        |JOIN q21_supplier s ON s.s_suppkey = g.late_supp
        |WHERE g.n_supp >= 2 AND g.n_late_supp = 1
        |GROUP BY s.s_name""".stripMargin)
  }

  val tpchQ21Sql: String =
    """SELECT s.s_name, COUNT(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |AND EXISTS (SELECT 1 FROM lineitem l2
      |            WHERE l2.l_orderkey = l1.l_orderkey
      |            AND l2.l_suppkey <> l1.l_suppkey)
      |AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                WHERE l3.l_orderkey = l1.l_orderkey
      |                AND l3.l_suppkey <> l1.l_suppkey
      |                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s.s_name""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q13 — customer-distribution shape (TPC-H Q13: LEFT OUTER join
  // with a non-key predicate INSIDE the ON clause, then a two-level
  // aggregate: orders-per-customer, then customers-per-order-count).
  // The ON-clause predicate is the defining trait: it must NOT become a
  // post-join filter (that would drop customers with zero qualifying
  // orders instead of counting them at c_count=0). Catalyst pushes the
  // single-side predicate below the join and keeps the outer semantics;
  // the plan is two hash aggregates around one outer hash join — no
  // driver-side work, integer-exact output.
  // --------------------------------------------------------------------------
  def tpchQ13(spark: SparkSession, dir: String): DataFrame = {
    // spread keyed by custkey: the outer join co-partitions off the fan-out
    // exchanges and the per-customer count clusters on c_custkey
    Tables.spread(Tables.customer(spark, dir), col("c_custkey"))
      .createOrReplaceTempView("q13_customer")
    Tables.spread(Tables.orders(spark, dir), col("o_custkey"))
      .createOrReplaceTempView("q13_orders")
    spark.sql(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM q13_customer c
        |  LEFT OUTER JOIN q13_orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey) t
        |GROUP BY c_count""".stripMargin)
  }

  val tpchQ13Sql: String =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c
      |  LEFT OUTER JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) t
      |GROUP BY c_count""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q22 — global-customer-base shape (TPC-H Q22: an UNCORRELATED
  // scalar aggregate threshold plus a correlated NOT EXISTS; adapted to
  // this schema — no c_phone, so the country-code grouping becomes
  // c_mktsegment). The scalar subqueries execute ONCE (they are
  // uncorrelated — a per-row probe never appears), and NOT EXISTS
  // decorrelates to a left-anti hash join. The above-average test is
  // DIVISION-FREE — `bal × N > Σbal` in exact DECIMAL/BIGINT — because a
  // floating-point average is summation-order-dependent and could flip
  // boundary customers between engines.
  // --------------------------------------------------------------------------
  def tpchQ22(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread: A/B-measured 1.6x slower (the scalar subqueries re-scan
    // customer anyway; the anti join broadcasts its filtered side)
    Tables.customer(spark, dir).createOrReplaceTempView("q22_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("q22_orders")
    spark.sql(
      """SELECT c.c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM q22_customer c
        |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM q22_customer c2 WHERE c2.c_acctbal > 0.0)
        |    > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2)))
        |       FROM q22_customer c3 WHERE c3.c_acctbal > 0.0)
        |AND NOT EXISTS (SELECT 1 FROM q22_orders o
        |                WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c.c_mktsegment""".stripMargin)
  }

  val tpchQ22Sql: String =
    """SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) *
      |      (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
      |    > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2)))
      |       FROM customer c3 WHERE c3.c_acctbal > 0.0)
      |AND NOT EXISTS (SELECT 1 FROM orders o
      |                WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c.c_mktsegment""".stripMargin

  // --------------------------------------------------------------------------
  // q_range_join — equi + time-range join: for each purchase, count the same
  // user's events in the following 5 minutes. The equi key keeps this a
  // hash/sort-merge join with a residual range condition — scalable, unlike
  // a pure range theta-join.
  // --------------------------------------------------------------------------
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("p_us"))
    val follow = ev.select(col("user_id").as("e_user"),
      col("event_id").as("e_id"), unix_micros(col("ts")).as("e_us"))
    purchases.join(follow,
        col("p_user") === col("e_user") &&
        col("e_us") > col("p_us") && col("e_us") <= col("p_us") + 300000000L,
        "left")
      .groupBy(col("p_id"), col("p_user"))
      .agg(count(col("e_id")).as("n_following"))
  }

  val rangeJoinSql: String =
    """SELECT p.event_id AS p_id, p.user_id AS p_user, COUNT(e.event_id) AS n_following
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN events e
      |  ON e.user_id = p.user_id
      |  AND epoch_us(CAST(e.ts AS TIMESTAMP)) > epoch_us(CAST(p.ts AS TIMESTAMP))
      |  AND epoch_us(CAST(e.ts AS TIMESTAMP)) <= epoch_us(CAST(p.ts AS TIMESTAMP)) + 300000000
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------
  // q_salted_agg — two-phase skew-salted aggregation over the 5-value
  // event_type key (each key holds 20% of the table — maximal skew). The
  // oracle is the plain single-phase aggregation: identical results by
  // construction, proving salting is semantics-preserving.
  // --------------------------------------------------------------------------
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Salting.saltedCountSum(
        Tables.events(spark, dir), "event_type",
        sumCol = col("value").cast(DecimalType(18, 2)),
        uniqueCol = col("event_id"), buckets = 16)
      .withColumn("sum_value", col("sum_value").cast(DoubleType))

  val saltedAggSql: String =
    """SELECT event_type, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // q_rolling_hash — polynomial (Rabin-Karp style) rolling hash over the
  // word sequence: order-SENSITIVE fingerprint (complements the
  // order-insensitive bag-of-words md5 in TextQueries). Word hashes come
  // from md5 prefixes so the DuckDB oracle folds the identical sequence.
  // --------------------------------------------------------------------------
  private val M = 1000000007L

  def rollingHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      expr(
        s"""aggregate(
           |  transform(split(text, ' '),
           |    w -> CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % ${M}L),
           |  CAST(0 AS BIGINT),
           |  (acc, x) -> (acc * 31 + x) % ${M}L)""".stripMargin).as("fingerprint"))

  val rollingHashSql: String =
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_transform(string_split(text, ' '),
       |      w -> list_reduce(
       |        list_transform(string_split(substring(md5(w), 1, 8), ''),
       |          c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
       |        (a, b) -> a * 16 + b) % $M),
       |    (acc, x) -> (acc * 31 + x) % $M) AS fingerprint
       |FROM documents""".stripMargin

  // --------------------------------------------------------------------------
  // q_pivot — pivoted aggregation: wide per-linestatus quantity sums keyed by
  // return flag (Catalyst rewrites pivot to conditional aggregation — the
  // oracle states that rewrite explicitly).
  // --------------------------------------------------------------------------
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity").cast(LongType)))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))

  val pivotAggSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // --------------------------------------------------------------------------
  // q_string_ops — scalar string-function battery over part names: casing,
  // substring, replace, padding, trimming, splitting, position.
  // --------------------------------------------------------------------------
  def stringOps(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      substring(col("p_name"), 1, 5).as("name_prefix"),
      regexp_replace(col("p_name"), " ", "_").as("name_snake"),
      lpad(col("p_brand"), 12, "#").as("brand_padded"),
      length(trim(col("p_type"))).cast(LongType).as("type_len"),
      size(split(col("p_name"), " ")).cast(LongType).as("name_words"),
      instr(col("p_type"), "BRUSHED").cast(LongType).as("brushed_pos"))

  val stringOpsSql: String =
    """SELECT p_partkey,
      |  UPPER(p_name) AS name_upper,
      |  substring(p_name, 1, 5) AS name_prefix,
      |  replace(p_name, ' ', '_') AS name_snake,
      |  lpad(p_brand, 12, '#') AS brand_padded,
      |  CAST(LENGTH(TRIM(p_type)) AS BIGINT) AS type_len,
      |  CAST(LEN(string_split(p_name, ' ')) AS BIGINT) AS name_words,
      |  CAST(instr(p_type, 'BRUSHED') AS BIGINT) AS brushed_pos
      |FROM part""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q7 — volume-shipping shape (TPC-H Q7): the two-sided nation
  // predicate ((supp=A ∧ cust=B) ∨ (supp=B ∧ cust=A)) cannot push below
  // the join as written, so each nation DIMENSION is pre-filtered to the
  // pair members (the per-side implication of the disjunction) and only
  // the cross-pair exclusion runs post-join — the fact scan joins two
  // 2-row broadcast dims instead of 25-row ones, and at 100 TB the
  // lineitem side is filtered by shipdate alone, never re-scanned per
  // branch. Year extraction groups the revenue stream.
  // --------------------------------------------------------------------------
  private val Q7NationA = "NATION_19"
  private val Q7NationB = "NATION_11"

  def tpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq(Q7NationA, Q7NationB)
    val n1 = broadcast(Tables.nation(spark, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
    // NOT spread: A/B-measured slower (see tpchQ3)
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("2000-01-01 00:00:00").cast(TimestampType))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("n1_key"))
      .join(n2, col("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation")) // exclude (A,A)/(B,B)
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
  }

  val tpchQ7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE ((n1.n_name = '$Q7NationA' AND n2.n_name = '$Q7NationB')
       |    OR (n1.n_name = '$Q7NationB' AND n2.n_name = '$Q7NationA'))
       |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
       |GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q8 — national-market-share shape (TPC-H Q8): an eight-way star
  // over the fact (part filter, orders date window, customer → nation →
  // region on the demand side, supplier → nation on the supply side),
  // then per-order-year market share = one nation's revenue over total
  // revenue. Every dimension broadcasts (the fact never shuffles for a
  // dim); numerator and denominator accumulate as exact DECIMAL sums and
  // divide in double only at the end — order-independent, so the share
  // hash-matches DuckDB. This closes the TPC-H set at 18 of 22: Q2, Q9
  // and Q11 are the partsupp queries, and the corpus has no partsupp
  // table to express them over.
  // --------------------------------------------------------------------------
  val Q8Nation = "NATION_7"

  def tpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val n1 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation")))
    val america = broadcast(Tables.region(spark, dir)
      .filter(col("r_name") === "AMERICA").select(col("r_regionkey")))
    // NOT spread: A/B-measured slower (see tpchQ3)
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
        .filter(to_date(col("o_orderdate")).between("1995-01-01", "1996-12-31")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(n1, col("c_nationkey") === col("n1_key"))
      .join(america, col("n1_region") === col("r_regionkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(n2, col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === Q8Nation,
          dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType) /
          revenue).as("mkt_share"),
        count(lit(1)).as("n_items"))
  }

  val tpchQ8Sql: String =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |  CAST(SUM(CASE WHEN n2.n_name = '$Q8Nation'
       |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
       |        (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
       |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       |    AS mkt_share,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN region ON n1.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
       |  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q19 — disjunctive-join shape (TPC-H Q19): an OR of three
  // brand/size/quantity conjunctions over an equi-join. Written as the
  // single filter the spec spells; Catalyst's one-sided-implication
  // extraction (PredicateHelper.extractPredicatesWithinOutputSet) derives
  // the OR of part-only conjuncts and the OR of quantity bands and pushes
  // EACH below the join — so the part scan reads only pair-candidate
  // rows and the join stays a hash join on p_partkey. The plan audit
  // pins both pushdowns.
  // --------------------------------------------------------------------------
  def tpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val b1 = col("p_brand") === "Brand#1" && col("p_type") === "SMALL" &&
      col("l_quantity").between(1, 25) && col("p_size").between(1, 25)
    val b2 = col("p_brand") === "Brand#2" && col("p_type") === "MEDIUM" &&
      col("l_quantity").between(10, 35) && col("p_size").between(1, 30)
    val b3 = col("p_brand") === "Brand#3" && col("p_type") === "LARGE" &&
      col("l_quantity").between(20, 50) && col("p_size").between(1, 40)
    // NOT spread: A/B-measured 1.6x slower (broadcast probe + global agg
    // never earn the exchange back)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
  }

  val tpchQ19Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_type = 'SMALL'
      |    AND l_quantity BETWEEN 1 AND 25 AND p_size BETWEEN 1 AND 25)
      |   OR (p_brand = 'Brand#2' AND p_type = 'MEDIUM'
      |    AND l_quantity BETWEEN 10 AND 35 AND p_size BETWEEN 1 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_type = 'LARGE'
      |    AND l_quantity BETWEEN 20 AND 50 AND p_size BETWEEN 1 AND 40)""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q4 — order-priority-checking shape (TPC-H Q4): a correlated
  // EXISTS whose predicate compares COLUMNS FROM BOTH SIDES
  // (l_shipdate > o_orderdate stands in for commitdate < receiptdate,
  // absent from this schema) → a left-semi hash join with a non-equi
  // residual condition, then a tiny group-by. The decorrelation must keep
  // the cross-side comparison INSIDE the join condition — a rewrite that
  // materializes per-order aggregates first would scan lineitem twice.
  // --------------------------------------------------------------------------
  def tpchQ4(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread: A/B-measured slower (see tpchQ3)
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) >= lit("1995-01-01") &&
        to_date(col("o_orderdate")) < lit("1995-07-01"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val tpchQ4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1995-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q12 — shipping-priority-split shape (TPC-H Q12's conditional
  // dual count, keyed by return flag in place of the absent shipmode):
  // one join, one group-by, two CASE-filtered sums — the map-side-combine
  // shape where each task emits |groups| rows regardless of input size.
  // --------------------------------------------------------------------------
  def tpchQ12(spark: SparkSession, dir: String): DataFrame =
    // fact sides spread keyed by the l⋈o join key (see tpchQ3)
    Tables.spread(Tables.lineitem(spark, dir), col("l_orderkey"))
      .filter(to_date(col("l_shipdate")).between("1995-01-01", "1995-12-31"))
      .join(Tables.spread(Tables.orders(spark, dir), col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))

  val tpchQ12Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q14 — promo-revenue-share shape (TPC-H Q14: a ratio of a
  // CASE-guarded sum to the total over the same join; 'SMALL' plays the
  // PROMO% class). Exact decimal sums, one final double division —
  // bit-stable and order-independent.
  // --------------------------------------------------------------------------
  def tpchQ14(spark: SparkSession, dir: String): DataFrame =
    // NOT spread: A/B-measured slower (see tpchQ3)
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")).between("1995-03-01", "1995-03-31"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "SMALL",
          dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount"))))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType) * 100.0 /
          revenue).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))

  val tpchQ14Sql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type = 'SMALL'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
      |        (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS promo_revenue_pct,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q16 — supplier-count-by-part shape (TPC-H Q16 re-expressed over
  // lineitem as the part↔supplier bridge, partsupp being absent): filtered
  // parts, an uncorrelated NOT IN pruning the supplier side, then
  // COUNT(DISTINCT supplier) per part class. The NOT IN must become a
  // broadcast anti join; the distinct count shuffles once on the class key.
  // --------------------------------------------------------------------------
  def tpchQ16(spark: SparkSession, dir: String): DataFrame = {
    val badSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    // NOT spread: A/B-measured 1.6x slower (the partkey fan-out serves
    // neither the broadcast probes nor the class-keyed distinct aggregate)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36)),
        col("l_partkey") === col("p_partkey"))
      .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val tpchQ16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q18 — large-volume-customer shape (TPC-H Q18): an IN over a
  // GROUP BY ... HAVING subquery on the fact table itself, then a re-join
  // of the qualifying orders back to lineitem for the detail sum. The
  // HAVING subquery must evaluate ONCE (one aggregate over lineitem), its
  // qualifying key set joining as a semi join — never a per-order re-probe.
  // --------------------------------------------------------------------------
  val Q18MinQty = 120.0

  def tpchQ18(spark: SparkSession, dir: String): DataFrame = {
    // quantity sums run in BIGINT, not DECIMAL: l_quantity is integral
    // (1..50, all SFs — checked via DuckDB), so a long sum is bit-identical
    // to the decimal sum at any scale below 2^63/50 rows while aggregating
    // as a primitive in codegen instead of per-row Decimal objects. Same
    // exactness argument as q1_agg's sum_qty; the oracle is unchanged.
    // spread keyed by l_orderkey: the HAVING aggregate, the semi join, the
    // detail join AND the final per-order rollup all cluster on orderkey,
    // so the one fan-out exchange serves the whole query (no-op at 100 TB)
    val l = Tables.spread(Tables.lineitem(spark, dir), col("l_orderkey"))
    val big = l.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("q"))
      .filter(col("q") > Q18MinQty)
      .select(col("l_orderkey").as("bk"))
    Tables.spread(Tables.orders(spark, dir), col("o_orderkey"))
      .join(big, col("o_orderkey") === col("bk"), "left_semi")
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_date"), col("o_totalprice"))
      .agg(sum(col("l_quantity").cast(LongType)).cast(DoubleType).as("total_qty"))
  }

  val tpchQ18Sql: String =
    s"""SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
       |  o_totalprice,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE o_orderkey IN (
       |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
       |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > $Q18MinQty)
       |GROUP BY 1, 2, 3, 4""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q15 — top-supplier shape (TPC-H Q15): a derived revenue view
  // aggregated once, compared against ITS OWN global max (an uncorrelated
  // scalar subquery over the same derived table). The view must not
  // evaluate twice per branch beyond the two uses, and the scalar max
  // rides back as a one-row broadcast. Revenue sums are exact decimals, so
  // the equality against the max is bit-stable after the double cast.
  // --------------------------------------------------------------------------
  def tpchQ15(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread: A/B-measured 1.3x slower (selective date filter; the
    // exchange outweighs the single-task partial aggregate)
    val rev = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")).between("1995-01-01", "1995-03-31"))
      .groupBy(col("l_suppkey"))
      .agg(revenue.as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    Tables.supplier(spark, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val tpchQ15Sql: String =
    """WITH r AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN r ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM r)""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q6 — forecasting-revenue shape (TPC-H Q6): the pure-scan
  // aggregate whose entire cost is pushdown quality — date range, discount
  // band and quantity cap must ALL reach the parquet scan, then one
  // map-side-combined global sum. The simplest query and the cleanest
  // pushdown differential: PlanAuditSpec asserts every predicate lands in
  // PushedFilters.
  // --------------------------------------------------------------------------
  def tpchQ6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")).between("1995-01-01", "1995-12-31") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))

  val tpchQ6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q10 — returned-item-reporting shape (TPC-H Q10): revenue lost
  // to returns per customer — fact filter (returnflag) → join orders (date
  // window) → join customer dims → top-20 by revenue. The classic
  // star-join + TakeOrdered shape: dims broadcast, one shuffle on the
  // group key, the top-k short-circuits without a global sort.
  // --------------------------------------------------------------------------
  def tpchQ10(spark: SparkSession, dir: String): DataFrame =
    // NOT spread: A/B-measured slower — both fact filters are selective, so
    // the fan-out exchange moves more than the surviving join ever uses
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
        .filter(to_date(col("o_orderdate")).between("1995-01-01", "1995-06-30")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  val tpchQ10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // Derived partsupp — closes the TPC-H set at 22/22. The corpus ships no
  // partsupp table, but lineitem's (l_partkey, l_suppkey) pairs ARE its
  // part↔supplier bridge (the observation q_tpch_q20 already leans on):
  // partsupp := the DISTINCT observed pair set, with availqty/supplycost as
  // deterministic integer functions of the key pair. All the math is exact
  // BIGINT in both engines — money stays in integer CENTS until one final
  // CAST to DOUBLE (a single exact division), the same late-divide
  // discipline as the other TPC-H shapes, so every aggregate hash-matches
  // the DuckDB oracle. The derivation itself is a two-column column-pruned
  // scan + distinct; at 100 TB partsupp would be a materialized dimension
  // and these queries would read it directly — the join shapes below
  // (broadcast dims, semi-filtered fact, per-part window over a
  // dimension-filtered candidate set) are unchanged by that swap.
  // --------------------------------------------------------------------------
  private def derivedPartsupp(spark: SparkSession, dir: String): DataFrame =
    // spread keyed by l_partkey: the (partkey, suppkey) distinct, q11's
    // per-part rollup and q2's per-part window all cluster on it
    Tables.spread(Tables.lineitem(spark, dir), col("l_partkey"))
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty",
        (col("ps_partkey") * 61 + col("ps_suppkey") * 17) % 9999 + 1)
      .withColumn("ps_cost_cents",
        (col("ps_partkey") * 7 + col("ps_suppkey") * 13) % 99900 + 100)

  private val partsuppCte: String =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    (l_partkey * 61 + l_suppkey * 17) % 9999 + 1 AS ps_availqty,
      |    (l_partkey * 7 + l_suppkey * 13) % 99900 + 100 AS ps_cost_cents
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q2 — minimum-cost-supplier shape (TPC-H Q2): for each part in a
  // size/type band, the EUROPE supplier(s) quoting the per-part minimum
  // supplycost. The correlated MIN decorrelates to a window over the
  // candidate set: part filter and region-joined supplier both broadcast,
  // so the only exchange is the per-part window partition over the (small)
  // filtered candidates — never over the full partsupp relation.
  // --------------------------------------------------------------------------
  def tpchQ2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val europeSupp = broadcast(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
    derivedPartsupp(spark, dir)
      .join(europeSupp, col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_brand"))),
        col("ps_partkey") === col("p_partkey"))
      .withColumn("min_cents",
        min(col("ps_cost_cents")).over(Window.partitionBy(col("ps_partkey"))))
      .filter(col("ps_cost_cents") === col("min_cents"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_brand"), (col("ps_cost_cents").cast(DoubleType) / 100.0).as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val tpchQ2Sql: String =
    s"""WITH $partsuppCte
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       |       CAST(ps_cost_cents AS DOUBLE)/100.0 AS supplycost
       |FROM partsupp JOIN part ON p_partkey = ps_partkey
       | JOIN supplier ON s_suppkey = ps_suppkey
       | JOIN nation ON s_nationkey = n_nationkey
       | JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
       |  AND ps_cost_cents = (
       |    SELECT MIN(ps2.ps_cost_cents) FROM partsupp ps2
       |     JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
       |     JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       |     JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q9 — product-type profit shape (TPC-H Q9): per (nation, year),
  // revenue minus supply cost over the parts matching a name pattern. The
  // part filter broadcasts and ALSO semi-filters the partsupp side before
  // its (partkey, suppkey) equi-join with the fact; supplier→nation
  // broadcasts; orders joins on the orderkey shuffle. Revenue accumulates
  // as exact DECIMAL, cost as exact BIGINT cents; the two sums meet in
  // DOUBLE only in the final projection.
  // --------------------------------------------------------------------------
  def tpchQ9(spark: SparkSession, dir: String): DataFrame = {
    val redParts = broadcast(Tables.part(spark, dir)
      .filter(col("p_name").like("%red%")).select(col("p_partkey")))
    val suppNation = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")))
    val ps = derivedPartsupp(spark, dir)
      .join(redParts, col("ps_partkey") === col("p_partkey"), "left_semi")
    // spread keyed by l_partkey: co-partitions with the derived partsupp
    Tables.spread(Tables.lineitem(spark, dir), col("l_partkey"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount")))).cast(DoubleType) -
          sum(col("ps_cost_cents") * col("l_quantity").cast(LongType))
            .cast(DoubleType) / 100.0).as("sum_profit"),
        count(lit(1)).as("n_items"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val tpchQ9Sql: String =
    s"""WITH $partsuppCte
       |SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
       |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       |   - CAST(SUM(ps_cost_cents * CAST(l_quantity AS BIGINT)) AS DOUBLE)/100.0
       |   AS sum_profit,
       |  COUNT(*) AS n_items
       |FROM lineitem
       | JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
       | JOIN part ON p_partkey = l_partkey
       | JOIN supplier ON s_suppkey = l_suppkey
       | JOIN orders ON o_orderkey = l_orderkey
       | JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  // --------------------------------------------------------------------------
  // q_tpch_q11 — important-stock shape (TPC-H Q11): per-part inventory
  // value within one nation, keeping parts whose value exceeds a threshold
  // fraction of the nation's total. The published query's fixed fraction is
  // scale-dependent (it empties as the part count grows), so the threshold
  // here is scale-free: keep parts worth more than 2× the average part —
  // sval·npart > 2·total, compared in exact integers (cents), no division
  // anywhere until the output projection.
  // --------------------------------------------------------------------------
  val Q11Nation = "NATION_7"

  def tpchQ11(spark: SparkSession, dir: String): DataFrame = {
    val supp = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).filter(col("n_name") === Q11Nation),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")))
    val g = derivedPartsupp(spark, dir)
      .join(supp, col("ps_suppkey") === col("s_suppkey"))
      .groupBy(col("ps_partkey"))
      .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("sval"))
    val tot = g.agg(sum(col("sval")).as("t"), count(lit(1)).as("npart"))
    g.crossJoin(broadcast(tot))
      .filter(col("sval") * col("npart") > col("t") * 2)
      .select(col("ps_partkey"), (col("sval").cast(DoubleType) / 100.0).as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  val tpchQ11Sql: String =
    s"""WITH $partsuppCte,
       |v AS (SELECT ps_partkey, ps_cost_cents * ps_availqty AS val
       |  FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
       |   JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = '$Q11Nation'),
       |tot AS (SELECT SUM(val) AS t, COUNT(DISTINCT ps_partkey) AS npart FROM v)
       |SELECT ps_partkey, CAST(SUM(val) AS DOUBLE)/100.0 AS value
       |FROM v, tot GROUP BY ps_partkey, t, npart
       |HAVING SUM(val) * npart > 2 * t
       |ORDER BY value DESC, ps_partkey""".stripMargin

  // --------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q2"      -> (tpchQ2 _),
    "q_tpch_q9"      -> (tpchQ9 _),
    "q_tpch_q11"     -> (tpchQ11 _),
    "q_tpch_q6"      -> (tpchQ6 _),
    "q_tpch_q10"     -> (tpchQ10 _),
    "q_tpch_q15"     -> (tpchQ15 _),
    "q_tpch_q4"      -> (tpchQ4 _),
    "q_tpch_q12"     -> (tpchQ12 _),
    "q_tpch_q8"      -> (tpchQ8 _),
    "q_tpch_q14"     -> (tpchQ14 _),
    "q_tpch_q16"     -> (tpchQ16 _),
    "q_tpch_q18"     -> (tpchQ18 _),
    "q_tpch_q7"      -> (tpchQ7 _),
    "q_tpch_q19"     -> (tpchQ19 _),
    "q_tpch_q3"      -> (tpchQ3 _),
    "q_tpch_q5"      -> (tpchQ5 _),
    "q_tpch_q17"     -> (tpchQ17 _),
    "q_tpch_q20"     -> (tpchQ20 _),
    "q_tpch_q21"     -> (tpchQ21 _),
    "q_tpch_q13"     -> (tpchQ13 _),
    "q_tpch_q22"     -> (tpchQ22 _),
    "q_range_join"   -> (rangeJoin _),
    "q_salted_agg"   -> (saltedAgg _),
    "q_rolling_hash" -> (rollingHash _),
    "q_pivot"        -> (pivotAgg _),
    "q_string_ops"   -> (stringOps _),
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q2"      -> tpchQ2Sql,
    "q_tpch_q9"      -> tpchQ9Sql,
    "q_tpch_q11"     -> tpchQ11Sql,
    "q_tpch_q6"      -> tpchQ6Sql,
    "q_tpch_q10"     -> tpchQ10Sql,
    "q_tpch_q15"     -> tpchQ15Sql,
    "q_tpch_q4"      -> tpchQ4Sql,
    "q_tpch_q12"     -> tpchQ12Sql,
    "q_tpch_q8"      -> tpchQ8Sql,
    "q_tpch_q14"     -> tpchQ14Sql,
    "q_tpch_q16"     -> tpchQ16Sql,
    "q_tpch_q18"     -> tpchQ18Sql,
    "q_tpch_q7"      -> tpchQ7Sql,
    "q_tpch_q19"     -> tpchQ19Sql,
    "q_tpch_q3"      -> tpchQ3Sql,
    "q_tpch_q5"      -> tpchQ5Sql,
    "q_tpch_q17"     -> tpchQ17Sql,
    "q_tpch_q20"     -> tpchQ20Sql,
    "q_tpch_q21"     -> tpchQ21Sql,
    "q_tpch_q13"     -> tpchQ13Sql,
    "q_tpch_q22"     -> tpchQ22Sql,
    "q_range_join"   -> rangeJoinSql,
    "q_salted_agg"   -> saltedAggSql,
    "q_rolling_hash" -> rollingHashSql,
    "q_pivot"        -> pivotAggSql,
    "q_string_ops"   -> stringOpsSql,
  )
}
