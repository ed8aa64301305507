package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBatchShim

import graft.SparkSpec
import graft.sources.{MaterializedView, VersionedTable}

/** Materialized-view query rewrite: fresh views answer covered GROUP BY
  * aggregates (plan-pinned), staleness and uncovered shapes decline, and
  * the rewritten result is value-identical to the source aggregation. */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mvrw").toString

  private def roots(df: DataFrame): Seq[String] =
    GraftBatchShim.scanRootsOf(df).map(_.toString)

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Runs `q` twice — rewrite on and off — asserting the ON plan scans
    * exactly the view and both results agree. */
  private def assertRewrites(src: String, mv: String, q: => DataFrame): Unit = {
    val on = q
    assert(roots(on).contains(mv) && !roots(on).contains(src),
      s"expected a rewrite to $mv, scanned ${roots(on)}")
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try {
      val off = q
      assert(roots(off).contains(src), s"kill-switch ignored: ${roots(off)}")
      assert(sorted(on) == sorted(off))
    } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  test("covered aggregates rewrite to the view: exact grouping, rollup subset, global") {
    val base = tmp(); val src = base + "/src"; val mv = base + "/mv"
    VersionedTable.write(
      (1L to 200L).map(i => (i, "g" + i % 5, i % 3, i, i * 2))
        .toDF("id", "g", "g2", "v", "w"), src, statsCols = Seq("id"))
    MaterializedView.create(spark, src, mv, Seq("g", "g2"), Seq("v"))
    // exact grouping
    assertRewrites(src, mv, VersionedTable.read(spark, src)
      .groupBy($"g", $"g2").agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // rollup to a SUBSET of the view grouping: COUNT re-sums mv_count
    assertRewrites(src, mv, VersionedTable.read(spark, src)
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // global aggregate (empty grouping is the ultimate rollup)
    assertRewrites(src, mv, VersionedTable.read(spark, src)
      .agg(count(lit(1)).as("n"), sum($"v").as("s")))
    // HAVING composes: the filter sits ABOVE the rewritten aggregate
    assertRewrites(src, mv, spark.sql(
      s"SELECT g, COUNT(*) AS n FROM graft.`$src` GROUP BY g HAVING COUNT(*) > 30"))
  }

  test("staleness declines and refresh re-arms; time travel never matches") {
    val base = tmp(); val src = base + "/src"; val mv = base + "/mv"
    VersionedTable.write(
      (1L to 100L).map(i => (i, "g" + i % 4, i)).toDF("id", "g", "v"),
      src, statsCols = Seq("id"))
    MaterializedView.create(spark, src, mv, Seq("g"), Seq("v"))
    def q = VersionedTable.read(spark, src)
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    assert(roots(q).contains(mv))
    // source moves, view not refreshed: the rewrite must DECLINE — the
    // view would answer with yesterday's data
    VersionedTable.delete(spark, src, $"id" <= 10L)
    assert(roots(q).contains(src), roots(q).toString)
    assert(sorted(q) == sorted(q)) // and the source answer stands on its own
    MaterializedView.refresh(spark, mv)
    assertRewrites(src, mv, q)
    // a time-travel read of an OLDER version never matches the watermark
    val old = VersionedTable.read(spark, src, Some(2L))
      .groupBy($"g").agg(count(lit(1)).as("n"))
    assert(roots(old).contains(src), roots(old).toString)
  }

  test("uncovered shapes decline: WHERE below, MIN, uncovered SUM, distinct, fractional") {
    val base = tmp(); val src = base + "/src"; val mv = base + "/mv"
    VersionedTable.write(
      (1L to 100L).map(i => (i, "g" + i % 4, i, i / 7.0))
        .toDF("id", "g", "v", "f"), src, statsCols = Seq("id"))
    MaterializedView.create(spark, src, mv, Seq("g"), Seq("v"))
    def srcScan(df: DataFrame) = roots(df).contains(src)
    val t = VersionedTable.read(spark, src)
    // a WHERE between the aggregate and the scan: the view covers the
    // WHOLE table only
    assert(srcScan(t.filter($"id" > 50L).groupBy($"g").agg(count(lit(1)).as("n"))))
    // MIN is not maintainable, SUM(id) is not covered, DISTINCT changes
    // semantics, SUM(f) re-aggregation would reorder float addition
    assert(srcScan(t.groupBy($"g").agg(min($"v").as("m"))))
    assert(srcScan(t.groupBy($"g").agg(sum($"id").as("s"))))
    assert(srcScan(t.groupBy($"g").agg(countDistinct($"v").as("n"))))
    assert(srcScan(t.groupBy($"g").agg(sum($"f").as("s"))))
    // grouping by a non-view column declines
    assert(srcScan(t.groupBy($"v").agg(count(lit(1)).as("n"))))
  }

  test("SQL surface rewrites too, and null-sum groups survive the round trip") {
    val base = tmp(); val src = base + "/src"; val mv = base + "/mv"
    // group g3 carries ONLY null v: its view sum is SQL-NULL, and the
    // rollup re-aggregation must keep skipping it
    VersionedTable.write(
      (1L to 80L).map(i =>
        (i, "g" + i % 4, if (i % 4 == 3) None else Some(i)))
        .toDF("id", "g", "v"), src, statsCols = Seq("id"))
    MaterializedView.create(spark, src, mv, Seq("g"), Seq("v"))
    def q = spark.sql(
      s"SELECT g, COUNT(*) AS n, SUM(v) AS s FROM graft.`$src` GROUP BY g")
    assertRewrites(src, mv, q)
    val byG = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(byG("g3") == (20L, null), byG.toString) // all-null group: NULL, not 0
  }
}
