package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Top-k file pruning: ORDER BY c LIMIT k proves a manifest threshold and
  * the scan reads only the files that can still contribute — soundly
  * across directions and null orderings, declining on anything that would
  * invalidate the count. */
class TopKPruningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("topk").toString

  private def filesRead(df: DataFrame, col: String): Long = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    p.collect {
      case s: FileSourceScanExec if s.output.exists(_.name == col) =>
        s.selectedPartitions.totalNumberOfFiles
    }.sum
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def withRuleOff[A](f: => A): A = {
    spark.conf.set("spark.graft.topk.enabled", "false")
    try f finally spark.conf.set("spark.graft.topk.enabled", "true")
  }

  test("ORDER BY LIMIT reads only contributing files, both directions") {
    val path = tmp() + "/t"
    // range-placed: 16 files, each a narrow band of k
    VersionedTable.write(
      spark.range(0, 65536).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(16, col("k")),
      path, statsCols = Seq("k"))
    def t = VersionedTable.read(spark, path)
    val desc = t.orderBy(col("k").desc).limit(10)
    val descRows = rows(desc)
    assert(filesRead(desc, "v") < 16L && filesRead(desc, "v") >= 1L,
      "descending top-k must prune to the high band")
    val asc = t.orderBy(col("k").asc).limit(10)
    val ascRows = rows(asc)
    assert(filesRead(asc, "v") < 16L)
    withRuleOff {
      assert(rows(t.orderBy(col("k").desc).limit(10)) == descRows)
      assert(rows(t.orderBy(col("k").asc).limit(10)) == ascRows)
      assert(filesRead(t.orderBy(col("k").desc).limit(10), "v") == 16L)
    }
    // secondary sort keys ride along: pruning is on the FIRST key only
    val multi = t.orderBy(col("k").desc, col("v").asc).limit(7)
    assert(filesRead(multi, "v") < 16L)
    withRuleOff {
      assert(rows(t.orderBy(col("k").desc, col("v").asc).limit(7))
        == rows(multi))
    }
    // Project between Limit and Sort (orderBy then select) still fires
    val proj = t.orderBy(col("k").desc).select(col("v")).limit(5)
    assert(filesRead(proj, "v") < 16L)
    withRuleOff {
      assert(rows(t.orderBy(col("k").desc).select(col("v")).limit(5))
        == rows(proj))
    }
  }

  test("null orderings: NULLS FIRST keeps nulls, NULLS LAST prunes them") {
    val path = tmp() + "/n"
    // 8 value bands plus nulls concentrated in their own file
    val vals = spark.range(0, 4096)
      .select(col("id").as("pk"), col("id").cast("double").as("c"))
      .repartitionByRange(8, col("c"))
    val nulls = spark.range(4096, 4196)
      .select(col("id").as("pk"), lit(null).cast("double").as("c"))
      .repartition(1)
    VersionedTable.write(vals, path, statsCols = Seq("c"))
    VersionedTable.append(nulls, path, statsCols = Seq("c"))
    def t = VersionedTable.read(spark, path)
    // ASC default = NULLS FIRST: the 100 nulls lead, then the smallest
    // values — the injected conjunct must be null-tolerant and the
    // null-file must survive while high bands prune
    val nf = t.orderBy(col("c").asc).limit(150)
    val nfRows = rows(nf.orderBy(col("c").asc_nulls_first, col("pk")))
    val nfRead = filesRead(nf, "pk")
    assert(nfRead < 9L, s"high value bands must prune, read $nfRead")
    withRuleOff {
      val off = t.orderBy(col("c").asc).limit(150)
      assert(rows(off.orderBy(col("c").asc_nulls_first, col("pk"))) == nfRows)
    }
    assert(nf.filter(col("c").isNull).count() == 100L,
      "NULLS FIRST top-150 must keep all 100 null rows")
    // DESC default = NULLS LAST: nulls never reach the top k, the null
    // file itself prunes (its stats say: nothing ≥ τ, no null exemption)
    val nl = t.orderBy(col("c").desc).limit(50)
    assert(filesRead(nl, "pk") < 9L)
    assert(nl.filter(col("c").isNull).count() == 0L)
    withRuleOff {
      assert(rows(t.orderBy(col("c").desc).limit(50)) == rows(nl))
    }
  }

  test("declines: filters, k past provable rows, DV-marked files") {
    val path = tmp() + "/d"
    VersionedTable.write(
      spark.range(0, 4096).select(col("id").as("k"), (col("id") % 7).as("m"))
        .repartitionByRange(8, col("k")),
      path, statsCols = Seq("k"))
    def t = VersionedTable.read(spark, path)
    // a filter between sort and scan invalidates the count — decline
    // (every file read; the filter itself prunes nothing on m)
    val filtered = t.filter(col("m") === 3).orderBy(col("k").desc).limit(5)
    val planStr = filtered.queryExecution.optimizedPlan.toString
    assert(filesRead(filtered, "m") == 8L,
      s"a filtered top-k must not inject a threshold:\n$planStr")
    // k beyond the provable non-null total — decline
    assert(filesRead(t.orderBy(col("k").desc).limit(100000), "m") == 8L)
    // DV marks make per-file counts unprovable: after a point DELETE the
    // marked file stops counting; with every OTHER file still provable
    // the top-k threshold (computed over the survivors) stays sound
    VersionedTable.deleteVectorized(spark, path, col("k") === 4095L,
      purgeFraction = 1.0)
    val afterDv = t.orderBy(col("k").desc).limit(5)
    val got = rows(afterDv)
    withRuleOff {
      assert(rows(t.orderBy(col("k").desc).limit(5)) == got)
    }
    assert(got.size == 5 && !got.exists(_.startsWith("[4095,")),
      s"deleted row must not resurface: $got")
  }
}
