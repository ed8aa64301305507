package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Join-key range inference: a narrow dim's manifest bounds become range
  * conjuncts on the fact's join key, pruning fact files through ordinary
  * data skipping — soundly per join type, strictly-narrowing-only, and
  * fixpoint-idempotent. */
class JoinRangeInferenceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("jrange").toString

  /** Files the scan carrying `col` actually selects (post static pruning;
    * AQE wraps the plan, so unwrap to the current physical plan first). */
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

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("a narrow dim prunes fact files; equal ranges stay untouched; soundness per join type") {
    val base = tmp(); val fact = base + "/fact"
    val dim = base + "/dim"; val wide = base + "/wide"
    // range-placed fact: 16 files, each covering a narrow k band
    VersionedTable.write(
      spark.range(0, 65536).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(16, col("k")),
      fact, statsCols = Seq("k"))
    // dim covering ~1/32 of the key space
    VersionedTable.write(
      (1000L to 2999L).map(k => (k, "g" + k % 3)).toDF("pk", "g"), dim,
      statsCols = Seq("pk"))
    // dim covering the WHOLE key space (no narrowing possible)
    VersionedTable.write(
      Seq((0L, "lo"), (65535L, "hi")).toDF("pk", "g"), wide,
      statsCols = Seq("pk"))
    def f = VersionedTable.read(spark, fact)
    def q(d: DataFrame) = { val fv = f
      fv.join(d, fv("k") === d("pk")).groupBy($"g").agg(sum($"v").as("s")) }
    val on = q(VersionedTable.read(spark, dim))
    val readOn = filesRead(on, "v")
    val valsOn = sorted(on)
    spark.conf.set("spark.graft.joinRange.enabled", "false")
    val (readOff, valsOff) =
      try {
        val off = q(VersionedTable.read(spark, dim))
        (filesRead(off, "v"), sorted(off))
      } finally spark.conf.set("spark.graft.joinRange.enabled", "true")
    assert(valsOn == valsOff, "range inference changed values")
    assert(readOff == 16L, s"un-pruned fact should read all files, got $readOff")
    assert(readOn < readOff && readOn >= 1L,
      s"the inferred range must prune fact files: $readOn vs $readOff")
    // a dim spanning the whole key space narrows nothing: no range
    // conjunct anywhere in the plan (the only filters are inferred
    // IsNotNulls), and every fact file is read
    val qw = q(VersionedTable.read(spark, wide))
    assert(filesRead(qw, "v") == 16L)
    val injected = qw.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _)
          if c.exists(e =>
            e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual] ||
            e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.LessThanOrEqual]) => c
    }
    assert(injected.isEmpty, injected.toString)
    // LeftSemi narrows too; LeftAnti narrows only the right side (values
    // must show every unmatched fact row surviving)
    val fv2 = f; val dv2 = VersionedTable.read(spark, dim)
    val semi = fv2.join(dv2, fv2("k") === dv2("pk"), "left_semi")
    assert(filesRead(semi, "v") < 16L)
    assert(semi.count() == 2000L)
    val fv3 = f; val dv3 = VersionedTable.read(spark, dim)
    val anti = fv3.join(dv3, fv3("k") === dv3("pk"), "left_anti")
    assert(filesRead(anti, "v") == 16L,
      "anti must NOT narrow its preserved left side")
    assert(anti.count() == 65536L - 2000L)
    // outer joins are untouched entirely (composition with the pinned
    // outer-join machinery)
    val fv4 = f; val dv4 = VersionedTable.read(spark, dim)
    val outer = fv4.join(dv4, fv4("k") === dv4("pk"), "left")
      .groupBy($"g").agg(sum($"v").as("s"))
    assert(filesRead(outer, "v") == 16L)
  }

  test("anchored fact: inference reads bounds DISTRIBUTED, zero driver stats parses") {
    val base = tmp(); val fact = base + "/afact"; val dim = base + "/adim"
    val saved = VersionedTable.CkptInlineMaxFiles
    VersionedTable.CkptInlineMaxFiles = 8
    try {
      // 16 single-file band appends -> the head anchors at a parquet
      // checkpoint; the dim's narrow range must prune fact files WITHOUT
      // the fact's stats map ever materializing driver-side
      (0 until 16).foreach { b =>
        VersionedTable.append(
          spark.range(b * 4096L, (b + 1) * 4096L)
            .select(col("id").as("k"), col("id").as("v")).coalesce(1),
          fact, statsCols = Seq("k"))
      }
      VersionedTable.write(
        (1000L to 2999L).map(k => (k, "g" + k % 3)).toDF("pk", "g"), dim,
        statsCols = Seq("pk"))
      def f = VersionedTable.read(spark, fact)
      VersionedTable.ckptStatsParses.set(0L)
      val fv = f
      val q = fv.join(VersionedTable.read(spark, dim), fv("k") === col("pk"))
        .groupBy($"g").agg(sum($"v").as("s"))
      val read = filesRead(q, "v")
      val vals = sorted(q)
      assert(read < 16L && read >= 1L,
        s"anchored fact must prune through inferred ranges: $read/16")
      assert(VersionedTable.ckptStatsParses.get() == 0L,
        "join-range inference must not force the anchored stats map")
      spark.conf.set("spark.graft.joinRange.enabled", "false")
      try assert(sorted(q) == vals)
      finally spark.conf.set("spark.graft.joinRange.enabled", "true")
    } finally VersionedTable.CkptInlineMaxFiles = saved
  }
}
