package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** NDV-gated shuffle-partition sizing: an aggregation exchange over
  * sketched group columns caps its static partition count at
  * headroom × Πndv; everything unsketchable, computed, or join-shaped is
  * left at the session default. */
class ShufflePartitionSizingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("shufsz").toString

  /** Partition counts of every hash exchange in the executed plan. */
  private def hashCounts(df: DataFrame): Seq[Int] = {
    val s = df.queryExecution.executedPlan.toString
    raw"Exchange hashpartitioning\([^)]*, (\d+)\)".r
      .findAllMatchIn(s).map(_.group(1).toInt).toSeq
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("a sketched rollup's exchange shrinks to headroom × ndv; values unchanged") {
    val base = tmp(); val t = base + "/t"
    VersionedTable.write(
      (1L to 400L).map(i => (i, "g" + i % 3, i)).toDF("id", "g", "v"),
      t, statsCols = Seq("id"))
    VersionedTable.analyzeNdv(spark, t, Seq("g"))
    def q = VersionedTable.read(spark, t)
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    // ndv(g)=3, headroom 2.0 → 6 < the session's 8
    assert(hashCounts(q) == Seq(6), q.queryExecution.executedPlan.toString)
    val on = sorted(q)
    spark.conf.set("spark.graft.shufflePartitions.enabled", "false")
    try {
      assert(hashCounts(q) == Seq(8), "kill-switch ignored")
      assert(sorted(q) == on)
    } finally
      spark.conf.set("spark.graft.shufflePartitions.enabled", "true")
    // headroom is the knob: 1.0 → exactly ndv — but the under-sketch
    // floor (default 4) holds first, because a query-stage-prep resize is
    // unrecoverable (AQE coalesces, never splits)
    spark.conf.set("spark.graft.shufflePartitions.headroom", "1.0")
    try {
      assert(hashCounts(q) == Seq(4), "floor (default 4) should hold")
      spark.conf.set("spark.graft.shufflePartitions.min", "1")
      try assert(hashCounts(q) == Seq(3))
      finally spark.conf.unset("spark.graft.shufflePartitions.min")
    } finally spark.conf.unset("spark.graft.shufflePartitions.headroom")
    // a filter between scan and rollup keeps the bound (ndv only shrinks)
    assert(hashCounts(VersionedTable.read(spark, t).filter($"v" > 100L)
      .groupBy($"g").agg(sum($"v").as("s"))) == Seq(6))
  }

  test("declines: unsketched columns, computed keys, renames, joins") {
    val base = tmp(); val t = base + "/t"; val u = base + "/u"
    VersionedTable.write(
      (1L to 300L).map(i => (i, "g" + i % 3, i % 3, i)).toDF("id", "g", "k", "v"),
      t, statsCols = Seq("id"))
    VersionedTable.analyzeNdv(spark, t, Seq("g"))
    VersionedTable.write(
      (0L to 2L).map(k => (k, "x" + k)).toDF("k2", "label"), u,
      statsCols = Seq("k2"))
    // unsketched group column: no bound, default count
    assert(hashCounts(VersionedTable.read(spark, t)
      .groupBy($"k").agg(sum($"v").as("s"))) == Seq(8))
    // computed key: the grouping attr is a fresh alias id — declines
    assert(hashCounts(VersionedTable.read(spark, t)
      .groupBy(($"g" === "g0").as("is0")).agg(sum($"v").as("s"))) == Seq(8))
    // rename detaches the exprId pass-through? it does NOT — attribute
    // aliases keep resolving only when ids survive; a rename mints a new
    // id, so the bound declines rather than guessing
    assert(hashCounts(VersionedTable.read(spark, t)
      .select($"g".as("h"), $"v")
      .groupBy($"h").agg(sum($"v").as("s"))) == Seq(8))
    // JOIN exchanges are never resized (co-partitioning must survive),
    // even when one side's key is sketched
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = VersionedTable.read(spark, t)
        .join(VersionedTable.read(spark, u), $"k" === $"k2")
      assert(j.count() == 300L)
      assert(hashCounts(j).forall(_ == 8),
        j.queryExecution.executedPlan.toString)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
