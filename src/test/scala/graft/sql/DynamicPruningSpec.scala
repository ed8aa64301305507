package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Spark's own RUNTIME dynamic partition pruning must compose with the
  * graft FileIndex: the planner plants a DynamicPruningExpression on a
  * hive-partitioned graft scan, and at execution the dim's actual keys
  * prune partition directories before any fact file opens. */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  /** The fact-side scan, descending into materialized AQE query stages
    * (QueryStageExec is a leaf — plain collect stops at it). */
  private def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansIn(q.plan)
    }.flatten

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    scansIn(p).filter(_.output.exists(_.name == "v")) match {
      case Seq(s) => s
      case ss => fail(s"expected exactly one fact scan, got ${ss.size}:\n$p")
    }
  }

  test("runtime DPP prunes graft partition dirs via the dim's executed keys") {
    val base = java.nio.file.Files.createTempDirectory("dpp").toString
    val fact = base + "/fact"; val dim = base + "/dim"
    spark.range(0, 4096)
      .select((col("id") % 8).as("p"), col("id").as("v"))
      .write.format("graft-table").partitionBy("p").save(fact)
    // the tag column is what filters — no static rule can turn it into
    // partition values without executing the dim
    VersionedTable.write(
      (0L to 7L).map(k => (k, if (k < 2) "keep" else "drop")).toDF("pk", "tag"),
      dim)
    val total = spark.read.format("graft-table").load(fact).inputFiles.length
    def q(): DataFrame = {
      val f = spark.read.format("graft-table").load(fact)
      val d = VersionedTable.read(spark, dim).filter($"tag" === "keep")
      f.join(d, f("p") === d("pk")).agg(sum($"v").as("s"), count(lit(1)).as("n"))
    }
    val on = q()
    val onRows = on.collect().map(_.toString).toSeq
    val scan = scanOf(on)
    assert(scan.partitionFilters.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
      s"expected a dynamic pruning filter on the fact scan:\n$scan")
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < total,
      s"runtime DPP must prune fact files: read $read of $total")
    // values identical with DPP disabled (and every file read)
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    spark.conf.set(key, "false")
    try {
      val off = q()
      assert(off.collect().map(_.toString).toSeq == onRows)
      assert(scanOf(off).metrics("numFiles").value == total)
    } finally spark.conf.set(key, "true")
  }
}
