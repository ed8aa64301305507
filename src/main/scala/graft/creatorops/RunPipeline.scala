package graft.creatorops

import org.apache.spark.sql.SparkSession

/** CLI entry point for the medallion pipeline — the analogue of the
  * reference's `local/run_all.ps1` sequential runner, as one command.
  *
  * Usage: runMain graft.creatorops.RunPipeline <eventsPathOrGlob>... <warehouseRoot>
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunPipeline <eventsPathOrGlob>... <warehouseRoot>")
    val eventPaths = args.init.toSeq
    val root = args.last
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("creatorops-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.storage.memoryMapThreshold", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = Pipeline.runAll(spark, eventPaths, root)
    println(s"[pipeline] bronze=${c.bronze} silver=${c.silver} rejects=${c.rejects} " +
      s"velocity=${c.velocity} churn=${c.churn} bands=${c.bands} " +
      s"dropoff=${c.dropoff} bottlenecks=${c.bottlenecks} -> $root")
    spark.stop()
  }
}
