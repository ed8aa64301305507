package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets a
  * `FileSourceScanExec` it can push filters / prune columns into. At 100 TB
  * these tables would be hive-partitioned directories instead of single
  * files; the loaders take a directory root so swapping in a partitioned
  * layout is a path change, not a code change.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Repartition to full parallelism ONLY when the input arrived under-split:
    * a single-row-group parquet file (the test-SF layout) shows up as ONE
    * partition, which would serialize every downstream narrow chain onto one
    * task (observed: 31/32 threads idle). A properly-split input — the real
    * 100 TB layout — passes through untouched, so this never inserts a
    * gratuitous exchange at scale.
    *
    * Only NARROW plans (scan/project/filter/generate chains) are probed:
    * under AQE, `df.rdd` on a plan containing an exchange MATERIALIZES the
    * upstream shuffle stages as real jobs, so for any plan that already
    * shuffles (whose output partitioning is governed by
    * spark.sql.shuffle.partitions anyway) spread is an immediate no-op
    * rather than a silent double execution. */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val narrow = df.queryExecution.optimizedPlan.collectFirst {
      case _: Join | _: Aggregate | _: Distinct | _: RepartitionOperation |
           _: Window | _: Sort | _: GlobalLimit => ()
    }.isEmpty
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (narrow && df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** The events table is written with parquet TIMESTAMP(NANOS), which the
    * Spark 4 parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). We read
    * nanos as a raw long (legacy conf, runtime-settable) and rebuild a
    * microsecond TimestampType column ourselves. `div` keeps the arithmetic
    * integral — a double division would lose precision above 2^53 ns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
