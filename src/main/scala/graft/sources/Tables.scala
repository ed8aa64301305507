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
    * When `keys` are given, the spread HASH-partitions by them instead of
    * round-robin: a caller whose downstream aggregations/distincts are keyed
    * by (a superset of) `keys` then satisfies their ClusteredDistribution
    * from this one exchange, so Catalyst inserts NO further exchange for
    * them — the repartition we are forced to pay for an under-split input
    * does double duty (guide §2.4: operations keyed the same way share one
    * exchange). Callers pass a high-cardinality skew-free key (doc_id /
    * vec_id), so the hash spread is as balanced as round-robin — and
    * cheaper, since keyless repartition pays a local sort
    * (sortBeforeRepartition) that hash partitioning skips.
    *
    * Only NARROW plans (scan/project/filter/generate chains) are probed:
    * under AQE, `df.rdd` on a plan containing an exchange MATERIALIZES the
    * upstream shuffle stages as real jobs, so for any plan that already
    * shuffles (whose output partitioning is governed by
    * spark.sql.shuffle.partitions anyway) spread is an immediate no-op
    * rather than a silent double execution. */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val narrow = df.queryExecution.optimizedPlan.collectFirst {
      case _: Join | _: Aggregate | _: Distinct | _: RepartitionOperation |
           _: Window | _: Sort | _: GlobalLimit => ()
    }.isEmpty
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (narrow && df.rdd.getNumPartitions < p) {
      if (keys.isEmpty) df.repartition(p) else df.repartition(p, keys: _*)
    } else df
  }

  /** The events table's `ts` column has shipped in three physical encodings
    * across harness testdata generations, so the loader adapts to whatever it
    * observes instead of hard-coding one case (the reference's silver layer is
    * equally defensive about input shape —
    * reference/pipelines/silver/transform_local.py:37-74):
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4's reader rejects it outright
    *    (PARQUET_TYPE_ILLEGAL), so we read nanos as a raw long (legacy conf,
    *    runtime-settable) and rebuild microseconds with integral `div` — a
    *    double division would lose precision above 2^53 ns;
    *  - TIMESTAMP_NTZ (plain timestamp[us], no zone): cast to TimestampType.
    *    The session timezone is pinned UTC, so the wall-clock reinterpreted
    *    as an instant is identical to what DuckDB reads from the same file;
    *  - TimestampType: passthrough.
    *
    * The normalized contract (asserted by TestdataDriftSpec) is always
    * `ts: TimestampType`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType =>
        df
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other — update Tables.events for the new testdata encoding")
    }
  }
}
