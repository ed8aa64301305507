package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned-parquet table IO — the plain-Spark stand-in for the
  * reference's Delta tables (S2-S4 in SURVEY.md §2.1; this environment has
  * no Delta jars, SURVEY.md §1.3).
  *
  *  - hive-style `partitionBy` keeps partition pruning working for date
  *    filters, matching the reference layout (ingest_local.py:59,
  *    transform_local.py:193)
  *  - `clusterBy` approximates the suggested `ZORDER BY` via
  *    sortWithinPartitions: parquet min/max column stats become selective,
  *    so point lookups skip row groups (02_silver_events.sql:61)
  *  - `compactTo` approximates Delta's OPTIMIZE/autoCompact small-file
  *    management (01_bronze.sql:18-26)
  */
object TableIO {

  def write(
      df: DataFrame,
      path: String,
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      compactTo: Option[Int] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val compacted = compactTo.map(df.repartition).getOrElse(df)
    val clustered =
      if (clusterBy.nonEmpty) compacted.sortWithinPartitions(clusterBy.map(col): _*)
      else compacted
    val writer = clustered.write.mode(mode)
    val partitioned =
      if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    partitioned.parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Hive-partitioned NDJSON writer — the generator-side layout of the
    * reference (`data_generator/generator.py:395-411`: one directory per
    * `p_event_date=...`, newline-delimited JSON inside). Spark's json sink
    * IS newline-delimited. */
  def writeNdjson(df: DataFrame, path: String, partitionBy: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).json(path)

  /** Bucketed catalog table: co-locates join/aggregation keys at WRITE time
    * so repeated joins on the bucket key need no exchange at all — the
    * bucketed scan already exposes HashPartitioning. This is the
    * pre-partitioning strategy for fact-to-fact joins at 100 TB, where
    * re-shuffling either side per query would dominate cost. Both sides
    * must share the bucket count. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.format("parquet").saveAsTable(table)
  }
}
