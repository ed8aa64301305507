package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** Bridge for implementing a DSv1 streaming `Source` from outside Spark's
  * packages: `getBatch` must return a DataFrame whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts exactly that), and the
  * only constructors for such a plan — `LogicalRelation(..., isStreaming)`
  * and `Dataset.ofRows` — are `private[sql]`. This is the same pair Spark's
  * own FileStreamSource uses (FileStreamSource.getBatch); the shim lives in
  * an `org.apache.spark.sql` subpackage solely to reach them, and contains
  * no logic of its own.
  */
object StreamingRelationShim {

  /** A STREAMING DataFrame over an explicit list of parquet files with a
    * fixed schema (no inference, no file listing). */
  def parquetBatch(spark: SparkSession, schema: StructType,
      files: Seq[String]): DataFrame = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (files.isEmpty) {
      Dataset.ofRows(session,
        LocalRelation(org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
          Nil, isStreaming = true))
    } else {
      val relation = DataSource(
        sparkSession = session,
        paths = files,
        userSpecifiedSchema = Some(schema),
        className = "parquet").resolveRelation(checkFilesExist = false)
      Dataset.ofRows(session, LogicalRelation(relation, isStreaming = true))
    }
  }

  /** Re-plan a micro-batch DataFrame (backed by an IncrementalExecution)
    * as a BATCH DataFrame a Sink can hand to ordinary writers: execute the
    * incremental plan to an InternalRow RDD and wrap it in a LogicalRDD —
    * the standard DSv1 custom-sink idiom (rows are `copy()`d because
    * unsafe-row buffers are reused per partition). */
  def batchOf(data: DataFrame): DataFrame = {
    val session = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = data.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    Dataset.ofRows(session,
      org.apache.spark.sql.execution.LogicalRDD(qe.analyzed.output, rdd)(session))
  }

  /** Re-plan an arbitrary BATCH DataFrame as a STREAMING one — what a
    * `Source.getBatch` computing row-level diffs (joins/anti-joins, not a
    * single file relation) must return: MicroBatchExecution asserts
    * `isStreaming` on the plan, and `LogicalRDD` is the one public-shaped
    * leaf that both carries the flag and wraps an already-planned
    * computation. The wrapped RDD stays lazy — jobs run when the engine
    * executes the batch, not here. */
  def streamingOf(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    Dataset.ofRows(session,
      org.apache.spark.sql.execution.LogicalRDD(
        qe.analyzed.output, qe.toRdd.map(_.copy()), isStreaming = true)(session))
  }

  /** The running streaming query's id during `Sink.addBatch` — Spark sets
    * it as a local property on the spark context (how Delta's sink derives
    * a stable txn appId without an explicit option). */
  def currentQueryId(spark: SparkSession): Option[String] =
    Option(spark.sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY))
}
