package graft.creatorops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze layer: raw, append-only, replayable audit log of events
  * (reference: `pipelines/bronze/ingest_local.py:28-66`; DDL
  * `sql/ddl/01_bronze.sql:8-22`).
  *
  * Each input record is re-serialized to a single opaque `raw_json` string —
  * bronze never interprets the payload — plus ingestion lineage. The
  * `ingest_id` is ONE uuid per batch, computed driver-side, exactly like the
  * reference's `lit(str(uuid.uuid4()))` (ingest_local.py:47): a lineage
  * handle for the run, not a row id.
  */
object Bronze {

  val Columns: Seq[String] = Seq(
    "ingest_id", "source", "raw_json", "raw_schema_version",
    "ingested_at", "p_ingest_date")

  /** Ingest newline-delimited JSON files. At cluster scale this is a plain
    * file-source scan: schema inference does one extra pass, which is the
    * reference's behavior too (ingest_local.py:39-43); pass `schema` to skip
    * it when the contract is known. */
  def ingest(
      spark: SparkSession,
      paths: Seq[String],
      source: String = "local_generator",
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      ingestedAt: Option[java.sql.Timestamp] = None): DataFrame = {
    val reader = spark.read.option("multiLine", "false")
    val df = schema.map(reader.schema).getOrElse(reader).json(paths: _*)
    fromRaw(df, source, ingestedAt)
  }

  /** Wrap an already-loaded raw frame in the bronze envelope.
    *
    * @param ingestedAt batch-level ingest stamp override; None = now (the
    *                   reference's current_timestamp()). An explicit stamp is
    *                   the replay/backfill hook: re-ingesting an old batch
    *                   under its original ingest date lands it back in the
    *                   same bronze partition. */
  def fromRaw(
      df: DataFrame,
      source: String,
      ingestedAt: Option[java.sql.Timestamp] = None): DataFrame = {
    val ingestId = java.util.UUID.randomUUID().toString
    val stamp = ingestedAt.map(lit(_)).getOrElse(current_timestamp())
    df.select(to_json(struct(col("*"))).as("raw_json"))
      .withColumn("ingest_id", lit(ingestId))
      .withColumn("source", lit(source))
      .withColumn("raw_schema_version", lit(1))
      .withColumn("ingested_at", stamp)
      .withColumn("p_ingest_date", to_date(stamp))
      .select(Columns.map(col): _*)
  }
}
