package graft.creatorops

import org.apache.spark.sql.types._

/** Canonical event contract of the CreatorOps reference.
  *
  * Event types and stage mapping: `/root/reference/data_generator/
  * generator.py:48-72` (authoritative mapping repeated at
  * `docs/data-contracts.md:41-52`). Parse schema: explicit StructType,
  * deliberately not inferred (`pipelines/silver/transform_local.py:36-69`).
  */
object EventSchema {

  val EventTypes: Seq[String] = Seq(
    "draft_created",
    "chapter_written",
    "scene_revised",
    "beta_feedback_received",
    "submission_sent",
    "editor_comment",
    "publish_scheduled",
    "publish_released",
    "reader_engagement",
    "reader_dropoff",
  )

  /** Stage derived from event_type — the authoritative mapping
    * (docs/runbooks/silver-transform.md:63-80: producer stage is advisory). */
  val StageByEvent: Map[String, String] = Map(
    "draft_created"          -> "DRAFT",
    "chapter_written"        -> "WRITE",
    "scene_revised"          -> "REVISION",
    "beta_feedback_received" -> "BETA",
    "submission_sent"        -> "SUBMISSION",
    "editor_comment"         -> "EDIT",
    "publish_scheduled"      -> "SCHEDULED",
    "publish_released"       -> "RELEASED",
    "reader_engagement"      -> "ENGAGEMENT",
    "reader_dropoff"         -> "ENGAGEMENT",
  )

  val Stages: Seq[String] = StageByEvent.values.toSeq.distinct

  /** Parse schema for the raw event JSON (transform_local.py:37-69): metrics
    * and metadata stay map<string,string> — numeric metrics are carried as
    * strings and cast at point of use (kpis_local.py:24-26). */
  val Parse: StructType = StructType(Seq(
    StructField("eventId", StringType),
    StructField("eventType", StringType),
    StructField("eventVersion", IntegerType),
    StructField("occurredAt", StringType),
    StructField("stage", StringType),
    StructField("tenant", StructType(Seq(
      StructField("tenantId", StringType),
      StructField("authorId", StringType),
      StructField("plan", StringType)))),
    StructField("entity", StructType(Seq(
      StructField("storyId", StringType),
      StructField("seriesId", StringType),
      StructField("chapterId", StringType),
      StructField("sceneId", StringType)))),
    StructField("producer", StructType(Seq(
      StructField("service", StringType),
      StructField("env", StringType),
      StructField("region", StringType),
      StructField("traceId", StringType)))),
    StructField("metrics", MapType(StringType, StringType)),
    StructField("metadata", MapType(StringType, StringType)),
  ))
}
