package graft.creatorops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Silver layer: canonical typed event log + reject quarantine.
  *
  * Implements the DOCUMENTED contract (the reference's V1 code is a subset —
  * SURVEY.md §2.10 lists the gaps, all closed here):
  *  - parse + validate + flatten (transform_local.py:71-154)
  *  - first-match-wins reject classifier preserving the V1 branch order
  *    (transform_local.py:157-169), extended with the documented
  *    INVALID_STAGE / INVALID_METRIC / FUTURE_OCCURRED_AT checks
  *    (docs/runbooks/silver-transform.md:54-90, docs/data-contracts.md:82-85)
  *  - stage derived from event_type, producer stage preserved in metadata
  *    (silver-transform.md:63-80)
  *  - field-based SHA-256 idempotency hash (silver-transform.md:98-112)
  *  - typed metric columns alongside the raw map (sql/ddl/02_silver_events.sql:35-37)
  *  - late-event flag: occurred_at < ingested_at - 7 days (silver-transform.md:92-95)
  *  - dedupe keep-latest-by-ingested_at per event_id — the plain-parquet,
  *    shuffle-once equivalent of the documented MERGE (silver-transform.md:114-133)
  *  - rejects carry reject_stage / validation_errors / rejected_at /
  *    p_reject_date (sql/ddl/03_silver_rejects.sql:6-20)
  *
  * Every step is a pure DataFrame function; the only wide operation in the
  * whole layer is the dedupe window (one shuffle on event_id). At 100 TB the
  * input arrives partitioned by ingest date, so the parse/validate/split is
  * embarrassingly parallel and the dedupe shuffle is bounded per batch.
  */
object Silver {

  final case class Result(events: DataFrame, rejects: DataFrame)

  val LateDays = 7
  val FutureGraceMinutes = 5

  // --------------------------------------------------------------------------

  private def stageExpr: Column =
    element_at(typedLit(EventSchema.StageByEvent), col("parsed.eventType"))

  /** Null-on-failure cast: Spark 4 defaults to ANSI mode where a plain cast
    * of a garbage metric string would fail the job; the reference semantics
    * (Spark 3.5, ANSI off) are "invalid → null", which try_cast restores. */
  private def metricCol(key: String, t: DataType): Column =
    col("parsed.metrics").getItem(key).try_cast(t)

  /** Documented field-based hash (silver-transform.md:98-112). */
  def eventHash: Column = sha2(concat_ws("||",
    col("parsed.eventType"),
    col("occurred_at").cast(StringType),
    col("parsed.tenant.tenantId"),
    col("parsed.tenant.authorId"),
    coalesce(col("parsed.entity.seriesId"), lit("")),
    col("parsed.entity.storyId"),
    coalesce(col("parsed.entity.chapterId"), lit("")),
    coalesce(col("parsed.entity.sceneId"), lit("")),
    coalesce(metricCol("revisionCount", IntegerType).cast(StringType), lit("")),
    coalesce(metricCol("wordCount", IntegerType).cast(StringType), lit("")),
    coalesce(metricCol("engagementScore", DoubleType).cast(StringType), lit(""))), 256)

  /** Parse bronze raw_json into the canonical struct + derived time columns
    * (transform_local.py:71-77). */
  def parse(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("parsed", from_json(col("raw_json"), EventSchema.Parse))
      // Spark 4 from_json yields an all-null struct (not a null struct) for
      // malformed input, so the reference's `parsed.isNotNull` test
      // (transform_local.py:74) no longer detects corruption; try_parse_json
      // gives the equivalent valid-JSON predicate.
      .withColumn("parse_ok", try_parse_json(col("raw_json")).isNotNull)
      // try_to_timestamp: unparseable occurredAt → null → INVALID_OCCURRED_AT
      // reject, matching the reference's non-ANSI to_timestamp behavior
      .withColumn("occurred_at", try_to_timestamp(col("parsed.occurredAt")))
      .withColumn("p_event_date", to_date(col("occurred_at")))

  /** Metric range rules (silver-transform.md:82-90): each metric valid when
    * absent or in range; engagement bounds apply to reader_* events. */
  private def metricOk: Column = {
    val rev = metricCol("revisionCount", IntegerType)
    val words = metricCol("wordCount", IntegerType)
    val score = metricCol("engagementScore", DoubleType)
    val revOk = rev.isNull || rev >= 0
    val wordsOk = words.isNull || words >= 0
    val scoreOk = !col("parsed.eventType").startsWith("reader_") ||
      score.isNull || (score >= 0.0 && score <= 100.0)
    revOk && wordsOk && scoreOk
  }

  private def futureOk: Column =
    col("occurred_at").isNull ||
      col("occurred_at") <= col("ingested_at") + expr(s"INTERVAL $FutureGraceMinutes MINUTES")

  private def stageEnumOk: Column =
    col("parsed.stage").isNull ||
      col("parsed.stage").isin(EventSchema.Stages: _*)

  /** First-match-wins reject reason — V1 branch order preserved verbatim
    * (transform_local.py:157-169), documented checks appended. Returns null
    * for good rows. */
  def rejectReason: Column =
    when(!col("parse_ok"), "JSON_PARSE_FAILED")
      .when(col("parsed.eventId").isNull, "MISSING_EVENT_ID")
      .when(col("parsed.eventType").isNull, "MISSING_EVENT_TYPE")
      .when(!col("parsed.eventType").isin(EventSchema.EventTypes: _*), "INVALID_EVENT_TYPE")
      .when(col("parsed.eventVersion").isNull, "MISSING_EVENT_VERSION")
      .when(col("parsed.eventVersion") < 1, "INVALID_EVENT_VERSION")
      .when(col("occurred_at").isNull, "INVALID_OCCURRED_AT")
      .when(col("parsed.tenant.tenantId").isNull, "MISSING_TENANT_ID")
      .when(col("parsed.tenant.authorId").isNull, "MISSING_AUTHOR_ID")
      .when(col("parsed.entity.storyId").isNull, "MISSING_STORY_ID")
      .when(!stageEnumOk, "INVALID_STAGE")
      .when(!metricOk, "INVALID_METRIC")
      .when(!futureOk, "FUTURE_OCCURRED_AT")

  /** reject_stage classification (03_silver_rejects.sql:10;
    * silver-transform.md:52-90). */
  val StageByReason: Map[String, String] = Map(
    "JSON_PARSE_FAILED"     -> "parsing",
    "MISSING_EVENT_ID"      -> "validation",
    "MISSING_EVENT_TYPE"    -> "validation",
    "INVALID_EVENT_TYPE"    -> "enum_check",
    "MISSING_EVENT_VERSION" -> "validation",
    "INVALID_EVENT_VERSION" -> "validation",
    "INVALID_OCCURRED_AT"   -> "validation",
    "MISSING_TENANT_ID"     -> "validation",
    "MISSING_AUTHOR_ID"     -> "validation",
    "MISSING_STORY_ID"      -> "validation",
    "INVALID_STAGE"         -> "enum_check",
    "INVALID_METRIC"        -> "metric_check",
    "FUTURE_OCCURRED_AT"    -> "validation",
  )

  // --------------------------------------------------------------------------

  /** Full silver transform: parse → split → flatten/enrich good rows →
    * dedupe; quarantine bad rows with reason + stage + details. */
  def transform(bronze: DataFrame, dedupe: Boolean = true): Result = {
    val parsed = parse(bronze)
    val reason = rejectReason

    val annotated = parsed.withColumn("reject_reason", reason)

    val good = annotated.filter(col("reject_reason").isNull).select(
      col("parsed.eventId").as("event_id"),
      col("parsed.eventType").as("event_type"),
      col("parsed.eventVersion").as("event_version"),
      col("occurred_at"),
      col("p_event_date"),
      // authoritative derived stage; producer stage preserved in metadata
      stageExpr.as("stage"),
      col("parsed.tenant.tenantId").as("tenant_id"),
      col("parsed.tenant.authorId").as("author_id"),
      col("parsed.tenant.plan").as("plan"),
      col("parsed.entity.storyId").as("story_id"),
      col("parsed.entity.seriesId").as("series_id"),
      col("parsed.entity.chapterId").as("chapter_id"),
      col("parsed.entity.sceneId").as("scene_id"),
      col("parsed.producer.service").as("producer_service"),
      col("parsed.producer.env").as("producer_env"),
      col("parsed.producer.region").as("producer_region"),
      col("parsed.producer.traceId").as("trace_id"),
      col("parsed.metrics").as("metrics"),
      when(col("parsed.stage").isNotNull,
        map_concat(coalesce(col("parsed.metadata"), map()),
          map(lit("producerStage"), col("parsed.stage"))))
        .otherwise(col("parsed.metadata")).as("metadata"),
      // typed metric columns (02_silver_events.sql:35-37)
      metricCol("revisionCount", IntegerType).as("revision_count"),
      metricCol("wordCount", IntegerType).as("word_count"),
      metricCol("engagementScore", DoubleType).as("engagement_score"),
      eventHash.as("event_hash"),
      (col("occurred_at") < col("ingested_at") - expr(s"INTERVAL $LateDays DAYS"))
        .as("is_late_event"),
      col("ingest_id"), col("source"), col("raw_schema_version"),
      col("ingested_at"), col("p_ingest_date"), col("raw_json"))

    val deduped =
      if (dedupe) {
        val w = Window.partitionBy(col("event_id"))
          .orderBy(col("ingested_at").desc, col("event_hash").desc)
        good.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      } else good

    val rejects = annotated.filter(col("reject_reason").isNotNull).select(
      col("reject_reason"),
      element_at(typedLit(StageByReason), col("reject_reason")).as("reject_stage"),
      to_json(struct(
        col("reject_reason").as("reason"),
        col("parsed.eventId").as("eventId"),
        col("parsed.eventType").as("eventType"))).as("validation_errors"),
      sha2(coalesce(col("raw_json"), lit("")), 256).as("event_hash"),
      current_timestamp().as("rejected_at"),
      current_date().as("p_reject_date"),
      col("ingest_id"), col("source"), col("raw_schema_version"),
      col("ingested_at"), col("p_ingest_date"), col("raw_json"))

    Result(deduped, rejects)
  }
}
