package graft.creatorops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gold layer: the five KPI aggregates, each a pure silver→KPI DataFrame
  * function mirroring the reference's gold scripts.
  *
  * `asOf` replaces the reference's `current_date()` stamp
  * (retention_local.py:66,100, bottlenecks_local.py:62) so outputs can be
  * made deterministic for testing; pass nothing to keep reference behavior.
  *
  * Plan shape: every KPI is filter → (map-extract) → single hash aggregation,
  * so Catalyst plans partial+final aggregation and the only network traffic
  * is the compacted group keys (SURVEY.md §2.5). Bottlenecks adds one
  * event-time window shuffle before its aggregation (§2.6).
  */
object Gold {

  private def intMetric(key: String): Column =
    col("metrics").getItem(key).cast(IntegerType)
  private def dblMetric(key: String): Column =
    col("metrics").getItem(key).cast(DoubleType)

  /** Score banding: clamp to [0,100], bucket by 10 (retention_local.py:28-34). */
  def band10(score: Column): Column =
    when(score.isNull, lit(null))
      .otherwise(floor(least(greatest(score, lit(0.0)), lit(100.0)) / 10.0) * 10.0)

  /** KPI 1 — writing velocity daily (kpis_local.py:33-46). */
  def writingVelocity(silver: DataFrame): DataFrame =
    silver
      .filter(col("event_type") === "chapter_written")
      .withColumn("word_count", intMetric("wordCount"))
      .groupBy(col("p_event_date"), col("tenant_id"), col("author_id"),
        col("story_id"), col("series_id"))
      .agg(
        count(lit(1)).as("chapters_written"),
        sum(col("word_count")).as("words_written"),
        avg(col("word_count")).as("avg_words_per_chapter"))
      .withColumn("words_written", coalesce(col("words_written"), lit(0L)))

  /** KPI 2 — revision churn daily (kpis_local.py:57-74). */
  def revisionChurn(silver: DataFrame): DataFrame =
    silver
      .filter(col("event_type") === "scene_revised")
      .withColumn("revision_count", coalesce(intMetric("revisionCount"), lit(1)))
      .groupBy(col("p_event_date"), col("tenant_id"), col("author_id"),
        col("story_id"), col("series_id"))
      .agg(
        count(lit(1)).as("revision_events"),
        sum(col("revision_count")).as("revision_count_sum"))
      .withColumn("revision_churn_index",
        when(col("revision_events") === 0, lit(0.0))
          .otherwise(col("revision_count_sum") / col("revision_events")))

  /** KPI 3 — engagement score bands daily (retention_local.py:40-67). */
  def engagementBands(silver: DataFrame, asOf: Column = current_date()): DataFrame =
    silver
      .filter(col("event_type") === "reader_engagement")
      .withColumn("engagement_score", dblMetric("engagementScore"))
      .withColumn("score_band", band10(col("engagement_score")))
      .groupBy(col("p_event_date"), col("tenant_id"), col("story_id"),
        col("series_id"), col("score_band"))
      .agg(
        count(lit(1)).as("engagement_events"),
        avg(col("engagement_score")).as("avg_score_in_band"))
      .withColumn("as_of_date", asOf)

  /** KPI 4 — dropoff rate daily: two count aggregations aligned by a full
    * outer join on the composite key (retention_local.py:77-101 — the only
    * join in the reference). */
  def dropoffRate(silver: DataFrame, asOf: Column = current_date()): DataFrame = {
    val key = Seq("p_event_date", "tenant_id", "story_id", "series_id")
    val eng = silver.filter(col("event_type") === "reader_engagement")
      .groupBy(key.map(col): _*).agg(count(lit(1)).as("engagement_events"))
    val drp = silver.filter(col("event_type") === "reader_dropoff")
      .groupBy(key.map(col): _*).agg(count(lit(1)).as("dropoff_events"))
    eng.join(drp, key, "full_outer")
      .na.fill(0L, Seq("engagement_events", "dropoff_events"))
      .withColumn("total_events", col("engagement_events") + col("dropoff_events"))
      .withColumn("dropoff_rate",
        when(col("total_events") === 0, lit(0.0))
          .otherwise(col("dropoff_events") / col("total_events")))
      .withColumn("as_of_date", asOf)
  }

  /** KPI 5 — stage bottlenecks: per-story event-time lead() window → stage
    * dwell durations → per-stage count/avg/p50/p90/max hours
    * (bottlenecks_local.py:27-62). */
  def stageBottlenecks(silver: DataFrame, asOf: Column = current_date()): DataFrame = {
    val w = Window.partitionBy(col("tenant_id"), col("story_id"))
      .orderBy(col("occurred_at").asc)
    silver
      .filter(col("stage").isNotNull)
      .select(col("tenant_id"), col("author_id"), col("story_id"), col("series_id"),
        col("event_id"), col("event_type"), col("occurred_at"), col("stage"),
        col("p_event_date"))
      .withColumn("next_occurred_at", lead(col("occurred_at"), 1).over(w))
      .withColumn("duration_seconds",
        col("next_occurred_at").cast(LongType) - col("occurred_at").cast(LongType))
      .filter(col("next_occurred_at").isNotNull && col("duration_seconds") >= 0)
      .withColumn("duration_hours", col("duration_seconds") / 3600.0)
      .groupBy(col("tenant_id"), col("story_id"), col("series_id"), col("stage"))
      .agg(
        count(lit(1)).as("stage_hops"),
        avg(col("duration_hours")).as("avg_hours_in_stage"),
        expr("percentile_approx(duration_hours, 0.5)").as("p50_hours_in_stage"),
        expr("percentile_approx(duration_hours, 0.9)").as("p90_hours_in_stage"),
        max(col("duration_hours")).as("max_hours_in_stage"))
      .withColumn("as_of_date", asOf)
  }

  /** KPI 6 — post-release engagement (docs/kpis.md:99-114: "reader
    * interaction after content is released"; documented but implemented by
    * neither the reference V1 scripts nor any gold job there — the shape
    * follows the documented contract). Reader engagement events are
    * attributed to the most recent prior-or-simultaneous publish_released
    * event of the same (tenant, story) via the single-shuffle as-of join;
    * engagement with no preceding release drops out; aggregation is per
    * story/day. */
  def postReleaseEngagement(silver: DataFrame, asOf: Column = current_date()): DataFrame =
    postReleaseEngagementFrom(silver, silver, asOf)

  /** Two-source variant for incremental gold runs: engagement can be pruned
    * to the refresh window, but releases must come from FULL silver history —
    * an engagement event's release may predate the window by months. */
  def postReleaseEngagementFrom(
      engagementSilver: DataFrame,
      releaseSilver: DataFrame,
      asOf: Column = current_date()): DataFrame = {
    val releases = releaseSilver.filter(col("event_type") === "publish_released")
      .select(col("tenant_id"), col("story_id"),
        col("occurred_at").as("released_at"), col("event_id").as("release_event_id"))
    val engagement = engagementSilver.filter(col("event_type") === "reader_engagement")
      .withColumn("engagement_score", dblMetric("engagementScore"))
      .select(col("p_event_date"), col("tenant_id"), col("story_id"),
        col("series_id"), col("occurred_at"), col("engagement_score"))
    graft.operators.AsOfJoin.backward(engagement, releases,
        Seq("tenant_id", "story_id"), "occurred_at", "released_at",
        Map("release_event_id" -> "release_event_id", "released_at" -> "released_at"))
      .filter(col("release_event_id").isNotNull)
      .withColumn("hours_since_release",
        (col("occurred_at").cast(LongType) - col("released_at").cast(LongType)) / 3600.0)
      .groupBy(col("p_event_date"), col("tenant_id"), col("story_id"), col("series_id"))
      .agg(
        count(lit(1)).as("engagement_events"),
        avg(col("engagement_score")).as("avg_engagement_score"),
        avg(col("hours_since_release")).as("avg_hours_since_release"),
        max(col("hours_since_release")).as("max_hours_since_release"))
      .withColumn("as_of_date", asOf)
  }
}
