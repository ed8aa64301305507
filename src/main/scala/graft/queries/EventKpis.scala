package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** The reference's medallion KPI shapes re-expressed on the harness `events`
  * table (event_id, ts, user_id, event_type, value, props).
  *
  * Mapping (SURVEY.md §7.1): `ts`→occurred_at, `user_id`→author/story key,
  * `value`→metric, `props` (JSON string)→open-content payload (P4 parse).
  *
  * Oracle-determinism rules used throughout (SURVEY.md §7.4):
  *  - money/metric sums go through DECIMAL(18,2) (exact) and are cast to
  *    DOUBLE at the end — bit-identical across engines, no float-sum drift;
  *  - averages are computed as exact-decimal-sum / count in DOUBLE;
  *  - raw timestamps never appear in compared output (dates / epoch micros
  *    only) because the parquet files carry nanos that both engines truncate.
  */
object EventKpis {

  private val AllowedTypes = Seq("click", "error", "purchase", "signup", "view")

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** exact decimal sum exposed as double */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  // --------------------------------------------------------------------------
  // q_velocity — F1+A1 (reference kpis_local.py:36-47: writing velocity daily)
  // --------------------------------------------------------------------------
  def velocity(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("p_event_date"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .withColumn("avg_value", col("sum_value") / col("n_events"))

  val velocitySql: String =
    """SELECT CAST(ts AS DATE) AS p_event_date, user_id,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------
  // q_churn — A2 (kpis_local.py:60-75: revision churn daily; map-metric
  // extraction P10 done via JSON path on props)
  // --------------------------------------------------------------------------
  def churn(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(to_date(col("ts")).as("p_event_date"), col("user_id"))
      .agg(
        count(lit(1)).as("revision_events"),
        sum(coalesce(col("k"), lit(1L))).as("revision_sum"))
      .withColumn("churn_index",
        col("revision_sum").cast(DoubleType) / col("revision_events"))

  val churnSql: String =
    """SELECT CAST(ts AS DATE) AS p_event_date, user_id,
      |  COUNT(*) AS revision_events,
      |  CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 1)) AS BIGINT) AS revision_sum,
      |  CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 1)) AS DOUBLE) / COUNT(*) AS churn_index
      |FROM events WHERE event_type = 'click'
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------
  // q_engagement_bands — P13+A3 (retention_local.py:28-34,60-67: clamp score
  // to [0,100], band to floor/10*10, count + avg per band). Null-preserving
  // `when` kept even though harness values are non-null (reference semantics).
  // --------------------------------------------------------------------------
  def engagementBands(spark: SparkSession, dir: String): DataFrame = {
    val banded = when(col("value").isNull, lit(null))
      .otherwise((floor(least(greatest(col("value"), lit(0.0)), lit(100.0)) / 10.0) * 10).cast(LongType))
    Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .withColumn("score_band", banded)
      .groupBy(to_date(col("ts")).as("p_event_date"), col("score_band"))
      .agg(count(lit(1)).as("engagement_events"), dsum(col("value")).as("sum_score"))
      .withColumn("avg_score_in_band", col("sum_score") / col("engagement_events"))
      .drop("sum_score")
  }

  val engagementBandsSql: String =
    """SELECT CAST(ts AS DATE) AS p_event_date,
      |  CAST(FLOOR(LEAST(GREATEST(value, 0), 100) / 10) * 10 AS BIGINT) AS score_band,
      |  COUNT(*) AS engagement_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_score_in_band
      |FROM events WHERE event_type = 'view'
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------
  // q_dropoff — A4+J1+P12+P16 (retention_local.py:81-101: two count
  // aggregations aligned by full outer join on the composite key, null-filled,
  // guarded rate). The only join in the reference codebase.
  // --------------------------------------------------------------------------
  def dropoff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("p_event_date"), col("user_id"), col("event_type"))
    val eng = ev.filter(col("event_type") === "view")
      .groupBy("p_event_date", "user_id").agg(count(lit(1)).as("engagement_events"))
    val drp = ev.filter(col("event_type") === "error")
      .groupBy("p_event_date", "user_id").agg(count(lit(1)).as("dropoff_events"))
    eng.join(drp, Seq("p_event_date", "user_id"), "full_outer")
      .na.fill(0L, Seq("engagement_events", "dropoff_events"))
      .withColumn("total_events", col("engagement_events") + col("dropoff_events"))
      .withColumn("dropoff_rate",
        when(col("total_events") > 0,
          col("dropoff_events").cast(DoubleType) / col("total_events"))
          .otherwise(lit(0.0)))
  }

  val dropoffSql: String =
    """WITH eng AS (
      |  SELECT CAST(ts AS DATE) AS p_event_date, user_id, COUNT(*) AS engagement_events
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |drp AS (
      |  SELECT CAST(ts AS DATE) AS p_event_date, user_id, COUNT(*) AS dropoff_events
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      |SELECT COALESCE(e.p_event_date, d.p_event_date) AS p_event_date,
      |  COALESCE(e.user_id, d.user_id) AS user_id,
      |  COALESCE(e.engagement_events, 0) AS engagement_events,
      |  COALESCE(d.dropoff_events, 0) AS dropoff_events,
      |  COALESCE(e.engagement_events, 0) + COALESCE(d.dropoff_events, 0) AS total_events,
      |  CASE WHEN COALESCE(e.engagement_events, 0) + COALESCE(d.dropoff_events, 0) > 0
      |    THEN CAST(COALESCE(d.dropoff_events, 0) AS DOUBLE)
      |         / (COALESCE(e.engagement_events, 0) + COALESCE(d.dropoff_events, 0))
      |    ELSE 0.0 END AS dropoff_rate
      |FROM eng e FULL OUTER JOIN drp d
      |  ON e.p_event_date = d.p_event_date AND e.user_id = d.user_id""".stripMargin

  // --------------------------------------------------------------------------
  // q_bottlenecks — W1+F6+A5 (bottlenecks_local.py:29-62: lead() over
  // event-time window → stage transition duration → per-stage count/avg/
  // p50/p90/max). Durations kept in exact integer microseconds; percentiles
  // exact-interpolating (matches DuckDB percentile_cont), rounded to absorb
  // last-ulp interpolation differences.
  //
  // SCALE: Spark's percentile_cont aggregate BUFFERS each group's values in
  // executor memory, and event_type is the only key — a 100× scale-up
  // concentrates ~all rows into ~5 groups and OOMs the buffer. This is the
  // rank method instead: row_number + count over the group (sort-based
  // window — WindowExec spills to disk, memory stays bounded at any group
  // size), then an ordinary hash aggregate touches ONLY the two boundary
  // ranks per quantile: value = v[lo] + frac·(v[lo+1] − v[lo]) with
  // lo = ⌊(n−1)p⌋ — percentile_cont's own formula, same doubles, same
  // result. The per-group sort is the irreducible cost of an EXACT
  // percentile; q_bottlenecks_approx remains the declared sketch path.
  // --------------------------------------------------------------------------
  def bottlenecks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val dur = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("duration_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .filter(col("next_ts").isNotNull && col("duration_us") >= 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("duration_us"))
    val wGrp = Window.partitionBy(col("event_type"))
    val ranked = dur
      .select(col("event_type"), col("duration_us"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wGrp))
    def pc(p: Double): Column = {
      val r = (col("n") - 1).cast(DoubleType) * lit(p)
      val lo = floor(r).cast("long") + 1 // 1-based boundary rank
      val vLo = sum(when(col("rn") === lo, col("duration_us").cast(DoubleType)))
      val vHi = sum(when(col("rn") === lo + 1, col("duration_us").cast(DoubleType)))
      val frac = max(r - floor(r)) // constant within the group
      vLo + frac * (coalesce(vHi, vLo) - vLo)
    }
    ranked.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("stage_hops"),
        sum(col("duration_us")).as("total_us"),
        round(pc(0.5), 1).as("p50_us"),
        round(pc(0.9), 1).as("p90_us"),
        max(col("duration_us")).as("max_us"))
      .withColumn("avg_us", col("total_us").cast(DoubleType) / col("stage_hops"))
  }

  // --------------------------------------------------------------------------
  // q_bottlenecks_approx — A5 with the reference's ACTUAL aggregate
  // (bottlenecks_local.py:58-59 uses percentile_approx, not an exact
  // percentile). The sketch (Greenwald-Khanna summary) is exact while a
  // group's row count stays under the accuracy parameter — true at every
  // test SF (≤ ~20k rows/stage at sf0.1 vs accuracy 100 000) — and at that
  // accuracy Spark's rank convention empirically equals DuckDB's
  // quantile_disc (sorted[floor(q·(n−1))], verified on n=10/11/2000 probes),
  // so the oracle hash-matches the real approx operator, closing the one
  // SURVEY §2 row that previously had no oracle. At 100 TB the same
  // aggregate degrades gracefully to its ±1/accuracy rank guarantee and
  // stays a single mergeable partial-agg (no sort, bounded memory) — the
  // reason the reference chose it.
  // --------------------------------------------------------------------------
  val ApproxAccuracy = 100000

  def bottlenecksApprox(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("duration_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .filter(col("next_ts").isNotNull && col("duration_us") >= 0)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("stage_hops"),
        expr(s"percentile_approx(duration_us, 0.5, $ApproxAccuracy)").as("p50_us"),
        expr(s"percentile_approx(duration_us, 0.9, $ApproxAccuracy)").as("p90_us"),
        max(col("duration_us")).as("max_us"))
  }

  val bottlenecksApproxSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_ts
      |  FROM events),
      |dur AS (
      |  SELECT event_type,
      |    epoch_us(next_ts) - epoch_us(ts) AS duration_us
      |  FROM seq WHERE next_ts IS NOT NULL AND epoch_us(next_ts) - epoch_us(ts) >= 0)
      |SELECT event_type,
      |  COUNT(*) AS stage_hops,
      |  quantile_disc(duration_us, 0.5) AS p50_us,
      |  quantile_disc(duration_us, 0.9) AS p90_us,
      |  MAX(duration_us) AS max_us
      |FROM dur GROUP BY event_type""".stripMargin

  val bottlenecksSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_ts
      |  FROM events),
      |dur AS (
      |  SELECT event_type,
      |    epoch_us(next_ts) - epoch_us(ts) AS duration_us
      |  FROM seq WHERE next_ts IS NOT NULL AND epoch_us(next_ts) - epoch_us(ts) >= 0)
      |SELECT event_type,
      |  COUNT(*) AS stage_hops,
      |  CAST(SUM(duration_us) AS BIGINT) AS total_us,
      |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY duration_us), 1) AS p50_us,
      |  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY duration_us), 1) AS p90_us,
      |  MAX(duration_us) AS max_us,
      |  CAST(SUM(duration_us) AS DOUBLE) / COUNT(*) AS avg_us
      |FROM dur GROUP BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // q_silver_flatten — P4-P7 + F1-F5 (transform_local.py:71-154: JSON parse
  // to struct, timestamp/date derivation, validity predicate, flatten).
  // --------------------------------------------------------------------------
  def silverFlatten(spark: SparkSession, dir: String): DataFrame = {
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    // single-row-group input arrives as ONE partition; spread the per-row
    // JSON parse across cores (row-identical output, order-free compare;
    // Tables.spread is a no-op on properly-split inputs)
    Tables.spread(Tables.events(spark, dir))
      .withColumn("parsed", from_json(col("props"), propsSchema))
      .withColumn("p_event_date", to_date(col("ts")))
      .filter(
        col("event_type").isin(AllowedTypes: _*) &&
        col("value").isNotNull && col("value") >= 0 &&
        col("parsed").isNotNull && col("parsed.k").isNotNull)
      .select(
        col("event_id"), col("p_event_date"), col("event_type"),
        col("user_id"), col("value"), col("parsed.k").as("prop_k"))
  }

  val silverFlattenSql: String =
    """SELECT event_id, CAST(ts AS DATE) AS p_event_date, event_type, user_id, value,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
      |FROM events
      |WHERE event_type IN ('click','error','purchase','signup','view')
      |  AND value IS NOT NULL AND value >= 0
      |  AND json_extract_string(props, '$.k') IS NOT NULL""".stripMargin

  // --------------------------------------------------------------------------
  // q_reject_classifier — P14(a) (transform_local.py:157-169: first-match-wins
  // CASE/WHEN reject-reason chain; branch order is observable and preserved).
  // --------------------------------------------------------------------------
  def rejectClassifier(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k")
    val reason = when(col("props").isNull || k.isNull, "JSON_PARSE_FAILED")
      .when(col("event_id").isNull, "MISSING_EVENT_ID")
      .when(col("event_type").isNull, "MISSING_EVENT_TYPE")
      .when(!col("event_type").isin(AllowedTypes: _*), "INVALID_EVENT_TYPE")
      .when(col("value").isNull, "MISSING_METRIC")
      .when(col("value") < 0.05, "INVALID_METRIC")
      .otherwise("VALID")
    Tables.events(spark, dir)
      .withColumn("reject_reason", reason)
      .groupBy(col("reject_reason"))
      .agg(count(lit(1)).as("n_events"))
  }

  val rejectClassifierSql: String =
    """SELECT CASE
      |  WHEN props IS NULL OR json_extract_string(props, '$.k') IS NULL THEN 'JSON_PARSE_FAILED'
      |  WHEN event_id IS NULL THEN 'MISSING_EVENT_ID'
      |  WHEN event_type IS NULL THEN 'MISSING_EVENT_TYPE'
      |  WHEN event_type NOT IN ('click','error','purchase','signup','view') THEN 'INVALID_EVENT_TYPE'
      |  WHEN value IS NULL THEN 'MISSING_METRIC'
      |  WHEN value < 0.05 THEN 'INVALID_METRIC'
      |  ELSE 'VALID' END AS reject_reason,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_dedup_latest — §2.10 dedupe-keep-latest (docs/runbooks/
  // silver-transform.md:114-122: MERGE keeping max(ingested_at) per key,
  // re-expressed as the row_number window idiom — the scalable plain-parquet
  // equivalent of Delta MERGE).
  // --------------------------------------------------------------------------
  def dedupLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_id").as("last_event_id"),
        to_date(col("ts")).as("last_date"), col("event_type").as("last_type"),
        col("value").as("last_value"))
  }

  val dedupLatestSql: String =
    """SELECT user_id, event_id AS last_event_id, CAST(ts AS DATE) AS last_date,
      |  event_type AS last_type, value AS last_value
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_event_hash — P8′ field-based idempotency hash (docs/runbooks/
  // silver-transform.md:98-112: sha2(concat_ws('||', fields), 256)).
  // --------------------------------------------------------------------------
  def eventHash(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        sha2(concat_ws("||",
          col("event_type"),
          col("event_id").cast(StringType),
          col("user_id").cast(StringType),
          col("value").cast(StringType)), 256).as("event_hash"))

  val eventHashSql: String =
    """SELECT event_id,
      |  sha256(concat_ws('||', event_type, CAST(event_id AS VARCHAR),
      |    CAST(user_id AS VARCHAR), CAST(value AS VARCHAR))) AS event_hash
      |FROM events""".stripMargin

  // --------------------------------------------------------------------------
  // q_late_flag — P9 late-event flag (transform_local.py:108-109:
  // datediff(ingest, event) > 7 → is_late_event). The reference anchors to
  // processing time; the oracle needs determinism so we anchor to a fixed
  // as-of date (SURVEY.md §7.4 bans current_* in compared output).
  // --------------------------------------------------------------------------
  def lateFlag(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("is_late_event",
        datediff(to_date(lit("2024-01-15")), to_date(col("ts"))) > 7)
      .groupBy(col("is_late_event"))
      .agg(count(lit(1)).as("n_events"))

  val lateFlagSql: String =
    """SELECT date_diff('day', CAST(ts AS DATE), DATE '2024-01-15') > 7 AS is_late_event,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q_post_release — KPI #6 "Post-Release Engagement" (docs/kpis.md:99-114:
  // "reader interaction after content is released"; no reference
  // implementation exists — the shape follows the documented contract).
  // Engagement events ('view') are attributed to the most recent
  // prior-or-simultaneous release event ('signup') of the same key via the
  // single-shuffle as-of join, pre-release events drop out, and the result
  // aggregates per key/day. Time-since-release stays in exact integer
  // microseconds (unix_micros ↔ epoch_us); score sums go through
  // DECIMAL(18,2). The gold-layer silver-schema variant is
  // Gold.postReleaseEngagement.
  // --------------------------------------------------------------------------
  def postRelease(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val ev = Tables.events(spark, dir)
    val engagement = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val releases = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("rid"))
    AsOfJoin.backward(engagement, releases, Seq("user_id"), "ts", "ts",
        Map("rid" -> "release_event_id", "ts" -> "released_ts"))
      .filter(col("release_event_id").isNotNull) // post-release only
      .withColumn("us_since_release",
        unix_micros(col("ts")) - unix_micros(col("released_ts")))
      .groupBy(to_date(col("ts")).as("p_event_date"), col("user_id"))
      .agg(
        count(lit(1)).as("engagement_events"),
        dsum(col("value")).as("sum_score"),
        sum(col("us_since_release")).as("total_us_since_release"),
        max(col("us_since_release")).as("max_us_since_release"))
      .withColumn("avg_score", col("sum_score") / col("engagement_events"))
      .withColumn("avg_us_since_release",
        col("total_us_since_release").cast(DoubleType) / col("engagement_events"))
      .drop("sum_score")
  }

  val postReleaseSql: String =
    """WITH eng AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events WHERE event_type = 'view'),
      |rel AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS release_event_id
      |  FROM events WHERE event_type = 'signup'),
      |j AS (
      |  SELECT e.user_id, e.ts, e.value,
      |    epoch_us(e.ts) - epoch_us(r.ts) AS us_since
      |  FROM eng e ASOF JOIN rel r ON e.user_id = r.user_id AND e.ts >= r.ts)
      |SELECT CAST(ts AS DATE) AS p_event_date, user_id,
      |  COUNT(*) AS engagement_events,
      |  CAST(SUM(us_since) AS BIGINT) AS total_us_since_release,
      |  CAST(MAX(us_since) AS BIGINT) AS max_us_since_release,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_score,
      |  CAST(SUM(us_since) AS DOUBLE) / COUNT(*) AS avg_us_since_release
      |FROM j GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_post_release"      -> (postRelease _),
    "q_velocity"          -> (velocity _),
    "q_churn"             -> (churn _),
    "q_engagement_bands"  -> (engagementBands _),
    "q_dropoff"           -> (dropoff _),
    "q_bottlenecks"       -> (bottlenecks _),
    "q_bottlenecks_approx" -> (bottlenecksApprox _),
    "q_silver_flatten"    -> (silverFlatten _),
    "q_reject_classifier" -> (rejectClassifier _),
    "q_dedup_latest"      -> (dedupLatest _),
    "q_event_hash"        -> (eventHash _),
    "q_late_flag"         -> (lateFlag _),
  )

  val oracles: Map[String, String] = Map(
    "q_post_release"      -> postReleaseSql,
    "q_velocity"          -> velocitySql,
    "q_churn"             -> churnSql,
    "q_engagement_bands"  -> engagementBandsSql,
    "q_dropoff"           -> dropoffSql,
    "q_bottlenecks"       -> bottlenecksSql,
    "q_bottlenecks_approx" -> bottlenecksApproxSql,
    "q_silver_flatten"    -> silverFlattenSql,
    "q_reject_classifier" -> rejectClassifierSql,
    "q_dedup_latest"      -> dedupLatestSql,
    "q_event_hash"        -> eventHashSql,
    "q_late_flag"         -> lateFlagSql,
  )
}
