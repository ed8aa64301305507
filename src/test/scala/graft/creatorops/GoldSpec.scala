package graft.creatorops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GoldSpec extends SparkSpec {

  /** Small deterministic silver corpus: 2 chapters + 2 revisions + 3 reader
    * events for one (tenant, author, story) on one day. */
  private lazy val silver = {
    val lines = Seq(
      Fixtures.valid(id = "C1", eventType = "chapter_written", stage = "WRITE",
        occurredAt = "2026-01-15T10:00:00Z", metrics = """{"wordCount": "1000"}"""),
      Fixtures.valid(id = "C2", eventType = "chapter_written", stage = "WRITE",
        occurredAt = "2026-01-15T12:00:00Z", metrics = """{"wordCount": "2000"}"""),
      Fixtures.valid(id = "R1", eventType = "scene_revised", stage = "REVISION",
        occurredAt = "2026-01-15T13:00:00Z", metrics = """{"revisionCount": "3"}"""),
      Fixtures.valid(id = "R2", eventType = "scene_revised", stage = "REVISION",
        occurredAt = "2026-01-15T14:00:00Z", metrics = "{}"),
      Fixtures.valid(id = "E1", eventType = "reader_engagement", stage = "ENGAGEMENT",
        occurredAt = "2026-01-15T15:00:00Z", metrics = """{"engagementScore": "61.25"}"""),
      Fixtures.valid(id = "E2", eventType = "reader_engagement", stage = "ENGAGEMENT",
        occurredAt = "2026-01-15T16:00:00Z", metrics = """{"engagementScore": "100"}"""),
      Fixtures.valid(id = "D1", eventType = "reader_dropoff", stage = "ENGAGEMENT",
        occurredAt = "2026-01-15T17:00:00Z", metrics = """{"engagementScore": "5"}"""))
    Silver.transform(Bronze.ingest(spark, Seq(Fixtures.writeNdjson(lines)))).events.cache()
  }

  test("writing velocity: counts, sum, avg per day/author/story") {
    val r = Gold.writingVelocity(silver).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("chapters_written") == 2L)
    assert(row.getAs[Long]("words_written") == 3000L)
    assert(row.getAs[Double]("avg_words_per_chapter") == 1500.0)
  }

  test("revision churn: missing revisionCount defaults to 1") {
    val row = Gold.revisionChurn(silver).head()
    assert(row.getAs[Long]("revision_events") == 2L)
    assert(row.getAs[Long]("revision_count_sum") == 4L) // 3 + default 1
    assert(row.getAs[Double]("revision_churn_index") == 2.0)
  }

  test("engagement bands: clamp + floor banding, score 100 → band 100") {
    val bands = Gold.engagementBands(silver, asOf = lit("2026-02-01").cast("date"))
      .select("score_band", "engagement_events").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(bands == Map(60.0 -> 1L, 100.0 -> 1L))
  }

  test("dropoff rate: full-outer aligned counts with zero-fill") {
    val row = Gold.dropoffRate(silver, asOf = lit("2026-02-01").cast("date")).head()
    assert(row.getAs[Long]("engagement_events") == 2L)
    assert(row.getAs[Long]("dropoff_events") == 1L)
    assert(row.getAs[Long]("total_events") == 3L)
    assert(math.abs(row.getAs[Double]("dropoff_rate") - 1.0 / 3.0) < 1e-12)
  }

  test("stage bottlenecks: lead-window durations per stage") {
    val rows = Gold.stageBottlenecks(silver, asOf = lit("2026-02-01").cast("date"))
      .select("stage", "stage_hops", "avg_hours_in_stage").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // events every 1-2h: WRITE->WRITE->REVISION->REVISION->ENG->ENG->DROP
    assert(rows("WRITE") == (2L, 1.5))      // 2h then 1h
    assert(rows("REVISION") == (2L, 1.0))   // 1h, 1h
    assert(rows("ENGAGEMENT") == (2L, 1.0)) // 1h, 1h (last event has no next)
  }

  test("post-release engagement: pre-release events drop, hours measured from release") {
    val lines = Seq(
      Fixtures.valid(id = "P0", eventType = "reader_engagement", stage = "ENGAGEMENT",
        occurredAt = "2026-01-15T09:00:00Z", metrics = """{"engagementScore": "10"}"""),
      Fixtures.valid(id = "REL", eventType = "publish_released", stage = "RELEASED",
        occurredAt = "2026-01-15T12:00:00Z", metrics = "{}"),
      Fixtures.valid(id = "E1", eventType = "reader_engagement", stage = "ENGAGEMENT",
        occurredAt = "2026-01-15T14:00:00Z", metrics = """{"engagementScore": "60"}"""),
      Fixtures.valid(id = "E2", eventType = "reader_engagement", stage = "ENGAGEMENT",
        occurredAt = "2026-01-15T16:00:00Z", metrics = """{"engagementScore": "80"}"""))
    val sv = Silver.transform(Bronze.ingest(spark, Seq(Fixtures.writeNdjson(lines)))).events
    val r = Gold.postReleaseEngagement(sv, asOf = lit("2026-02-01").cast("date")).collect()
    assert(r.length == 1, r.mkString("; "))
    val row = r.head
    assert(row.getAs[Long]("engagement_events") == 2L) // P0 is pre-release
    assert(row.getAs[Double]("avg_engagement_score") == 70.0)
    assert(row.getAs[Double]("avg_hours_since_release") == 3.0) // 2h and 4h
    assert(row.getAs[Double]("max_hours_since_release") == 4.0)
  }

  test("band10 edge cases: null preserved, negatives clamp to 0, 100 stays 100") {
    import spark.implicits._
    val df = Seq(Some(-5.0), Some(0.0), Some(9.99), Some(100.0), None)
      .toDF("s").select(Gold.band10(col("s")).as("b"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq == Seq(0.0, 0.0, 0.0, 100.0, null))
  }
}
