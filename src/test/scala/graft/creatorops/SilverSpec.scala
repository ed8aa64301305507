package graft.creatorops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SilverSpec extends SparkSpec {

  private lazy val result: Silver.Result = {
    val path = Fixtures.writeNdjson(Fixtures.validPerType ++ Fixtures.rejectLines.map(_._2))
    Silver.transform(Bronze.ingest(spark, Seq(path)))
  }

  test("good ∪ rejects covers every input line exactly once") {
    assert(result.events.count() + result.rejects.count() ==
      (Fixtures.validPerType.size + Fixtures.rejectLines.size).toLong)
  }

  test("all valid events land in silver with derived stage") {
    val rows = result.events
      .select("event_id", "event_type", "stage").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows.size == EventSchema.EventTypes.size)
    rows.foreach { case (_, t, stage) =>
      assert(stage == EventSchema.StageByEvent(t), s"stage for $t")
    }
  }

  test("each reject fixture hits exactly its reason code, first-match-wins") {
    val got = result.rejects
      .select("reject_reason").groupBy("reject_reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Fixtures.rejectLines.map(_._1).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected)
  }

  test("reject_stage classification matches the documented contract") {
    val got = result.rejects.select("reject_reason", "reject_stage")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    got.foreach { case (reason, stage) =>
      assert(stage == Silver.StageByReason(reason), s"stage for $reason")
    }
  }

  test("corrupt raw_json in bronze → JSON_PARSE_FAILED at parsing stage") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{current_timestamp, to_date, lit}
    val bronze = Seq("{{{ definitely not json").toDF("raw_json")
      .withColumn("ingest_id", lit("i1"))
      .withColumn("source", lit("test"))
      .withColumn("raw_schema_version", lit(1))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("p_ingest_date", to_date(current_timestamp()))
    val out = Silver.transform(bronze).rejects
      .select("reject_reason", "reject_stage").head()
    assert(out.getString(0) == "JSON_PARSE_FAILED" && out.getString(1) == "parsing")
  }

  test("producer stage preserved as metadata producerStage") {
    val m = result.events.filter(col("event_type") === "chapter_written")
      .select(element_at(col("metadata"), "producerStage")).head().getString(0)
    assert(m == "WRITE")
  }

  test("typed metric columns are cast from the string map") {
    val r = result.events.filter(col("event_type") === "scene_revised")
      .select("revision_count", "word_count").head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 900)
  }

  test("dedupe keeps the latest copy per event_id") {
    val dup1 = Fixtures.valid(id = "DUP", metrics = """{"wordCount": "1"}""")
    val dup2 = Fixtures.valid(id = "DUP", metrics = """{"wordCount": "2"}""")
    val p1 = Fixtures.writeNdjson(Seq(dup1))
    val p2 = Fixtures.writeNdjson(Seq(dup2))
    // two separate ingests → distinct ingested_at; union like an append log
    val b1 = Bronze.ingest(spark, Seq(p1))
    Thread.sleep(5)
    val b2 = Bronze.ingest(spark, Seq(p2))
    val out = Silver.transform(b1.unionByName(b2)).events
    assert(out.filter(col("event_id") === "DUP").count() == 1)
    // without dedupe both copies survive
    val raw = Silver.transform(b1.unionByName(b2), dedupe = false).events
    assert(raw.filter(col("event_id") === "DUP").count() == 2)
  }

  test("late-event boundary: >7 days before ingestion is late, recent is not") {
    val old = Fixtures.valid(id = "OLD", occurredAt = "2020-01-01T00:00:00Z")
    val fresh = Fixtures.valid(id = "FRESH",
      occurredAt = java.time.Instant.now().minusSeconds(3600).toString.replaceAll("\\.\\d+", ""))
    val out = Silver.transform(
      Bronze.ingest(spark, Seq(Fixtures.writeNdjson(Seq(old, fresh))))).events
    val flags = out.select("event_id", "is_late_event").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(flags("OLD") && !flags("FRESH"))
  }

  test("field-based event hash is stable and field-sensitive") {
    val a = Fixtures.valid(id = "H1", metrics = """{"wordCount": "10"}""")
    val b = Fixtures.valid(id = "H2", metrics = """{"wordCount": "11"}""")
    val out = Silver.transform(
      Bronze.ingest(spark, Seq(Fixtures.writeNdjson(Seq(a, b))))).events
    val hashes = out.select("event_hash").collect().map(_.getString(0))
    assert(hashes.distinct.length == 2)
    assert(hashes.forall(_.matches("[0-9a-f]{64}")))
  }
}
