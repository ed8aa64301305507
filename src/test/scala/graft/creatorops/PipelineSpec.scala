package graft.creatorops

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("medallion pipeline end-to-end: bronze → silver(+rejects) → 5 gold tables") {
    val events = Fixtures.writeNdjson(
      Fixtures.validPerType ++ Fixtures.rejectLines.map(_._2))
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    val counts = Pipeline.runAll(spark, Seq(events), root)

    assert(counts.bronze ==
      (Fixtures.validPerType.size + Fixtures.rejectLines.size).toLong)
    assert(counts.silver == Fixtures.validPerType.size.toLong)
    assert(counts.rejects == Fixtures.rejectLines.size.toLong)
    assert(counts.velocity == 1L)    // one chapter_written group
    assert(counts.churn == 1L)       // one scene_revised group
    assert(counts.bands == 1L)       // one engagement band group
    assert(counts.dropoff == 1L)     // one (day, tenant, story) key
    assert(counts.bottlenecks > 0L)

    // partition layout: silver events are hive-partitioned by event date
    val silverDir = new java.io.File(s"$root/silver_events")
    assert(silverDir.listFiles().exists(_.getName.startsWith("p_event_date=")))
  }

  test("hive-partitioned NDJSON roundtrip (generator-side layout, S5)") {
    import org.apache.spark.sql.functions.col
    val events = Fixtures.writeNdjson(Fixtures.validPerType)
    val silver = Silver.transform(Bronze.ingest(spark, Seq(events))).events
    val out = java.nio.file.Files.createTempDirectory("ndjson-out").toString
    graft.sources.TableIO.writeNdjson(
      silver.select(col("event_id"), col("event_type"), col("p_event_date")),
      out, Seq("p_event_date"))
    val dir = new java.io.File(out)
    assert(dir.listFiles().exists(_.getName.startsWith("p_event_date=")))
    val back = spark.read.json(s"$out/*/*.json")
    assert(back.count() == silver.count())
  }
}
