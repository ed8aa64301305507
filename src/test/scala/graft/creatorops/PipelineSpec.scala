package graft.creatorops

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("medallion pipeline end-to-end: bronze → silver(+rejects) → 6 gold tables") {
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
    assert(counts.postRelease == 1L) // the one engagement event after release

    // partition layout: silver events are hive-partitioned by event date
    val silverDir = new java.io.File(s"$root/silver_events")
    assert(silverDir.listFiles().exists(_.getName.startsWith("p_event_date=")))
  }

  test("atomic overwrite: a mid-write failure leaves the previous table intact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.sources.TableIO
    val root = java.nio.file.Files.createTempDirectory("atomic").toString
    val path = s"$root/t"
    TableIO.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    assert(new java.io.File(path, TableIO.ManifestFile).exists(),
      "committed table carries the commit manifest")
    assert(TableIO.read(spark, path).count() == 2)

    // a task that fails mid-job: the stage write dies, the swap never runs
    val bad = Seq(1, 2, 3).toDF("id")
      .withColumn("v", when(col("id") > 1, raise_error(lit("boom"))).otherwise(lit("x")))
    intercept[Exception] { TableIO.write(bad, path) }

    val after = TableIO.read(spark, path).orderBy("id").collect()
    assert(after.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "b")),
      "failed overwrite must not disturb the previous table version")
  }

  test("an empty partitioned table round-trips via the manifest schema") {
    import spark.implicits._
    import graft.sources.TableIO
    val path = java.nio.file.Files.createTempDirectory("empty").toString + "/t"
    val empty = Seq((1, "a", java.sql.Date.valueOf("2026-01-15")))
      .toDF("id", "v", "d").filter($"id" < 0)
    TableIO.write(empty, path, partitionBy = Seq("d"))
    val back = TableIO.read(spark, path)
    assert(back.count() == 0)
    assert(back.columns.toSeq == Seq("id", "v", "d"))
  }

  test("incremental silver runs compose: per-batch windows equal one full run; backfill heals late data") {
    import org.apache.spark.sql.functions._
    import graft.sources.TableIO
    val wh = Pipeline.Warehouse(java.nio.file.Files.createTempDirectory("whinc").toString)
    // end-of-day ingest stamp: the day's events (occurred_at up to 23:00)
    // must not trip the future-timestamp guard (occurred_at <= ingested_at)
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 23:30:00")

    // batch 1: day-15 events, ingested on the 15th; batch 2: day-16 events,
    // ingested on the 16th (the runbook's partition-aware daily run shape)
    val b1 = Fixtures.validPerType // all occurredAt 2026-01-15
    val b2 = Seq(
      Fixtures.valid(id = "D2a", occurredAt = "2026-01-16T09:00:00Z"),
      Fixtures.valid(id = "D2b", eventType = "scene_revised", stage = "REVISE",
        occurredAt = "2026-01-16T10:00:00Z",
        metrics = """{"revisionCount": "2", "wordCount": "800"}"""))
    for ((lines, day) <- Seq(b1 -> "2026-01-15", b2 -> "2026-01-16"))
      TableIO.write(
        Bronze.ingest(spark, Seq(Fixtures.writeNdjson(lines)), ingestedAt = Some(ts(day))),
        wh.bronze, org.apache.spark.sql.SaveMode.Append, partitionBy = Seq("p_ingest_date"))

    // full-run expectation over all of bronze
    val expected = Silver.transform(TableIO.read(spark, wh.bronze)).events
      .select("event_id", "p_event_date").collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSet

    Pipeline.runSilverRange(spark, wh.root, "2026-01-15", "2026-01-15")
    Pipeline.runSilverRange(spark, wh.root, "2026-01-16", "2026-01-16")
    def silverNow() = TableIO.read(spark, wh.silverEvents)
      .select("event_id", "p_event_date").collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(silverNow() == expected, "sequential daily windows == one full run")

    // late-arriving day-15 event lands in a day-17 ingest batch; the ROUTINE
    // DAILY window must be safe on its own: the touched day-15 partition's
    // existing rows are merged back in (keep-latest by ingested_at), so the
    // dynamic overwrite cannot wipe earlier history
    val late = Seq(Fixtures.valid(id = "LATE15", occurredAt = "2026-01-15T23:00:00Z"))
    TableIO.write(
      Bronze.ingest(spark, Seq(Fixtures.writeNdjson(late)), ingestedAt = Some(ts("2026-01-17"))),
      wh.bronze, org.apache.spark.sql.SaveMode.Append, partitionBy = Seq("p_ingest_date"))
    Pipeline.runSilverRange(spark, wh.root, "2026-01-17", "2026-01-17")
    assert(silverNow() == expected + (("LATE15", "2026-01-15")),
      "a daily window merges late data into the partition without losing history")
    // re-running the same window (and the full backfill) is idempotent
    Pipeline.runSilverRange(spark, wh.root, "2026-01-17", "2026-01-17")
    Pipeline.runSilverRange(spark, wh.root, "2026-01-15", "2026-01-17")
    assert(silverNow() == expected + (("LATE15", "2026-01-15")), "idempotent re-runs")

    // untouched-partition proof: day-16 parquet files not rewritten by a
    // window that doesn't cover day 16 would be ideal, but the backfill
    // window above does; instead assert the bronze scan is partition-pruned
    val pruned = TableIO.read(spark, wh.bronze)
      .filter(col("p_ingest_date") === to_date(lit("2026-01-15")))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("p_ingest_date"), scan)
  }

  test("incremental gold refresh equals full recompute on the refreshed window") {
    import org.apache.spark.sql.functions._
    import graft.sources.TableIO
    val wh = Pipeline.Warehouse(java.nio.file.Files.createTempDirectory("whgold").toString)
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 23:30:00")
    def ingest(lines: Seq[String], day: String): Unit = TableIO.write(
      Bronze.ingest(spark, Seq(Fixtures.writeNdjson(lines)), ingestedAt = Some(ts(day))),
      wh.bronze, org.apache.spark.sql.SaveMode.Append, partitionBy = Seq("p_ingest_date"))

    // day-15 history through the full pipeline, then a day-16 batch arrives
    ingest(Fixtures.validPerType, "2026-01-15")
    Pipeline.runSilverRange(spark, wh.root, "2026-01-15", "2026-01-15")
    Pipeline.runGoldRange(spark, wh.root, "2026-01-15", "2026-01-15")
    ingest(Seq(
      Fixtures.valid(id = "G1", occurredAt = "2026-01-16T09:00:00Z"),
      Fixtures.valid(id = "G2", eventType = "reader_engagement", stage = "ENGAGEMENT",
        occurredAt = "2026-01-16T10:00:00Z", metrics = """{"engagementScore": "42.5"}"""),
      Fixtures.valid(id = "G3", eventType = "reader_dropoff", stage = "ENGAGEMENT",
        occurredAt = "2026-01-16T11:00:00Z", metrics = """{"engagementScore": "12.0"}""")),
      "2026-01-16")
    Pipeline.runSilverRange(spark, wh.root, "2026-01-16", "2026-01-16")
    Pipeline.runGoldRange(spark, wh.root, "2026-01-16", "2026-01-16")

    // every gold table must now equal a from-scratch recompute over silver
    val ev = TableIO.read(spark, wh.silverEvents)
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val cols = df.columns.sorted.map { c =>
        if (df.schema(c).dataType == org.apache.spark.sql.types.DoubleType)
          round(col(c), 6).cast("string") else col(c).cast("string")
      }
      df.select(concat_ws("|", cols: _*)).collect().map(_.getString(0)).toSet
    }
    assert(canon(TableIO.read(spark, wh.velocity)) == canon(Gold.writingVelocity(ev)))
    assert(canon(TableIO.read(spark, wh.churn)) == canon(Gold.revisionChurn(ev)))
    assert(canon(TableIO.read(spark, wh.engagementBands)) == canon(Gold.engagementBands(ev)))
    assert(canon(TableIO.read(spark, wh.dropoff)) == canon(Gold.dropoffRate(ev)))
    assert(canon(TableIO.read(spark, wh.bottlenecks)) == canon(Gold.stageBottlenecks(ev)))
    assert(canon(TableIO.read(spark, wh.postRelease)) == canon(Gold.postReleaseEngagement(ev)))

    // the refresh's silver scan is partition-pruned on p_event_date
    val p = ev.filter(col("p_event_date") === to_date(lit("2026-01-16")))
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("p_event_date"), p)
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
