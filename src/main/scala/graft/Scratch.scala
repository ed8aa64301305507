package graft
import org.apache.spark.sql.SparkSession
import graft.operators.NearDup
import graft.sources.Tables

/** Dev scratchpad: piecewise stage timings for the minhash pipeline. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.storage.memoryMapThreshold", "2g")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    if (sfDir == "ndjson-demo") {
      // drive TableIO.writeNdjson through the public API; an external
      // consumer (DuckDB, wc -l) validates the layout
      val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select(org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("ts")).as("p_event_date"))
      graft.sources.TableIO.writeNdjson(ev, "/tmp/ndjson-demo", Seq("p_event_date"))
      println("[scratch] ndjson written to /tmp/ndjson-demo rows=" + ev.count())
      spark.stop()
      return
    }
    if (sfDir == "streaming-demo") {
      // drive the streaming silver→velocity path from the CLI: feed NDJSON
      // files into a file-source stream, print the windowed aggregate
      val dir = java.nio.file.Files.createTempDirectory("stream-demo").toString
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b0.ndjson"),
        Seq(
          """{"eventId": "S1", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t1", "authorId": "a1"}, "entity": {"storyId": "s1"}, "metrics": {"wordCount": "100"}}""",
          """{"eventId": "S2", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-15T11:00:00Z", "tenant": {"tenantId": "t1", "authorId": "a1"}, "entity": {"storyId": "s1"}, "metrics": {"wordCount": "200"}}""",
          """{"eventId": "S3", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-16T09:00:00Z", "tenant": {"tenantId": "t1", "authorId": "a1"}, "entity": {"storyId": "s1"}, "metrics": {"wordCount": "50"}}""",
          """garbage line""").mkString("\n").getBytes("UTF-8"))
      val agg = graft.streaming.StreamingSilver.velocity(
        graft.streaming.StreamingSilver.silverStream(spark.readStream.text(dir)))
      val q = agg.writeStream.format("memory").queryName("demo")
        .outputMode("complete").start()
      q.processAllAvailable()
      // late batch: second file appears while the query runs
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b1.ndjson"),
        Seq("""{"eventId": "S4", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-15T23:00:00Z", "tenant": {"tenantId": "t1", "authorId": "a1"}, "entity": {"storyId": "s1"}, "metrics": {"wordCount": "7"}}""")
          .mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
      q.stop()
      spark.table("demo").orderBy("window_start").show(false)
      spark.stop()
      return
    }
    for (_ <- 1 to 2) {
      val docs = Tables.documents(spark, sfDir)
      val sh = NearDup.shingles(docs)
      time("shingles.count")(println(sh.count()))
      val sig = NearDup.signatures(sh)
      time("signatures.count")(println(sig.count()))
      val bands = NearDup.bandKeys(sig)
      time("bands.count")(println(bands.count()))
      val cand = NearDup.lshCandidates(bands)
      time("cand.count")(println(cand.count()))
      time("full")(NearDup.minhashLsh(spark, sfDir).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
