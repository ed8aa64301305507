package graft.creatorops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.TableIO

class GeneratorSpec extends SparkSpec {

  private val cfg = Generator.Config(seed = 22L, tenants = 3)

  test("generator is seed-deterministic and partitioning-independent") {
    val a = Generator.events(spark, cfg).collect().sortBy(_.eventId)
    val b = Generator.events(spark, cfg).collect().sortBy(_.eventId)
    assert(a.toSeq == b.toSeq, "same seed must reproduce the same events")
    val c = Generator.events(spark, cfg.copy(seed = 23L)).collect().sortBy(_.eventId)
    assert(a.toSeq != c.toSeq, "different seed must differ")
  }

  test("generated flows honor the story lifecycle contract") {
    val ev = Generator.events(spark, cfg).cache()
    val types = ev.select("eventType").distinct().collect().map(_.getString(0)).toSet
    assert(types.subsetOf(EventSchema.EventTypes.toSet))
    assert(types.contains("chapter_written") && types.contains("reader_engagement"))

    // every story has exactly one draft_created, and released stories have
    // exactly one publish_scheduled + one publish_released
    import spark.implicits._
    val perStory = ev.groupBy($"entity.storyId")
      .agg(
        sum(when($"eventType" === "draft_created", 1).otherwise(0)).as("drafts"),
        sum(when($"eventType" === "publish_released", 1).otherwise(0)).as("released"),
        sum(when($"eventType" === "publish_scheduled", 1).otherwise(0)).as("scheduled"))
      .collect()
    assert(perStory.forall(_.getLong(1) == 1L), "one draft per story")
    assert(perStory.forall(r => r.getLong(2) == r.getLong(3)),
      "scheduled and released come in pairs")
    assert(perStory.exists(_.getLong(2) == 1L), "some stories reach release")
    assert(perStory.exists(_.getLong(2) == 0L), "ghost personas abandon some stories")

    // engagement scores respect the clamp
    val scores = ev.filter($"eventType".startsWith("reader_"))
      .select($"metrics"("engagementScore").cast("double")).collect().map(_.getDouble(0))
    assert(scores.nonEmpty && scores.forall(s => s >= 0.0 && s <= 100.0))
    ev.unpersist()
  }

  test("full pipeline over generated volume: valid events all land, rejects split by code") {
    val out = java.nio.file.Files.createTempDirectory("gen-ndjson").toString
    val n = Generator.writeNdjson(spark, cfg.copy(corruptionRate = 0.1), out)
    assert(n > 300, s"expected real volume, got $n")
    // hive layout on disk (generator.py:395-411)
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("p_event_date=")))

    val root = java.nio.file.Files.createTempDirectory("gen-wh").toString
    // glob the leaf files so partition discovery doesn't re-add p_event_date
    val counts = Pipeline.runAll(spark, Seq(s"$out/*/*.json"), root)
    assert(counts.bronze == n)
    assert(counts.silver + counts.rejects == counts.bronze,
      "validity split must partition the batch")
    assert(counts.rejects > 0, "corruption must produce rejects")
    assert(counts.silver > counts.rejects, "most of the batch is valid")
    assert(counts.velocity > 0 && counts.churn > 0 && counts.bands > 0)

    // reject-code distribution: exactly the codes the corruption injects,
    // each present, and nothing else
    val codes = TableIO.read(spark, s"$root/silver_rejects")
      .groupBy("reject_reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Set("MISSING_EVENT_ID", "INVALID_EVENT_TYPE",
      "INVALID_OCCURRED_AT", "MISSING_TENANT_ID", "INVALID_STAGE")
    assert(codes.keySet == expected, s"got $codes")
    assert(codes.values.forall(_ > 0))
  }
}
