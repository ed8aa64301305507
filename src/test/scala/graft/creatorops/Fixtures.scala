package graft.creatorops

/** Hand-written NDJSON contract fixtures (FIXTURES.md §1/§4): one valid event
  * per type plus one malformed line per reject code, exercising the
  * first-match-wins classifier branch by branch.
  */
object Fixtures {

  def valid(
      id: String = "E1",
      eventType: String = "chapter_written",
      version: Int = 1,
      occurredAt: String = "2026-01-15T10:00:00Z",
      stage: String = "WRITE",
      tenantId: String = "tnt_001",
      authorId: String = "auth_001",
      storyId: String = "sto_001",
      metrics: String = """{"wordCount": "1000"}"""): String =
    s"""{"eventId": "$id", "eventType": "$eventType", "eventVersion": $version,
       | "occurredAt": "$occurredAt", "stage": "$stage",
       | "tenant": {"tenantId": "$tenantId", "authorId": "$authorId", "plan": "free"},
       | "entity": {"storyId": "$storyId", "seriesId": "ser_001", "chapterId": "ch_01", "sceneId": "sc_01"},
       | "producer": {"service": "sim", "env": "dev", "region": "r1", "traceId": "t-$id"},
       | "metrics": $metrics, "metadata": {"persona": "steady"}}""".stripMargin.replaceAll("\n", "")

  /** reject code → NDJSON line that must land on exactly that code.
    *
    * Note the corrupt-JSON line classifies as MISSING_EVENT_ID, not
    * JSON_PARSE_FAILED: bronze ingestion (reference ingest_local.py:39-46)
    * captures unparseable lines under `_corrupt_record` during schema
    * inference and re-serializes them as VALID json with null event fields.
    * JSON_PARSE_FAILED is reachable only when raw_json itself is corrupt
    * (bronze written by another producer) — covered by a dedicated spec. */
  val rejectLines: Seq[(String, String)] = Seq(
    "MISSING_EVENT_ID" -> """not json at all {{{""",
    "MISSING_EVENT_ID" ->
      """{"eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}}""",
    "MISSING_EVENT_TYPE" ->
      """{"eventId": "R2", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}}""",
    "INVALID_EVENT_TYPE" ->
      """{"eventId": "R3", "eventType": "bogus_type", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}}""",
    "MISSING_EVENT_VERSION" ->
      """{"eventId": "R4", "eventType": "chapter_written", "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}}""",
    "INVALID_EVENT_VERSION" ->
      """{"eventId": "R5", "eventType": "chapter_written", "eventVersion": 0, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}}""",
    "INVALID_OCCURRED_AT" ->
      """{"eventId": "R6", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "not-a-time", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}}""",
    "MISSING_TENANT_ID" ->
      """{"eventId": "R7", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"authorId": "a"}, "entity": {"storyId": "s"}}""",
    "MISSING_AUTHOR_ID" ->
      """{"eventId": "R8", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t"}, "entity": {"storyId": "s"}}""",
    "MISSING_STORY_ID" ->
      """{"eventId": "R9", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"seriesId": "ser"}}""",
    "INVALID_STAGE" ->
      """{"eventId": "R10", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "stage": "NOT_A_STAGE", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}}""",
    "INVALID_METRIC" ->
      """{"eventId": "R11", "eventType": "reader_engagement", "eventVersion": 1, "occurredAt": "2026-01-15T10:00:00Z", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}, "metrics": {"engagementScore": "150.5"}}""",
    "FUTURE_OCCURRED_AT" ->
      """{"eventId": "R12", "eventType": "chapter_written", "eventVersion": 1, "occurredAt": "2099-01-01T00:00:00Z", "tenant": {"tenantId": "t", "authorId": "a"}, "entity": {"storyId": "s"}}""",
  )

  def validPerType: Seq[String] =
    EventSchema.EventTypes.zipWithIndex.map { case (t, i) =>
      val metrics = t match {
        case "chapter_written" => """{"wordCount": "1000"}"""
        case "scene_revised" => """{"revisionCount": "3", "wordCount": "900"}"""
        case "reader_engagement" | "reader_dropoff" => """{"engagementScore": "61.25"}"""
        case _ => "{}"
      }
      valid(id = s"V$i", eventType = t, stage = EventSchema.StageByEvent(t),
        occurredAt = s"2026-01-15T1$i:00:00Z", metrics = metrics)
    }

  /** Write lines to a temp NDJSON file; returns the path. */
  def writeNdjson(lines: Seq[String]): String = {
    val f = java.io.File.createTempFile("events", ".ndjson")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.getAbsolutePath
  }
}
