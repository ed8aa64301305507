package graft.creatorops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** Seeded synthetic event generator — the Scala/Spark port of the
  * reference's `data_generator/generator.py` (event types :48-59, stage map
  * :61-72, persona knobs :74-87, story flow :153-331, run loop :333-411).
  *
  * WHAT is preserved: the ten event types, the stage-by-event mapping, the
  * persona knob set (cadence / revisions / publishing / engagement with the
  * same defaults as generator.py:101-125), the story lifecycle shape
  * (draft → chapters → per-scene revision loops → beta → submission →
  * 1-4 editor comments → schedule → release → engagement-decay loop with
  * rising dropoff), the deterministic decay curves (generator.py:142-151),
  * the evening-biased event times (:135-140), the ulid-like event ids
  * (:37-42), and hive-partitioned NDJSON output by event date (:395-411).
  *
  * HOW differs deliberately — the reference materializes every event in
  * driver memory under ONE shared RNG (generator.py:354-393), which caps the
  * run at driver heap and makes the byte stream depend on loop order. Here
  * generation is a distributed Dataset pipeline: tenants → authors → stories
  * fan out via flatMap with a SplitMix64-derived RNG seeded per entity
  * (seed ⊕ entity id), so any partitioning of the story space yields the
  * same events, and volume scales with executors, not the driver. Same
  * distributions, reproducible under distribution — the property the
  * single-RNG design cannot give.
  *
  * `corruptionRate` is an extension (the reference emits only valid lines):
  * it deterministically swaps in malformed events drawn round-robin from the
  * silver reject-code catalogue, so pipeline tests can assert the reject
  * split on generated volume.
  */
object Generator {

  /** Persona knobs, defaults = generator.py:101-125 parse defaults. */
  final case class Persona(
      name: String,
      weight: Double,
      activeDaysPerWeek: (Int, Int) = (3, 5),
      wordsPerActiveDay: (Int, Int) = (600, 1200),
      burstProbability: Double = 0.0,
      avgRevisionsPerScene: (Int, Int) = (0, 2),
      revisionBursts: String = "low",
      daysDraftToRelease: (Int, Int) = (20, 45),
      schedulingBufferDays: (Int, Int) = (2, 10),
      initialScoreRange: (Int, Int) = (50, 80),
      decayCurve: String = "medium",
      dropoutProbability: Double = 0.0)

  /** Built-in persona set spanning the knob space (profiles.yml is not
    * committed in the reference — these are this library's defaults, with
    * weights summing to 1). */
  val DefaultPersonas: Seq[Persona] = Seq(
    Persona("steady", 0.4),
    Persona("binge_writer", 0.25, wordsPerActiveDay = (900, 2200),
      burstProbability = 0.45, revisionBursts = "medium",
      daysDraftToRelease = (12, 30), initialScoreRange = (55, 90),
      decayCurve = "fast"),
    Persona("meticulous_reviser", 0.2, avgRevisionsPerScene = (2, 5),
      revisionBursts = "high", daysDraftToRelease = (35, 70),
      initialScoreRange = (60, 95), decayCurve = "slow"),
    Persona("ghost", 0.15, wordsPerActiveDay = (200, 700),
      dropoutProbability = 0.55, decayCurve = "fast"))

  /** @param endDay last timeline day (reference uses "today"; explicit here
    *               so runs are reproducible). */
  final case class Config(
      seed: Long = 22L,
      tenants: Int = 3,
      timelineDays: Int = 120,
      authorsPerTenant: (Int, Int) = (2, 4),
      storiesPerAuthor: (Int, Int) = (1, 3),
      personas: Seq[Persona] = DefaultPersonas,
      endDay: LocalDate = LocalDate.parse("2026-06-30"),
      targetTotalEvents: Option[Long] = None,
      corruptionRate: Double = 0.0)

  // --------------------------------------------------------------------------
  // deterministic per-entity RNG
  // --------------------------------------------------------------------------
  /** SplitMix64 finalizer — disperses (seed, entity-id) into an independent
    * RNG seed so sibling entities are decorrelated. */
  private def mix(seed: Long, parts: String): Long = {
    var z = seed ^ parts.foldLeft(1125899906842597L)((h, c) => 31 * h + c)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def rngFor(seed: Long, parts: String) = new java.util.Random(mix(seed, parts))

  private def randint(r: java.util.Random, lo: Int, hi: Int): Int =
    lo + (if (hi > lo) r.nextInt(hi - lo + 1) else 0)
  private def randint(r: java.util.Random, range: (Int, Int)): Int =
    randint(r, range._1, range._2)
  private def choice[T](r: java.util.Random, xs: Seq[T]): T = xs(r.nextInt(xs.size))
  private def clamp(x: Double, lo: Double, hi: Double) = math.max(lo, math.min(hi, x))

  private def weightedChoice(r: java.util.Random, items: Seq[(String, Double)]): String = {
    val total = items.map(_._2).sum
    val t = r.nextDouble() * total
    var upto = 0.0
    for ((k, w) <- items) { upto += w; if (upto >= t) return k }
    items.last._1
  }

  // evening-biased writing hours (generator.py:135-140)
  private val Hours = Seq(7, 8, 9, 18, 19, 20, 21, 22, 23)

  /** deterministic decay curves (generator.py:142-151) */
  def decayMultiplier(curve: String, dayOffset: Int): Double = curve match {
    case "slow" => math.max(0.25, 1.0 - 0.02 * dayOffset)
    case "fast" => math.max(0.10, 1.0 - 0.08 * dayOffset)
    case "none" => 0.0
    case _      => math.max(0.15, 1.0 - 0.05 * dayOffset)
  }

  // --------------------------------------------------------------------------
  // event record (matches EventSchema.Parse; null metrics keys omitted)
  // --------------------------------------------------------------------------
  final case class Tenant(tenantId: String, authorId: String, plan: String)
  final case class Entity(seriesId: String, storyId: String,
      chapterId: Option[String], sceneId: Option[String])
  final case class Producer(service: String, env: String, region: String, traceId: String)
  final case class Event(
      eventId: String, eventType: String, eventVersion: Int, occurredAt: String,
      stage: String, tenant: Tenant, entity: Entity, producer: Producer,
      metrics: Map[String, String], metadata: Map[String, String])

  private[creatorops] final case class StoryTask(
      tenantId: String, authorId: String, plan: String, seriesId: String,
      storyId: String, personaName: String)

  // --------------------------------------------------------------------------
  // story flow (generator.py:153-331)
  // --------------------------------------------------------------------------
  private val RevisionReasons = Seq("pacing", "clarity", "continuity", "tone", "length")
  private val BetaSources = Seq("beta_circle", "critique_partner", "forum")
  private val Sentiments = Seq("positive", "mixed", "negative")
  private val CommentTypes = Seq("line_edit", "structural", "copy_edit", "query")
  private val Severities = Seq("low", "medium", "high")

  private def isoAt(d: LocalDate, r: java.util.Random): String = {
    val h = choice(r, Hours)
    f"${d}T$h%02d:${r.nextInt(60)}%02d:${r.nextInt(60)}%02dZ"
  }
  private def ulidLike(iso: String, r: java.util.Random): String = {
    val ts = iso.replaceAll("[-T:Z]", "")
    val hex = "0123456789ABCDEF"
    ts + Array.fill(16)(hex(r.nextInt(16))).mkString
  }
  private def randDate(r: java.util.Random, start: LocalDate, end: LocalDate): LocalDate = {
    val delta = math.max(java.time.temporal.ChronoUnit.DAYS.between(start, end).toInt, 0)
    start.plusDays(randint(r, 0, delta))
  }

  /** All events of one story — pure function of (config seed, story id). */
  private[creatorops] def storyFlow(
      task: StoryTask, persona: Persona, startDay: LocalDate, endDay: LocalDate,
      seed: Long): Seq[Event] = {
    val r = rngFor(seed, s"story:${task.storyId}")
    val buf = scala.collection.mutable.ArrayBuffer.empty[Event]

    def emit(eventType: String, day: LocalDate, chapterId: Option[String] = None,
        sceneId: Option[String] = None, metrics: Map[String, String] = Map.empty,
        metadata: Map[String, String] = Map.empty): Unit = {
      val at = isoAt(day, r)
      buf += Event(
        eventId = ulidLike(at, r),
        eventType = eventType, eventVersion = 1, occurredAt = at,
        stage = EventSchema.StageByEvent(eventType),
        tenant = Tenant(task.tenantId, task.authorId, task.plan),
        entity = Entity(task.seriesId, task.storyId, chapterId, sceneId),
        producer = Producer("graft-sim", "dev", "local", java.util.UUID.nameUUIDFromBytes(
          s"${task.storyId}:${buf.size}".getBytes("UTF-8")).toString),
        metrics = metrics,
        metadata = metadata + ("persona" -> persona.name))
    }

    val draftDay = randDate(r, startDay, endDay)
    emit("draft_created", draftDay, metadata = Map(
      "draftTool" -> choice(r, Seq("scrivener", "docs", "notion")),
      "draftMode" -> choice(r, Seq("outline", "discovery", "hybrid"))))

    val abandoned = r.nextDouble() < persona.dropoutProbability
    if (abandoned) {
      // some writing/revision activity, then silence (generator.py:201-229)
      val endActive = Seq(endDay, draftDay.plusDays(randint(r, 1, 3) * 7L))
        .min(Ordering.by((d: LocalDate) => d.toEpochDay))
      for (ch <- 1 to randint(r, 1, 3)) {
        val chId = f"ch_$ch%02d"
        val writeDay = randDate(r, draftDay, endActive)
        val words = randint(r, persona.wordsPerActiveDay)
        emit("chapter_written", writeDay, chapterId = Some(chId),
          metrics = Map("wordCount" -> words.toString))
        val sceneRevs = randint(r, persona.avgRevisionsPerScene)
        for (s <- 1 to randint(r, 1, 4); rev <- 1 to sceneRevs)
          emit("scene_revised", randDate(r, writeDay, endActive),
            chapterId = Some(chId), sceneId = Some(f"sc_$s%02d"),
            metrics = Map(
              "revisionCount" -> rev.toString,
              "wordCount" -> math.max(0, words + randint(r, -200, 300)).toString),
            metadata = Map("revisionReason" -> choice(r, RevisionReasons)))
      }
      return buf.toSeq
    }

    val releaseDay = Seq(endDay, draftDay.plusDays(randint(r, persona.daysDraftToRelease).toLong))
      .min(Ordering.by((d: LocalDate) => d.toEpochDay))
    val scheduledDay = Seq(draftDay,
        releaseDay.minusDays(randint(r, persona.schedulingBufferDays).toLong))
      .max(Ordering.by((d: LocalDate) => d.toEpochDay))

    for (ch <- 1 to randint(r, 3, 12)) {
      val chId = f"ch_$ch%02d"
      val writeDay = randDate(r, draftDay, scheduledDay)
      var words = randint(r, persona.wordsPerActiveDay)
      if (r.nextDouble() < persona.burstProbability)
        words = (words * (1.4 + r.nextDouble() * 0.9)).toInt
      emit("chapter_written", writeDay, chapterId = Some(chId),
        metrics = Map("wordCount" -> words.toString))

      val baseRevs = randint(r, persona.avgRevisionsPerScene)
      for (s <- 1 to randint(r, 1, 5)) {
        var revs = baseRevs
        if (persona.revisionBursts == "high" && r.nextDouble() < 0.35)
          revs += randint(r, 2, 6)
        else if (persona.revisionBursts == "medium" && r.nextDouble() < 0.25)
          revs += randint(r, 1, 3)
        for (rev <- 1 to revs)
          emit("scene_revised", randDate(r, writeDay, scheduledDay),
            chapterId = Some(chId), sceneId = Some(f"sc_$s%02d"),
            metrics = Map(
              "revisionCount" -> rev.toString,
              "wordCount" -> math.max(0, words + randint(r, -300, 500)).toString),
            metadata = Map("revisionReason" -> choice(r, RevisionReasons)))
      }
    }

    // clamp: when draftDay is within 3 days of scheduledDay the naive lower
    // bound would exceed the upper one and events could leak past endDay
    val betaLo = Seq(draftDay.plusDays(3), scheduledDay)
      .min(Ordering.by((d: LocalDate) => d.toEpochDay))
    val betaDay = randDate(r, betaLo, scheduledDay)
    emit("beta_feedback_received", betaDay, metadata = Map(
      "source" -> choice(r, BetaSources), "sentiment" -> choice(r, Sentiments)))
    val submissionDay = randDate(r, betaDay, scheduledDay)
    emit("submission_sent", submissionDay,
      metadata = Map("channel" -> choice(r, Seq("agent", "direct", "platform"))))
    for (_ <- 1 to randint(r, 1, 4))
      emit("editor_comment", randDate(r, submissionDay, scheduledDay), metadata = Map(
        "commentType" -> choice(r, CommentTypes), "severity" -> choice(r, Severities)))
    emit("publish_scheduled", scheduledDay,
      metadata = Map("releaseChannel" -> choice(r, Seq("serial", "full_drop"))))
    emit("publish_released", releaseDay, metadata = Map(
      "storefront" -> choice(r, Seq("galatea_like", "kindle_like", "web_serial"))))

    // engagement decay with rising dropoff (generator.py:302-329)
    val baseScore = randint(r, persona.initialScoreRange).toDouble
    val horizon = randint(r, 10, 28)
    var offset = 0
    var stop = false
    while (offset < horizon && !stop) {
      val d = releaseDay.plusDays(offset.toLong)
      if (d.isAfter(endDay)) stop = true
      else {
        val mult = decayMultiplier(persona.decayCurve, offset)
        val score = baseScore * mult
        if (score > 0) {
          emit("reader_engagement", d,
            metrics = Map("engagementScore" ->
              f"${clamp(score + (r.nextDouble() * 10 - 5), 0, 100)}%.2f"),
            metadata = Map(
              "surface" -> choice(r, Seq("feed", "search", "recommendation")),
              "device" -> choice(r, Seq("mobile", "web"))))
          val dropProb = clamp(0.05 + (1.0 - mult) * 0.6, 0.05, 0.70)
          if (r.nextDouble() < dropProb)
            emit("reader_dropoff", d,
              metrics = Map("engagementScore" ->
                f"${clamp(score + (r.nextDouble() * 12 - 10), 0, 100)}%.2f"),
              metadata = Map("reason" ->
                choice(r, Seq("pacing", "tone", "lost_interest", "life_interrupt"))))
        }
        offset += 1
      }
    }
    buf.toSeq
  }

  // --------------------------------------------------------------------------
  // distributed run loop (generator.py:333-393, re-expressed as Dataset ops)
  // --------------------------------------------------------------------------
  /** Generated events as a typed Dataset. Narrow fan-out: tenants →
    * authors → stories → events via flatMap; no shuffle until the caller
    * writes (and then only the writer's partitioning). */
  def events(spark: SparkSession, cfg: Config): Dataset[Event] = {
    import spark.implicits._
    val startDay = cfg.endDay.minusDays(cfg.timelineDays.toLong)
    val weights = cfg.personas.map(p => p.name -> p.weight)
    val byName = cfg.personas.map(p => p.name -> p).toMap
    val stories: Dataset[StoryTask] = spark.range(1, cfg.tenants + 1L)
      .as[Long]
      .flatMap { t =>
        val tid = f"tnt_$t%03d"
        val tr = rngFor(cfg.seed, s"tenant:$tid")
        val plan = if (tr.nextDouble() < 0.25) "pro" else "free"
        (1 to randint(tr, cfg.authorsPerTenant)).flatMap { a =>
          val aid = f"auth_$t%03d_$a%03d"
          val ar = rngFor(cfg.seed, s"author:$aid")
          val persona = weightedChoice(ar, weights)
          (1 to randint(ar, cfg.storiesPerAuthor)).map { s =>
            StoryTask(tid, aid, plan, f"ser_$t%03d_$a%03d",
              f"sto_$t%03d_$a%03d_$s%02d", persona)
          }
        }
      }
      // one story's flow is one task's work; spread stories across cores
      .repartition(spark.sparkContext.defaultParallelism)
    val all = stories.flatMap(t =>
      storyFlow(t, byName(t.personaName), startDay, cfg.endDay, cfg.seed))
    // deterministic downsample to ~target (reference shuffles + truncates,
    // generator.py:390-393 — order-dependent; a per-event hash keep-filter
    // is the distribution-preserving distributed equivalent). Cache before
    // the sizing count so the generation fan-out runs once, not once per
    // downstream action.
    val sampled = cfg.targetTotalEvents match {
      case Some(target) =>
        all.cache()
        val total = all.count()
        if (total <= target) all
        else {
          val keep = target.toDouble / total
          all.filter(e => (mix(cfg.seed, s"keep:${e.eventId}") >>> 11).toDouble
            / (1L << 53).toDouble < keep)
        }
      case None => all
    }
    if (cfg.corruptionRate > 0) sampled.map { e =>
      val h = (mix(cfg.seed, s"corrupt:${e.eventId}") >>> 11).toDouble / (1L << 53).toDouble
      if (h < cfg.corruptionRate) corrupt(e) else e
    } else sampled
  }

  /** Deterministically malform an event, round-robin over reject causes the
    * silver classifier must catch (extension; see class doc). */
  private def corrupt(e: Event): Event = {
    val k = math.abs(mix(17, s"kind:${e.eventId}") % 5).toInt
    k match {
      case 0 => e.copy(eventId = null)                                  // MISSING_EVENT_ID
      case 1 => e.copy(eventType = "bogus_type")                        // INVALID_EVENT_TYPE
      case 2 => e.copy(occurredAt = "not-a-time")                       // INVALID_OCCURRED_AT
      case 3 => e.copy(tenant = e.tenant.copy(tenantId = null))         // MISSING_TENANT_ID
      case _ => e.copy(stage = "NOT_A_STAGE")                           // INVALID_STAGE
    }
  }

  /** Raw-line view (one JSON object per row, column `value`) — the exact
    * shape Bronze.ingest reads from NDJSON files. */
  def eventsJson(spark: SparkSession, cfg: Config): DataFrame =
    events(spark, cfg).toDF()
      .select(to_json(struct(col("*"))).as("value"))

  /** Write the generator-side layout: hive-partitioned NDJSON by event date
    * (generator.py:395-411) via the shared TableIO writer. */
  def writeNdjson(spark: SparkSession, cfg: Config, path: String): Long = {
    val ev = events(spark, cfg).toDF()
      .withColumn("p_event_date", substring(col("occurredAt"), 1, 10))
      .cache()  // one generation pass feeds both the write and the count
    try {
      graft.sources.TableIO.writeNdjson(ev, path, Seq("p_event_date"))
      ev.count()
    } finally ev.unpersist()
  }
}
