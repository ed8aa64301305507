package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.IntegerType

import graft.creatorops.{EventSchema, Silver}

/** Structured Streaming variant of the silver→velocity path — the faithful
  * streaming EXTENSION the reference documents but defers (batch-first by
  * design, README.md:112; late events are only flagged in batch,
  * transform_local.py:108-109). Here late data is handled properly with an
  * event-time watermark + tumbling window.
  *
  * The parse/validate logic is SHARED with the batch layer (same
  * Silver.parse, same reject predicate) — one contract, two execution modes.
  */
object StreamingSilver {

  /** Raw streaming lines (e.g. spark.readStream.text(dir) or a socket) →
    * validated, flattened silver stream. */
  def silverStream(rawLines: DataFrame, source: String = "stream"): DataFrame = {
    val bronzeShaped = rawLines
      .withColumnRenamed("value", "raw_json")
      .withColumn("ingest_id", lit("stream"))
      .withColumn("source", lit(source))
      .withColumn("raw_schema_version", lit(1))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("p_ingest_date", to_date(current_timestamp()))
    Silver.parse(bronzeShaped)
      .withColumn("reject_reason", Silver.rejectReason)
      .filter(col("reject_reason").isNull)
      .select(
        col("parsed.eventId").as("event_id"),
        col("parsed.eventType").as("event_type"),
        col("occurred_at"),
        col("parsed.tenant.tenantId").as("tenant_id"),
        col("parsed.tenant.authorId").as("author_id"),
        col("parsed.entity.storyId").as("story_id"),
        col("parsed.metrics").getItem("wordCount").try_cast(IntegerType).as("word_count"))
  }

  /** Event-time writing velocity: 1-day tumbling windows, late data beyond
    * the watermark dropped (the streaming analogue of the batch
    * `is_late_event` flag + daily gold aggregation). */
  def velocity(silver: DataFrame, watermark: String = "7 days"): DataFrame =
    silver
      .filter(col("event_type") === "chapter_written")
      .withWatermark("occurred_at", watermark)
      .groupBy(
        window(col("occurred_at"), "1 day").as("w"),
        col("tenant_id"), col("author_id"))
      .agg(
        count(lit(1)).as("chapters_written"),
        sum(col("word_count")).as("words_written"))
      .select(
        col("w.start").as("window_start"),
        col("tenant_id"), col("author_id"),
        col("chapters_written"), col("words_written"))

  /** Watermarked STREAM-STREAM interval join: each chapter_written event
    * joins the draft_created event of the same story when it lands within
    * `horizonDays` after the draft. Both sides carry watermarks and the
    * join condition bounds event time in BOTH directions, so Spark can
    * size the join state and expire it — the only stream-stream join
    * shape that is bounded-state (and therefore viable) on an unbounded
    * 100 TB/day stream; an unbounded-time join would accrete state
    * forever. Inner join: a chapter with no in-horizon draft drops. */
  def draftChapterJoin(silver: DataFrame, horizonDays: Int = 7,
      watermark: String = "7 days"): DataFrame = {
    val drafts = silver.filter(col("event_type") === "draft_created")
      .select(col("story_id"), col("event_id").as("draft_event_id"),
        col("occurred_at").as("draft_at"))
      .withWatermark("draft_at", watermark)
    val chapters = silver.filter(col("event_type") === "chapter_written")
      .select(col("story_id").as("ch_story"), col("event_id").as("chapter_event_id"),
        col("occurred_at").as("chapter_at"), col("word_count"))
      .withWatermark("chapter_at", watermark)
    drafts.join(chapters,
        col("story_id") === col("ch_story") &&
        col("chapter_at") >= col("draft_at") &&
        col("chapter_at") <= col("draft_at") + expr(s"INTERVAL $horizonDays DAYS"))
      .select(col("story_id"), col("draft_event_id"), col("chapter_event_id"),
        col("chapter_at"), col("word_count"))
  }

  /** Streaming dedup by event id within the watermark horizon — the
    * streaming analogue of the batch MERGE/keep-latest (Silver.transform):
    * replayed or duplicated events inside the watermark are dropped with
    * bounded state; events older than the watermark age out of the state
    * store instead of accumulating forever. */
  def dedupedStream(silver: DataFrame, watermark: String = "7 days"): DataFrame =
    silver
      .withWatermark("occurred_at", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream → versioned-table upsert sink: every micro-batch MERGEs into
    * the table by key via foreachBatch + [[graft.sources.VersionedTable]] —
    * the lakehouse streaming-ingest pattern (Delta's streaming MERGE),
    * with the log commit giving per-batch atomicity and each batch
    * boundary time-travelable as its own version.
    *
    * EXACTLY-ONCE: foreachBatch is at-least-once (a batch is re-delivered
    * after a restart before its checkpoint advances); passing
    * (appId, batchId) through the manifest txn map makes the replayed
    * commit a NO-OP — no duplicate version, no duplicate rows (Delta's
    * txnAppId/txnVersion idempotent-write idiom). `appId` must be stable
    * across restarts of the same logical stream (tie it to the checkpoint
    * location, not the run). Returns the started query; caller
    * awaits/stops it. */
  /** @param deleteWhere optional MERGE delete clause (see
    *                     [[graft.sources.VersionedTable.upsert]]): batch
    *                     rows satisfying it are CDC tombstones — their
    *                     keys are deleted instead of upserted, so the sink
    *                     applies a full insert/update/delete change stream
    *                     in one exactly-once commit per micro-batch. */
  def sinkToVersioned(
      silver: DataFrame,
      path: String,
      keys: Seq[String],
      latestBy: Option[String] = None,
      appId: String = "graft-silver-stream",
      checkpoint: Option[String] = None,
      deleteWhere: Option[org.apache.spark.sql.Column] = None,
      guardBy: Option[String] = None,
      dropCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = silver.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.sources.VersionedTable.upsert(batch.toDF(), path, keys,
            evolveSchema = false, latestBy = latestBy, statsCols = Nil,
            txn = Some(appId -> batchId), deleteWhere = deleteWhere,
            guardBy = guardBy, dropCols = dropCols): Unit
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  // --------------------------------------------------------------------------
  // STREAMING INCREMENTAL DEDUP — the operational form of
  // NearDup.incrementalDedup: a persisted MinHash BAND INDEX lives in a
  // versioned table, and every micro-batch dedups against ALL history by
  // probing it — corpus-internal pairs are never recomputed, which is what
  // makes continuous LSH dedup viable at 100 TB (the batch is ~1/1000 of
  // the corpus; the probe is one equi-join on (band, key); the index grows
  // only by the batch's survivors).
  //
  // Duplicate decision: signature-agreement estimate (matching minhash
  // components / NumHashes ≥ JaccardThreshold — the q_minhash_estimate
  // screen), computed entirely from the denormalized index row, so the
  // index stores (doc_id, band, key, mh0..mhN) and no shingle ever
  // persists. Intra-batch duplicates resolve first-occurrence-wins
  // (lower doc_id survives). Exactly-once: decisions commit BEFORE the
  // index append under per-table (appId, batchId) txn keys — a replay
  // after a crash between the two recomputes decisions against the
  // still-unchanged index and lands only the missing commit.
  // --------------------------------------------------------------------------

  def incrementalDedupSink(
      docs: DataFrame, // streaming (doc_id LONG, text STRING)
      indexPath: String,
      decisionsPath: String,
      appId: String = "graft-stream-dedup",
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          dedupMicroBatch(batch.toDF(), batchId, indexPath, decisionsPath, appId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  private[graft] def dedupMicroBatch(batch: DataFrame, batchId: Long,
      indexPath: String, decisionsPath: String, appId: String): Unit = {
    import graft.operators.NearDup
    import graft.sources.VersionedTable
    val spark = batch.sparkSession
    val mhCols = (0 until NearDup.NumHashes).map(i => s"mh$i")
    val sig = NearDup.signatures(NearDup.shingles(batch)).cache()
    // the index row: band key for the probe + the full signature for the
    // agreement estimate, so a probe hit answers without a second join
    val rows = NearDup.bandKeys(sig).join(sig, Seq("doc_id"))
    try {
      val existing: DataFrame =
        if (VersionedTable.latestVersion(spark, indexPath).isDefined)
          VersionedTable.read(spark, indexPath)
        else spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), rows.schema)
      def side(df: DataFrame): DataFrame = df.select(
        col("doc_id").as("c_doc") +: col("band") +: col("key") +:
          mhCols.map(c => col(c).as(s"c_$c")): _*)
      // history probe (self-pairs excluded: a replayed batch whose index
      // rows already landed must not match itself) + intra-batch
      // first-occurrence-wins probe
      val cand = rows.join(side(existing), Seq("band", "key"))
          .filter(col("c_doc") =!= col("doc_id"))
        .unionByName(rows.join(side(rows), Seq("band", "key"))
          .filter(col("c_doc") < col("doc_id")))
      val matches = mhCols.map(c =>
        when(col(c) === col(s"c_$c"), 1).otherwise(0)).reduce(_ + _)
      val scored = cand
        .select(col("doc_id"), col("c_doc"),
          (matches.cast("double") / NearDup.NumHashes).as("est"))
        .dropDuplicates("doc_id", "c_doc")
        .filter(col("est") >= NearDup.JaccardThreshold)
      val best = scored.groupBy(col("doc_id"))
        .agg(countDistinct(col("c_doc")).as("n_dups"),
          max(struct(col("est"), col("c_doc"))).as("m"))
      val decisions = batch.select(col("doc_id")).distinct()
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), lit(batchId).as("batch_id"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          col("m.c_doc").as("dup_of"),
          col("m.est").as("est_jaccard"),
          col("m").isNotNull.as("is_dup"))
      // decisions feed BOTH commits — persist so the candidate probe and
      // aggregation run once, not once per commit
      decisions.persist()
      try {
        // decisions FIRST (they are defined against the pre-append index),
        // index second — see the replay contract in the header
        VersionedTable.commitBatch(decisions, decisionsPath,
          s"$appId:decisions", batchId)
        val survivors = rows.join(
          decisions.filter(col("is_dup")).select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        VersionedTable.commitBatch(survivors, indexPath,
          s"$appId:index", batchId): Unit
      } finally decisions.unpersist(): Unit
    } finally sig.unpersist(): Unit
  }

  /** APPLY CHANGES INTO (the DLT CDC-apply idiom, composed from this
    * module's parts): apply a change stream carrying (keys…, `sequenceBy`,
    * `opCol`) into a versioned table with
    *  - intra-batch ordering: per key, the max-`sequenceBy` change wins
    *    the micro-batch (latestBy),
    *  - CROSS-batch out-of-order tolerance: a late change older than the
    *    stored row's sequence is ignored, never applied (guardBy — the
    *    property DLT adds over a plain streaming MERGE),
    *  - tombstones: rows whose `opCol` equals `deleteOp` delete their key
    *    (when not out-of-order) instead of upserting,
    *  - exactly-once: (appId, batchId) rides the manifest txn map, so a
    *    replayed micro-batch is a no-op commit. */
  def applyChangesInto(
      changes: DataFrame,
      path: String,
      keys: Seq[String],
      sequenceBy: String,
      opCol: String = "op",
      deleteOp: String = "delete",
      appId: String = "graft-apply-changes",
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    sinkToVersioned(changes, path, keys,
      latestBy = Some(sequenceBy), appId = appId, checkpoint = checkpoint,
      deleteWhere = Some(org.apache.spark.sql.functions.col(opCol) === deleteOp),
      guardBy = Some(sequenceBy),
      // the op marker is change-feed bookkeeping, not table data — DLT's
      // APPLY CHANGES excludes it from the target the same way
      dropCols = Seq(opCol))

  // --------------------------------------------------------------------------
  // Custom streaming state, NEW API: the same per-author running totals via
  // transformWithState (Spark 4's StatefulProcessor — the successor to
  // flatMapGroupsWithState, with named typed state cells, per-key timers
  // and TTL, backed by the RocksDB state store). Keeping BOTH variants
  // documents the migration path; StreamingSpec asserts they produce
  // identical totals on the same input.
  // --------------------------------------------------------------------------
  class AuthorTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, AuthorEvent, AuthorTotal] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var totals: ValueState[AuthorTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[AuthorTotal](
        "totals", org.apache.spark.sql.Encoders.product[AuthorTotal], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[AuthorEvent],
        timerValues: TimerValues): Iterator[AuthorTotal] = {
      var cur = if (totals.exists()) totals.get() else AuthorTotal(key, 0L, 0L)
      rows.foreach { e =>
        cur = AuthorTotal(key, cur.events + 1, cur.words + e.word_count.getOrElse(0))
      }
      totals.update(cur)
      Iterator.single(cur)
    }
  }

  /** Running per-author totals through the transformWithState API. Requires
    * the RocksDB state store provider (set by the caller/spec via
    * `spark.sql.streaming.stateStore.providerClass`) — the new API does not
    * run on the default HDFS-backed store. */
  def authorTotalsTws(silver: DataFrame): Dataset[AuthorTotal] = {
    import silver.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    silver
      .select(col("author_id"), col("word_count"))
      .as[AuthorEvent]
      .groupByKey(_.author_id)
      .transformWithState(new AuthorTotalsProcessor,
        TimeMode.None(), OutputMode.Update(), implicitly[org.apache.spark.sql.Encoder[AuthorTotal]])
  }

  // --------------------------------------------------------------------------
  // Custom streaming state: running per-author totals via
  // flatMapGroupsWithState (KeyValueGroupedDataset custom state API).
  // --------------------------------------------------------------------------
  final case class AuthorEvent(author_id: String, word_count: Option[Int])
  final case class AuthorTotal(author_id: String, events: Long, words: Long)

  def authorTotals(silver: DataFrame): Dataset[AuthorTotal] = {
    import silver.sparkSession.implicits._
    silver
      .select(col("author_id"), col("word_count"))
      .as[AuthorEvent]
      .groupByKey(_.author_id)
      .flatMapGroupsWithState[AuthorTotal, AuthorTotal](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (author: String, events: Iterator[AuthorEvent], state: GroupState[AuthorTotal]) =>
          val prev = state.getOption.getOrElse(AuthorTotal(author, 0L, 0L))
          var n = prev.events
          var w = prev.words
          events.foreach { e => n += 1; w += e.word_count.getOrElse(0).toLong }
          val next = AuthorTotal(author, n, w)
          state.update(next)
          Iterator(next)
      }
  }
}
