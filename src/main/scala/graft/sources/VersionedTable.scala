package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned parquet table — the transaction-log-lite answer to the
  * reference's Delta features this environment has no jars for
  * (`sql/ddl/01_bronze.sql:18-26` ACID, time travel, change data feed;
  * deviation documented in SURVEY §1.3):
  *
  * layout
  * {{{
  *   <path>/d-1f3a9c2e/...parquet      immutable version data (token-named;
  *   <path>/d-8b02d4f7/...parquet       referenced only via the log)
  *   <path>/_graft_log/00000001.json   commit manifests (the log):
  *                                     {"version":1,"dir":"d-1f3a9c2e","schema":{...}}
  * }}}
  *
  * The COMMIT POINT is the atomic create-if-absent of the version's manifest
  * in `_graft_log/` — data directories are written first and are
  * unreferenced until their manifest lands, so a writer dying at ANY point
  * leaves every previously-committed version readable and never exposes a
  * partial one (same guarantee Delta gets from `_delta_log`). Readers
  * resolve the latest committed version from the log and open the data dir
  * NAMED IN THE MANIFEST with the schema recorded there — so a committed
  * version that nets to zero rows (an upsert that deletes everything, an
  * empty stream batch) stays readable instead of failing schema inference.
  *
  * MULTI-WRITER: optimistic concurrency like Delta's. Each writer stages
  * its data under a private token-named dir, then claims version N by
  * atomically creating `_graft_log/N.json` — on the local filesystem via a
  * hard-link publish (POSIX `link(2)` fails if the target exists and the
  * linked content is already complete — create-if-absent with no partial
  * visibility), on HDFS-like filesystems via rename-no-replace. Exactly one
  * writer wins a version slot; losers re-resolve the latest version and
  * retry — `write` (snapshot semantics) just re-claims the next slot
  * without rewriting data, `upsert` recomputes its merge against the new
  * base first (its content depends on what it read). Orphaned data dirs
  * from writers that died before committing are unreferenced and harmless;
  * `vacuum` sweeps them once they are older than every live version.
  *
  *  - time travel: `read(spark, path, asOf = Some(v))`
  *  - change feed: `changes(spark, path, fromV, toV)` — row-level
  *    insert/delete diff between two versions (CDF-lite; Delta's CDF is
  *    also a row diff, materialized at write time instead)
  *  - `vacuum(spark, path, keepLast)` — retire old version data like
  *    Delta's VACUUM
  */
object VersionedTable {

  private val LogDir = "_graft_log"

  /** Give up after this many lost commit races (a pathological writer storm,
    * not a normal contention level). */
  val MaxCommitRetries = 20

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifest(root: Path, v: Long) = new Path(root, f"$LogDir/$v%08d.json")

  /** Committed versions, ascending (empty for a nonexistent table). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val f = fs(spark, root)
    val log = new Path(root, LogDir)
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).map(_.getPath.getName).toSeq
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong).sorted
  }

  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  private final case class Commit(
      dir: String,
      schema: Option[StructType],
      stats: DataSkipping.FileStats)

  private def readManifest(f: FileSystem, root: Path, v: Long): Commit = {
    val mf = manifest(root, v)
    val bytes = new Array[Byte](f.getFileStatus(mf).getLen.toInt)
    val in = f.open(mf)
    try in.readFully(bytes) finally in.close()
    val node = new ObjectMapper().readTree(new String(bytes, "UTF-8"))
    val schema = Option(node.get("schema")).map(s =>
      DataType.fromJson(s.toString).asInstanceOf[StructType])
    val stats = Option(node.get("stats"))
      .map(DataSkipping.fromJson).getOrElse(Map.empty)
    Commit(node.get("dir").asText, schema, stats)
  }

  /** Stage `df` under a fresh private token dir; nothing references it until
    * a manifest commits. */
  private def stageData(df: DataFrame, root: Path): Path = {
    val token = java.util.UUID.randomUUID().toString.take(8)
    val dir = new Path(root, s"d-$token")
    df.write.mode("overwrite").parquet(dir.toString)
    dir
  }

  /** Claim version `v` by atomically creating its manifest. Returns false —
    * with the stage file cleaned up — iff another writer holds `v`. */
  private def tryCommit(
      f: FileSystem, root: Path, v: Long, dirName: String, schemaJson: String,
      statsJson: Option[String] = None): Boolean = {
    val log = new Path(root, LogDir)
    f.mkdirs(log)
    val stage = new Path(root,
      s".commit-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val statsField = statsJson.map(s => s""","stats":$s""").getOrElse("")
    val out = f.create(stage, true)
    try out.write(s"""{"version":$v,"dir":"$dirName","schema":$schemaJson$statsField}"""
      .getBytes("UTF-8"))
    finally out.close()
    val dest = manifest(root, v)
    val localRoot = "file" == Option(root.toUri.getScheme).getOrElse("file")
    val won =
      if (localRoot) {
        // POSIX link(2): atomic create-if-absent; the linked content is
        // already complete, so no reader can observe a partial manifest
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dest.toUri.getPath),
            java.nio.file.Paths.get(stage.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        // FileContext.rename(Options.Rename.NONE) is the CONTRACTUAL
        // no-replace rename (atomic create-if-absent on HDFS); the plain
        // FileSystem `!exists && rename` is a TOCTOU fallback for
        // filesystems with no FileContext binding. NOTE: object stores
        // whose FileSystem emulates rename non-atomically (e.g. S3A)
        // guarantee neither path — multi-writer safety there needs an
        // external lock or a real transaction-log service, as with Delta
        // on S3 (documented limit, not silently assumed away).
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            root.toUri, f.getConf)
          fc.rename(stage, dest, org.apache.hadoop.fs.Options.Rename.NONE)
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            !f.exists(dest) && f.rename(stage, dest)
          // some HDFS-compatible filesystems signal a Rename.NONE collision
          // as a plain IOException ("rename destination exists") — if the
          // destination now exists the race was simply lost (retry next
          // slot); only an IOException with the destination still absent is
          // a real failure worth aborting the writer
          case e: java.io.IOException =>
            if (f.exists(dest)) false else throw e
        }
      }
    f.delete(stage, false)
    won
  }

  /** Append a new version containing exactly `df` (full-snapshot semantics,
    * like the reference pipeline's overwrite-per-run tables). Returns the
    * committed version number. Concurrency-safe: on a lost race the data is
    * NOT rewritten — the writer just claims the next free version slot for
    * the already-staged dir. */
  def write(df: DataFrame, path: String): Long = write(df, path, Nil)

  /** As [[write]], additionally recording per-file min/max stats for
    * `statsCols` in the commit manifest (parquet footer reads only — see
    * [[DataSkipping.collect]]), enabling file pruning in [[readWhere]].
    * Choose the columns the table is z-ordered/clustered by: stats on a
    * column the layout doesn't cluster are valid but rarely selective. */
  def write(df: DataFrame, path: String, statsCols: Seq[String]): Long = {
    val spark = df.sparkSession
    val root = new Path(path)
    val f = fs(spark, root)
    val data = stageData(df, root)
    val schemaJson = df.schema.json
    val statsJson =
      if (statsCols.isEmpty) None
      else Some(DataSkipping.toJson(DataSkipping.collect(spark, data, statsCols)))
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      val v = latestVersion(spark, path).getOrElse(0L) + 1L
      if (tryCommit(f, root, v, data.getName, schemaJson, statsJson)) committed = v
      else {
        attempt += 1
        require(attempt < MaxCommitRetries,
          s"$path: lost $attempt commit races in a row; giving up")
      }
    }
    committed
  }

  /** Read the latest committed version, or `asOf` for time travel. The data
    * dir and schema come from the commit manifest, so empty versions read
    * fine and no footer inference runs. */
  def read(spark: SparkSession, path: String, asOf: Option[Long] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path has no committed versions")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"$path has no version $v (committed: $vs)")
    val root = new Path(path)
    val c = readManifest(fs(spark, root), root, v)
    val dir = new Path(root, c.dir).toString
    c.schema match {
      case Some(s) => spark.read.schema(s).parquet(dir)
      case None => spark.read.parquet(dir) // pre-schema manifests
    }
  }

  /** Data-skipping read: open ONLY the files whose manifest min/max stats
    * admit rows satisfying `predicate`, then apply the full predicate to
    * the surviving rows — pruning can only drop provably-dead files, never
    * change the result (files or columns without stats are always kept).
    * On a z-ordered table with stats on the clustering columns this is the
    * Delta OPTIMIZE+ZORDER scan path: a selective query at 100 TB touches
    * the handful of files whose z-tiles intersect the predicate box, with
    * zero footer fetches for the rest. Falls back to the plain versioned
    * read when the manifest carries no stats. */
  def readWhere(spark: SparkSession, path: String, predicate: org.apache.spark.sql.Column,
      asOf: Option[Long] = None): DataFrame = {
    val (kept, _, c) = pruned(spark, path, predicate, asOf)
    val df = c.schema match {
      case Some(s) => spark.read.schema(s).parquet(kept: _*)
      case None => spark.read.parquet(kept: _*)
    }
    df.filter(predicate)
  }

  /** Files (kept, skipped) for `predicate` — the observable pruning
    * decision, exposed for audits/specs. */
  def pruneInfo(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      asOf: Option[Long] = None): (Seq[String], Seq[String]) = {
    val (kept, skipped, _) = pruned(spark, path, predicate, asOf)
    (kept, skipped)
  }

  private def pruned(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      asOf: Option[Long]): (Seq[String], Seq[String], Commit) = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path has no committed versions")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"$path has no version $v (committed: $vs)")
    val root = new Path(path)
    val f = fs(spark, root)
    val c = readManifest(f, root, v)
    val dir = new Path(root, c.dir)
    val files = if (f.exists(dir)) f.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq else Seq.empty
    val (kept, skipped) = c.schema match {
      case Some(s) if c.stats.nonEmpty =>
        DataSkipping.prune(files, c.stats, DataSkipping.resolve(spark, s, predicate))
      case _ => (files, Seq.empty[String]) // no stats/schema recorded: keep all
    }
    (kept, skipped, c)
  }

  /** MERGE-equivalent upsert (docs/runbooks/silver-transform.md:114-122:
    * "Use MERGE INTO (upsert) to enforce uniqueness ... keep record with
    * max(ingested_at)"): rows of `updates` replace same-key rows of the
    * current version, new keys append, and the result commits as a new
    * version — so the merge inherits the log's atomicity AND leaves the
    * pre-merge snapshot time-travelable.
    *
    * Plan shape: one left_anti hash join of current-minus-updates on the
    * key (the only shuffle; broadcast when `updates` is small) + union —
    * no per-row driver work, scales with the table.
    *
    * Concurrency: the merge pins the base version it read; if another
    * writer commits first, the claim on base+1 fails and the merge is
    * RECOMPUTED against the new head (optimistic concurrency, Delta-style)
    * — a lost race can never silently drop the other writer's rows. */
  def upsert(updates: DataFrame, path: String, keys: Seq[String]): Long =
    upsert(updates, path, keys, evolveSchema = false, latestBy = None)

  def upsert(updates: DataFrame, path: String, keys: Seq[String],
      evolveSchema: Boolean): Long =
    upsert(updates, path, keys, evolveSchema, latestBy = None)

  /** @param evolveSchema true = columns present on only one side are kept
    *                     and null-filled on the other (Delta's
    *                     mergeSchema/autoMerge behavior); false = schemas
    *                     must match by name.
    * @param latestBy when the SAME key appears more than once within
    *                 `updates`, keep the row with the max of this column
    *                 (the runbook's "keep record with max(ingested_at)").
    *                 Without it, intra-batch duplicate keys are rejected —
    *                 silently unioning them in would commit a table that
    *                 violates the MERGE uniqueness contract. */
  def upsert(
      updates: DataFrame,
      path: String,
      keys: Seq[String],
      evolveSchema: Boolean,
      latestBy: Option[String]): Long =
    upsert(updates, path, keys, evolveSchema, latestBy, Nil)

  /** @param statsCols as in [[write]]: record per-file min/max for these
    *                  columns in the merged version's manifest, so a table
    *                  maintained by MERGE keeps its data-skipping reads. */
  def upsert(
      updates: DataFrame,
      path: String,
      keys: Seq[String],
      evolveSchema: Boolean,
      latestBy: Option[String],
      statsCols: Seq[String]): Long = {
    require(keys.nonEmpty, "upsert requires merge keys")
    val spark = updates.sparkSession
    val root = new Path(path)
    val f = fs(spark, root)
    val deduped = latestBy match {
      case Some(ord) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.row_number
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord).desc)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None =>
        val dups = updates.groupBy(keys.map(col): _*)
          .count().filter(col("count") > 1).limit(1).count()
        require(dups == 0,
          s"updates contain duplicate merge keys ${keys.mkString(",")}; " +
            "pass latestBy to pick a survivor")
        updates
    }
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion(spark, path)
      val merged = base match {
        case None => deduped
        case Some(b) =>
          // pin the exact version the merge is computed against — reading
          // "latest" here would race a concurrent commit past the CAS check
          val current = read(spark, path, Some(b))
          current.join(deduped.select(keys.map(col): _*).distinct(), keys, "left_anti")
            .unionByName(deduped, allowMissingColumns = evolveSchema)
      }
      val data = stageData(merged, root)
      val statsJson =
        if (statsCols.isEmpty) None
        else Some(DataSkipping.toJson(DataSkipping.collect(spark, data, statsCols)))
      if (tryCommit(f, root, base.getOrElse(0L) + 1L, data.getName, merged.schema.json,
        statsJson))
        committed = base.getOrElse(0L) + 1L
      else {
        f.delete(data, true) // stale merge — recompute against the new head
        attempt += 1
        require(attempt < MaxCommitRetries,
          s"$path: lost $attempt upsert commit races in a row; giving up")
      }
    }
    committed
  }

  /** Row-level change feed between two committed versions: multiset diff
    * tagged insert/delete (an unchanged row appears in neither). Runs as
    * two hash anti-diffs (exceptAll), one shuffle each — no driver-side
    * materialization, so it scales with the table. Versions with evolved
    * schemas (see upsert's evolveSchema) are aligned first: columns missing
    * on one side become typed nulls, so a row that only gained a null new
    * column reads as unchanged. */
  def changes(spark: SparkSession, path: String, fromV: Long, toV: Long): DataFrame = {
    val before = read(spark, path, Some(fromV))
    val after = read(spark, path, Some(toV))
    val types = (before.schema ++ after.schema).map(f => f.name -> f.dataType).toMap
    val allCols = (before.columns ++ after.columns).distinct
    def aligned(df: DataFrame) = df.select(allCols.map { c =>
      if (df.columns.contains(c)) col(c) else lit(null).cast(types(c)).as(c)
    }: _*)
    val b = aligned(before)
    val a = aligned(after)
    a.exceptAll(b).withColumn("_change_type", lit("insert"))
      .unionByName(b.exceptAll(a).withColumn("_change_type", lit("delete")))
  }

  /** Default orphan-sweep retention: like Delta's VACUUM retention horizon,
    * an unreferenced dir must ALSO be at least this old before it is swept,
    * so a slow in-flight writer's staged-but-not-yet-committed dir survives
    * vacuums that run after newer commits landed. */
  val DefaultOrphanRetentionMs: Long = 24L * 3600 * 1000

  /** Drop data + manifests of all but the last `keepLast` versions, plus any
    * data dir no manifest references (orphans from dead uncommitted
    * writers). Orphan sweep only removes dirs whose modification time
    * precedes BOTH the oldest KEPT commit AND `now - orphanRetentionMs`
    * (Delta-style retention floor) — the commit-time bound alone is not
    * enough: a writer that staged BEFORE a newer commit landed would have
    * its in-flight dir look older than every kept manifest and get swept
    * mid-write, then win its CAS and commit a manifest pointing at deleted
    * data. A writer in flight LONGER than the retention window is still
    * exposed — same contract as Delta's retention horizon; don't pass a
    * window shorter than your slowest writer. Stale `.commit-*.tmp` files
    * (writers that died between staging the manifest bytes and publishing
    * them) are swept under the same cutoff. */
  def vacuum(spark: SparkSession, path: String, keepLast: Int,
      orphanRetentionMs: Long = DefaultOrphanRetentionMs): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val root = new Path(path)
    val f = fs(spark, root)
    val vs = versions(spark, path)
    val (drop, keep) = (vs.dropRight(keepLast), vs.takeRight(keepLast))
    drop.foreach { v =>
      val c = readManifest(f, root, v)
      // manifest first: a crash between the two deletes must not leave a
      // committed version whose data is gone
      f.delete(manifest(root, v), false)
      f.delete(new Path(root, c.dir), true)
    }
    val live = keep.map(v => readManifest(f, root, v).dir).toSet
    val oldestKeptTime = keep.headOption
      .map(v => f.getFileStatus(manifest(root, v)).getModificationTime)
      .getOrElse(Long.MaxValue)
    val cutoff = math.min(oldestKeptTime, System.currentTimeMillis() - orphanRetentionMs)
    f.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val versioned = n.startsWith("d-") || n.startsWith("v=") // incl. legacy layout
      val staleStage = !st.isDirectory &&
        n.startsWith(".commit-") && n.endsWith(".tmp")
      if (st.getModificationTime < cutoff &&
        ((st.isDirectory && versioned && !live.contains(n)) || staleStage))
        f.delete(st.getPath, st.isDirectory)
    }
  }
}
