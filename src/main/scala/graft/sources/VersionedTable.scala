package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table — the transaction-log-lite answer to the
  * reference's Delta features this environment has no jars for
  * (`sql/ddl/01_bronze.sql:18-26` ACID, time travel, change data feed;
  * deviation documented in SURVEY §1.3):
  *
  * layout
  * {{{
  *   <path>/v=00000001/...parquet      immutable version data
  *   <path>/v=00000002/...parquet
  *   <path>/_graft_log/00000001.json   commit manifests (the log)
  * }}}
  *
  * The COMMIT POINT is the atomic rename of the version's manifest into
  * `_graft_log/` — data directories are written first and are unreferenced
  * until their manifest lands, so a writer dying at ANY point leaves every
  * previously-committed version readable and never exposes a partial one
  * (same guarantee Delta gets from `_delta_log`). Readers resolve the
  * latest committed version from the log, never by listing data dirs.
  *
  * Single-writer (matching the reference's one-runner-at-a-time local
  * orchestration, `local/run_all.ps1`); concurrent writers would need a
  * lock or CAS on the log, which local filesystems cannot give portably.
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

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def vdir(root: Path, v: Long) = new Path(root, f"v=$v%08d")
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

  /** Append a new version containing exactly `df` (full-snapshot semantics,
    * like the reference pipeline's overwrite-per-run tables). Returns the
    * committed version number. */
  def write(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val root = new Path(path)
    val f = fs(spark, root)
    val v = latestVersion(spark, path).getOrElse(0L) + 1L
    val data = vdir(root, v)
    // 1. data first — unreferenced until the manifest commits
    df.write.mode("overwrite").parquet(data.toString)
    // 2. manifest staged next to the log, then renamed in (atomic commit)
    val log = new Path(root, LogDir)
    f.mkdirs(log)
    val stage = new Path(root, f".commit-$v%08d.tmp")
    val out = f.create(stage, true)
    try out.write(s"""{"version":$v,"dir":"${data.getName}"}""".getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(stage, manifest(root, v)))
      throw new java.io.IOException(s"version $v commit failed for $path")
    v
  }

  /** Read the latest committed version, or `asOf` for time travel. */
  def read(spark: SparkSession, path: String, asOf: Option[Long] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path has no committed versions")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"$path has no version $v (committed: $vs)")
    spark.read.parquet(vdir(new Path(path), v).toString)
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
    * no per-row driver work, scales with the table. */
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
      latestBy: Option[String]): Long = {
    require(keys.nonEmpty, "upsert requires merge keys")
    val spark = updates.sparkSession
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
    val merged = latestVersion(spark, path) match {
      case None => deduped
      case Some(_) =>
        val current = read(spark, path)
        current.join(deduped.select(keys.map(col): _*).distinct(), keys, "left_anti")
          .unionByName(deduped, allowMissingColumns = evolveSchema)
    }
    write(merged, path)
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

  /** Drop data + manifests of all but the last `keepLast` versions. */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val root = new Path(path)
    val f = fs(spark, root)
    versions(spark, path).dropRight(keepLast).foreach { v =>
      // manifest first: a crash between the two deletes must not leave a
      // committed version whose data is gone
      f.delete(manifest(root, v), false)
      f.delete(vdir(root, v), true)
    }
  }
}
