package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized views over graft tables — the
  * DLT/Databricks materialized-view story on this engine's own change
  * feed: the view is a graft table holding `GROUP BY` aggregates of a
  * source graft table, and REFRESH applies only the source's CHANGES
  * since the last refresh (one [[VersionedTable.changes]] diff + one CoW
  * MERGE), never a recompute.
  *
  * Maintained aggregates are the self-maintainable ones — COUNT(*) and
  * SUM(col) per group (AVG derives as sum/count at query time): an insert
  * contributes +1/+value, a delete −1/−value, an update is its
  * delete+insert pair — so the per-group delta is one aggregation of the
  * change feed with a sign column, and groups whose count reaches zero
  * leave the view through the MERGE's tombstone clause. MIN/MAX are
  * deliberately absent: a delete of the current extremum cannot be
  * repaired from a delta (it needs the surviving rows), which is exactly
  * why warehouse engines restrict incremental views the same way.
  *
  * SUM's SQL null semantics are maintained EXACTLY: each `sum_<col>`
  * rides with a non-null contribution count `nn_<col>`, and the merged
  * sum goes back to NULL when that count reaches zero — so a group whose
  * every value is NULL reports NULL (not 0), and an inserted NULL row
  * changes the count but never the sum, same as recomputing would.
  *
  * NULL GROUP VALUES ARE REFUSED (create and refresh both check): the
  * refresh MERGE addresses view rows by key EQUALITY, and SQL equality
  * never matches NULL — a null-keyed group could not be updated in
  * place. Coalesce or filter null keys upstream (the same restriction
  * warehouse engines put on clustering/merge keys).
  *
  * Exactly-once bookkeeping rides the manifest txn map, not a property:
  * the refresh MERGE commits under `(graft.mv, sourceVersion)`, so the
  * progress cursor ([[VersionedTable.lastTxn]]) is ATOMIC with the commit
  * that applied the delta — a crashed refresh re-run is the upsert replay
  * no-op, never a double-count.
  *
  * Registered views feed [[graft.sql.GraftMvRewrite]]: a GROUP BY query
  * over the SOURCE whose grouping columns and aggregates the view covers
  * is answered from the view when its watermark equals the queried
  * snapshot — the aggregate-rewrite story that makes a 100 TB fact's
  * daily dashboard read kilobytes.
  *
  * Scale shape at 100 TB: refresh cost is O(changed source files) to read
  * the diff (changes() is file-granular) + O(touched view files) to merge
  * it (CoW file selection on the group keys, which are the view's stats
  * columns) — a view over a 100 TB fact whose daily delta touches one
  * partition refreshes by reading that partition's files and rewriting
  * the handful of view files whose key bounds admit the changed groups. */
object MaterializedView {

  /** txn app id carried by the create snapshot and every refresh MERGE;
    * batchId = the SOURCE version the view reflects. */
  val App = "graft.mv"

  val SourceKey = "graft.mv.source"
  val GroupByKey = "graft.mv.groupBy"
  val SumColsKey = "graft.mv.sumCols"

  /** SOURCE-side roster of registered view paths — what the relation
    * builder hands the aggregate-rewrite rule ([[graft.sql.GraftMvRewrite]])
    * as rewrite candidates. Registered BEFORE the create snapshot reads,
    * so the view's watermark can equal the source head from version one. */
  val ViewsKey = "graft.mv.views"

  private[sources] def viewsIn(props: Map[String, String]): Seq[String] =
    props.get(ViewsKey).toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  /** The maintained row count per group; sums land as `sum_<col>` with
    * their non-null contribution count as `nn_<col>`. */
  val CountCol = "mv_count"
  def sumColName(c: String): String = s"sum_$c"
  def nnColName(c: String): String = s"nn_$c"

  private def aggFrame(src: DataFrame, groupBy: Seq[String],
      sumCols: Seq[String]): DataFrame =
    src.groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as(CountCol),
        sumCols.flatMap(c => Seq(sum(col(c)).as(sumColName(c)),
          count(col(c)).as(nnColName(c)))): _*)

  /** Loud null-group-key gate — `frame` is already one row per group
    * (O(groups), not O(rows)). */
  private def refuseNullGroups(frame: DataFrame, groupBy: Seq[String],
      what: String): Unit = {
    val nulls = frame
      .filter(groupBy.map(col(_).isNull).reduce(_ || _)).limit(1).count()
    require(nulls == 0L,
      s"materialized view $what: NULL group value(s) in (${groupBy.mkString(",")}) — " +
        "the refresh MERGE addresses groups by key equality, which never " +
        "matches NULL; coalesce or filter null keys upstream")
  }

  /** CREATE MATERIALIZED VIEW: one full aggregation of the source's head
    * snapshot, committed with the txn watermark pinned to the source
    * version it read. Idempotent/resumable: an existing view just gets
    * its definition properties (re)asserted. */
  def create(spark: SparkSession, srcPath: String, mvPath: String,
      groupBy: Seq[String], sumCols: Seq[String]): Long = {
    require(groupBy.nonEmpty, "materialized view needs GROUP BY columns")
    // register the view on the SOURCE first (its props feed the rewrite
    // rule's candidate list), so the snapshot read below — at the version
    // the registration produced or later — can leave the view fresh enough
    // to answer for the source head immediately
    val registered = viewsIn(VersionedTable.propertiesOf(spark, srcPath))
    if (!registered.contains(mvPath))
      VersionedTable.setProperties(spark, srcPath,
        Map(ViewsKey -> (registered :+ mvPath).mkString(",")))
    val v = VersionedTable.latestVersion(spark, srcPath).getOrElse(
      throw new IllegalArgumentException(s"$srcPath has no committed versions"))
    if (VersionedTable.latestVersion(spark, mvPath).isEmpty) {
      val snap = VersionedTable.read(spark, srcPath, Some(v))
      val agg = aggFrame(snap, groupBy, sumCols)
      refuseNullGroups(agg, groupBy, s"create over $srcPath")
      // group keys are the view's stats columns: the refresh MERGE's CoW
      // file selection prunes on exactly these
      VersionedTable.commitSnapshot(agg, mvPath, App, v, statsCols = groupBy)
    }
    VersionedTable.setProperties(spark, mvPath, Map(
      SourceKey -> srcPath,
      GroupByKey -> groupBy.mkString(","),
      SumColsKey -> sumCols.mkString(",")))
  }

  /** REFRESH: diff the source between the view's txn watermark and the
    * source head, aggregate the diff with an insert=+1/delete=−1 sign,
    * and MERGE the per-group delta into the view — new groups insert,
    * emptied groups tombstone out, untouched view files carry by
    * reference. No-op (current version) when the source hasn't moved.
    * Crash-safe: a re-run of an applied (App, version) is the upsert
    * replay no-op. */
  def refresh(spark: SparkSession, mvPath: String): Long = {
    val props = VersionedTable.propertiesOf(spark, mvPath)
    val src = props.getOrElse(SourceKey, throw new IllegalArgumentException(
      s"$mvPath is not a materialized view (no $SourceKey property)"))
    val groupBy = props(GroupByKey).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sumCols = props.get(SumColsKey).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val v0 = VersionedTable.lastTxn(spark, mvPath, App).getOrElse(
      throw new IllegalStateException(s"$mvPath carries no $App watermark"))
    val v1 = VersionedTable.latestVersion(spark, src).getOrElse(
      throw new IllegalArgumentException(s"$src has no committed versions"))
    val cur = VersionedTable.latestVersion(spark, mvPath).get
    if (v1 <= v0) return cur // source unchanged (versions never rewind)
    val sign = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val delta = VersionedTable.changes(spark, src, v0, v1)
      .groupBy(groupBy.map(col): _*)
      .agg(sum(sign).as("d_count"),
        sumCols.flatMap(c => Seq(
          sum(sign * col(c)).as(s"d_$c"),
          // non-null contribution delta: NULL values move the row count
          // but never the sum — tracked so the merged sum can return to
          // SQL-NULL when its last non-null contribution leaves
          sum(when(col(c).isNotNull, sign).otherwise(lit(0L))).as(s"dnn_$c"))): _*)
      // a group whose inserts and deletes cancel exactly contributes
      // nothing — dropping it keeps the MERGE's CoW selection tight
      .filter(col("d_count") =!= 0L ||
        sumCols.map(c => coalesce(col(s"d_$c"), lit(0)) =!= lit(0) ||
            col(s"dnn_$c") =!= 0L)
          .foldLeft(lit(false))(_ || _))
    refuseNullGroups(delta, groupBy, s"refresh of $mvPath")
    val viewCols = Seq(CountCol) ++
      sumCols.flatMap(c => Seq(sumColName(c), nnColName(c)))
    val curView = VersionedTable.read(spark, mvPath).select(
      (groupBy ++ viewCols).map(col): _*)
    val merged = delta.join(curView, groupBy, "left")
      .select(groupBy.map(col) ++ Seq(
        (coalesce(col(CountCol), lit(0L)) + col("d_count")).as(CountCol)) ++
        sumCols.flatMap { c =>
          val dt = curView.schema(sumColName(c)).dataType
          val zero = lit(0).cast(dt)
          val nn = coalesce(col(nnColName(c)), lit(0L)) + col(s"dnn_$c")
          Seq(
            when(nn === 0L, lit(null).cast(dt))
              .otherwise((coalesce(col(sumColName(c)), zero) +
                coalesce(col(s"d_$c"), zero)).cast(dt))
              .as(sumColName(c)),
            nn.as(nnColName(c)))
        }: _*)
    VersionedTable.upsert(merged, mvPath, keys = groupBy,
      evolveSchema = false, latestBy = None, statsCols = groupBy,
      txn = Some(App -> v1),
      deleteWhere = Some(col(CountCol) === 0L))
  }

  /** Predicate helper for deleteWhere-style callers/tests. */
  def dead: Column = col(CountCol) === 0L
}
