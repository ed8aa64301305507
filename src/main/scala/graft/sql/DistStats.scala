package graft.sql

import org.apache.spark.sql.types.DataType

import graft.sources.DataSkipping
import graft.sources.DataSkipping.ColStat

/** Shared machinery of the DISTRIBUTED metadata walks over a
  * checkpoint-anchored table's checkpoint parquet: the partition-census
  * stats aggregation and the top-k prefix proof, both of which previously
  * materialized the full per-file stats map on the DRIVER whenever their
  * rule fired on an anchored table ("force-on-win" — at millions of files
  * that is an O(table) plan-time driver parse). Everything here is
  * serializable and closure-safe: executors parse stats JSON where the
  * data sits, and only aggregates bounded by the PARTITION count (census)
  * or by K (top-k) travel back.
  *
  * [[StatView]] replicates the driver hook contracts byte-for-byte —
  * `VersionedTable.relationFor`'s fileMinMaxOf / fileNonNullOf / fileSumOf
  * refusal rules and `GraftFileIndex`'s partition-aware topkBoundsOf /
  * topkNonNullOf path synthesis — so the distributed walks and the driver
  * walks cannot drift. */
object DistStats extends Serializable {

  /** The `col=value` path segments identifying a file's partition — the
    * census grouping key (the same recipe as GraftFileIndex.partDirOf;
    * token dirs never contain '='). */
  def partDirOf(rel: String): String = rel.split('/').dropRight(1)
    .filter(_.contains('=')).mkString("/")

  /** Per-file stat accessors over RAW checkpoint/manifest ingredients.
    *
    * @param partFields (logical name, physical dir name, type) of EVERY
    *                   partition column, in partition-schema order — the
    *                   `partRow` used for partition-predicate evaluation
    *                   is laid out in this order.
    */
  final class StatView(
      val path: String,
      rowsOpt: Option[Long],
      stats: Map[String, ColStat],
      dvMarkedRows: Long,
      partFields: Seq[(String, String, DataType)],
      zone: Option[String]) extends Serializable {

    private val marked = dvMarkedRows > 0L
    val liveRows: Option[Long] = rowsOpt.map(_ - dvMarkedRows)
    private val zeroRow = rowsOpt.contains(0L)

    private lazy val kv: Map[String, String] = path.split('/').dropRight(1)
      .flatMap { seg =>
        val i = seg.indexOf('=')
        if (i > 0) Some(seg.substring(0, i) -> seg.substring(i + 1)) else None
      }.toMap

    /** logical partition name → Some(internal value) | None (hive null
      * dir / failed cast — both group and filter as NULL, matching
      * GraftFileIndex.partValuesOf). */
    lazy val partVals: Map[String, Option[Any]] = partFields.map {
      case (n, phys, dt) =>
        n -> kv.get(phys).filterNot(_ == "__HIVE_DEFAULT_PARTITION__")
          .flatMap { raw =>
            Option(DataSkipping.castPartValue(
              org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .unescapePathName(raw), dt, zone))
          }
    }.toMap

    /** The file's partition values as an InternalRow in partFields order —
      * what the shipped census-filter predicates (BoundReference over the
      * partition schema) evaluate against. */
    lazy val partRow: org.apache.spark.sql.catalyst.InternalRow =
      org.apache.spark.sql.catalyst.InternalRow.fromSeq(
        partFields.map { case (n, _, _) => partVals(n).orNull })

    /** Stats-domain bounds — topkBoundsOf's contract: PARTITION columns
      * answer from the path (min = max = value; valid under DV marks —
      * every surviving row still carries it; the hive null dir is
      * all-null), DATA columns under fileMinMaxOf's refusal rules (marked
      * files answer nothing, zero-row files answer vacuously, truncated
      * bounds refuse, all-null is a valid no-contribution answer). */
    def mm(c: String): Option[Option[(Any, Any)]] =
      partVals.get(c) match {
        case Some(None) => Some(None)
        case Some(Some(v)) =>
          BoundaryWalk.statDomainOf(v).map(sd => Some((sd, sd)))
        case None =>
          if (marked) None
          else if (zeroRow) Some(None)
          else stats.get(c) match {
            case None => None
            case Some(st) if st.allNulls => Some(None)
            case Some(st)
                if st.min.isEmpty || st.max.isEmpty || st.inexact => None
            case Some(st) => Some(Some((st.min.get, st.max.get)))
          }
      }

    /** Exact live non-null count — topkNonNullOf's contract: partition
      * columns answer live rows (0 for the null dir), data columns under
      * fileNonNullOf's rules (inexact string bounds still count: the
      * truncation taints only the bounds, the null count stays exact). */
    def nn(c: String): Option[Long] =
      partVals.get(c) match {
        case Some(None) => Some(0L)
        case Some(Some(_)) => liveRows
        case None =>
          if (marked) None
          else if (zeroRow) Some(0L)
          else for {
            r <- rowsOpt
            st <- stats.get(c)
            if st.allNulls || (st.min.isDefined && st.max.isDefined)
          } yield if (st.allNulls) 0L else r - st.numNulls
      }

    /** Exact ANALYZE sum — fileSumOf's contract (data columns only; the
      * census never routes partition columns here). */
    def sum(c: String): Option[BigDecimal] =
      if (marked) None
      else if (zeroRow) Some(BigDecimal(0))
      else stats.get(c).flatMap(_.sum)

    /** Per-file sketch hashes + recipe — topkNdvHashesOf's contract:
      * partition columns synthesize one per-value token (exact), the
      * hive null dir and zero-row files answer the empty exact set,
      * marked files answer nothing. */
    def ndvHashes(c: String): Option[(Seq[String], Int)] =
      partVals.get(c) match {
        case Some(vOpt) => liveRows match {
          case None => None
          case Some(n) if n <= 0L => Some((Nil, Int.MaxValue))
          case Some(_) => vOpt match {
            case None => Some((Nil, Int.MaxValue))
            case Some(v) => Some((Seq("p:" + v), Int.MaxValue))
          }
        }
        case None =>
          if (marked) None
          else stats.get(c).flatMap(st => st.ndv.map(h => (h, st.ndvRecipe)))
      }
  }

  // ------------------------------------------------------------------
  // Census: per-(partition dir, column) aggregates
  // ------------------------------------------------------------------

  /** One column's aggregate over a set of files: refusal is STICKY per
    * channel (any file that cannot answer exactly poisons the channel,
    * exactly as the driver census abandons on the first refusing file).
    * `bounds = Some(None)` is "no contribution yet / all-null". */
  final case class ColAgg(
      bounds: Option[Option[(Any, Any)]],
      nn: Option[Long],
      sum: Option[BigDecimal]) extends Serializable

  val emptyColAgg: ColAgg = ColAgg(Some(None), Some(0L), Some(BigDecimal(0)))

  def colAggOf(sv: StatView, c: String): ColAgg =
    ColAgg(sv.mm(c), sv.nn(c), sv.sum(c))

  def mergeColAgg(a: ColAgg, b: ColAgg): ColAgg = ColAgg(
    (a.bounds, b.bounds) match {
      case (Some(x), Some(y)) => Some((x, y) match {
        case (None, o) => o
        case (o, None) => o
        case (Some((mn1, mx1)), Some((mn2, mx2))) =>
          val ord = DataSkipping.statOrdering
          Some((if (ord.lteq(mn1, mn2)) mn1 else mn2,
            if (ord.gteq(mx1, mx2)) mx1 else mx2))
      })
      case _ => None
    },
    for { x <- a.nn; y <- b.nn } yield x + y,
    for { x <- a.sum; y <- b.sum } yield x + y)

  // ------------------------------------------------------------------
  // Top-k: the bound-sorted prefix proof, distributed
  // ------------------------------------------------------------------

  /** Same-direction bound satisfaction in the stats domain — the
    * executor-side twin of sortColThreshold's satAll. */
  def satAll(edge: Any, desc: Boolean, bounds: Seq[(Any, Boolean)]): Boolean = {
    val ord = DataSkipping.statOrdering
    bounds.forall { case (v, strict) =>
      if (desc) { if (strict) ord.gt(edge, v) else ord.gteq(edge, v) }
      else { if (strict) ord.lt(edge, v) else ord.lteq(edge, v) }
    }
  }

  /** One file's top-k candidacy: (sort bound = near edge, far edge, exact
    * non-null count, fully-satisfies-the-bounds). Files that cannot answer
    * exactly, or with zero non-null values, are not candidates — never
    * counted, never pruned (the exact-or-decline posture). */
  def candOf(sv: StatView, column: String, desc: Boolean)
      : Option[(Any, Any, Long)] =
    for {
      b <- sv.mm(column).flatten
      c <- sv.nn(column)
      if c > 0L
    } yield if (desc) (b._1, b._2, c) else (b._2, b._1, c)

  /** Streaming MINIMAL-PREFIX accumulator: feed every candidate of one
    * checkpoint partition; `result` is that partition's shortest
    * bound-sorted prefix with cumulative count >= k (or everything seen,
    * when the partition alone has < k — then at most k-1 entries, since
    * every candidate counts >= 1). The union of per-partition prefixes
    * provably contains every file the GLOBAL walk consumes — any dropped
    * file has a full >= k prefix of same-or-better bounds in front of it —
    * so re-walking the union on the driver yields the IDENTICAL tau.
    * Memory is O(k) per partition: at most one entry beyond the k-th
    * cumulative row survives trimming. */
  final class PrefixHeap(k: Int, desc: Boolean) extends Serializable {
    // dequeues the prefix's LAST element first (the trim victim): the
    // smallest bound for DESC, the largest for ASC
    private val ord: Ordering[(Any, Long)] =
      if (desc) Ordering.by[(Any, Long), Any](_._1)(
        DataSkipping.statOrdering.reverse)
      else Ordering.by[(Any, Long), Any](_._1)(DataSkipping.statOrdering)
    private val heap =
      scala.collection.mutable.PriorityQueue.empty[(Any, Long)](ord)
    private var cum = 0L
    def add(bound: Any, cnt: Long): Unit = {
      heap.enqueue((bound, cnt))
      cum += cnt
      while (heap.nonEmpty && cum - heap.head._2 >= k)
        cum -= heap.dequeue()._2
    }
    def result: Vector[(Any, Long)] = heap.toVector
  }

  /** Per-DIR facts of the window group-limit's fire guard on a DATA
    * sort column, aggregated on executors: live file count, the KEYS of
    * files whose bounds survive the dir's effective tau (unprovable
    * stats survive — never pruned on a guess; the key list is bounded by
    * the surviving scan, and every file key is already driver-resident
    * in the census), and the null-provability channel (any unknown
    * non-null count / row count, Σnn, Σrows) that decides the NULLS
    * FIRST admission driver-side. */
  final case class GroupGuardAgg(files: Long, boundsAdmit: Vector[String],
      nnUnknown: Boolean, nnSum: Long, rows: Long) extends Serializable

  val emptyGuardAgg: GroupGuardAgg =
    GroupGuardAgg(0L, Vector.empty, false, 0L, 0L)

  def mergeGuardAgg(a: GroupGuardAgg, b: GroupGuardAgg): GroupGuardAgg =
    GroupGuardAgg(a.files + b.files, a.boundsAdmit ++ b.boundsAdmit,
      a.nnUnknown || b.nnUnknown, a.nnSum + b.nnSum, a.rows + b.rows)

  /** Fold ONE file into its dir's guard aggregate. `eff` is the dir's
    * effective stats-domain tau (None = every admitted group keeps all
    * of its rows — the file survives regardless of bounds). */
  def guardAggOf(sv: StatView, column: String, desc: Boolean,
      eff: Option[Any], prior: GroupGuardAgg): GroupGuardAgg = {
    val statOrd = DataSkipping.statOrdering
    val admit = eff match {
      case None => true
      case Some(t) => sv.mm(column).flatten match {
        case None => true // unprovable (or all-null) stats: survives
        case Some((mn, mx)) =>
          if (desc) statOrd.gteq(mx, t) else statOrd.lteq(mn, t)
      }
    }
    val (unk, nnAdd, rowsAdd) = (sv.nn(column), sv.liveRows) match {
      case (Some(n), Some(r)) => (false, n, r)
      case _ => (true, 0L, 0L)
    }
    GroupGuardAgg(prior.files + 1L,
      if (admit) prior.boundsAdmit :+ sv.path else prior.boundsAdmit,
      prior.nnUnknown || unk, prior.nnSum + nnAdd, prior.rows + rowsAdd)
  }

  /** One file's DENSE_RANK candidacy: (sort bound, far edge, sketch
    * hashes). Binary columns require the content-based hash recipe
    * (pre-recipe sketches are not probe-able); files without a sketch
    * or provable bounds are not candidates. */
  def distinctCandOf(sv: StatView, column: String, desc: Boolean,
      needRecipe: Boolean): Option[(Any, Any, Seq[String])] =
    for {
      b <- sv.mm(column).flatten
      hs <- sv.ndvHashes(column)
      if !needRecipe || hs._2 >= DataSkipping.NdvRecipeCurrent
    } yield if (desc) (b._1, b._2, hs._1) else (b._2, b._1, hs._1)

  /** Streaming minimal DISTINCT-prefix accumulator — the DENSE_RANK twin
    * of [[PrefixHeap]]: keeps the shortest bound-sorted prefix whose
    * UNIONED sketch hashes reach >= k distinct (the union of k-min
    * sketches lower-bounds true distinct, so >= k proven here holds in
    * truth). A candidate entirely past the proven prefix is dropped on
    * arrival; `saturated` reports a partition that overflowed `cap`
    * without reaching k distinct — the caller then DECLINES (shipping a
    * truncated incomplete prefix would be unsound). The union of
    * per-partition prefixes provably contains every file the global walk
    * consumes (any dropped file has a full >= k-distinct prefix of
    * same-or-better bounds in front of it, and distinct counts are
    * monotone over supersets), so the driver re-walk yields the
    * identical tau. */
  final class DistinctPrefix(k: Int, desc: Boolean, cap: Int)
      extends Serializable {
    private val ord: Ordering[Any] =
      if (desc) DataSkipping.statOrdering.reverse else DataSkipping.statOrdering
    private var buf = Vector.empty[(Any, Seq[String])] // best bound first
    private var sat = false
    def add(bound: Any, hashes: Seq[String]): Unit = if (!sat) {
      val i = buf.indexWhere(e => ord.gt(e._1, bound))
      buf =
        if (i < 0) buf :+ ((bound, hashes))
        else (buf.take(i) :+ ((bound, hashes))) ++ buf.drop(i)
      val seen = scala.collection.mutable.HashSet.empty[String]
      var cut = -1
      var idx = 0
      while (cut < 0 && idx < buf.size) {
        seen ++= buf(idx)._2
        if (seen.size >= k) cut = idx
        idx += 1
      }
      if (cut >= 0) buf = buf.take(cut + 1)
      else if (buf.size > cap) sat = true
    }
    def result: (Vector[(Any, Seq[String])], Boolean) = (buf, sat)
  }

  /** The driver-side final DISTINCT walk over merged candidates: shortest
    * bound-sorted prefix whose unioned hashes reach >= k distinct; tau is
    * the last consumed bound. None when k distinct are not provable. */
  def distinctPrefixWalk(cands: Seq[(Any, Seq[String])], k: Int,
      desc: Boolean): Option[Any] = {
    val ord = DataSkipping.statOrdering
    val sorted =
      if (desc) cands.sortBy(_._1)(ord.reverse) else cands.sortBy(_._1)(ord)
    val seen = scala.collection.mutable.HashSet.empty[String]
    var tau: Option[Any] = None
    val it = sorted.iterator
    while (seen.size < k && it.hasNext) {
      val (b, hs) = it.next(); seen ++= hs; tau = Some(b)
    }
    if (seen.size < k) None else tau
  }

  /** The driver-side final walk over merged candidates: shortest
    * bound-sorted prefix with >= k non-null values; tau is the last
    * consumed bound (stats domain). None when fewer than k values are
    * provable. */
  def prefixWalk(cands: Seq[(Any, Long)], k: Int, desc: Boolean)
      : Option[Any] = {
    val ord = DataSkipping.statOrdering
    val sorted =
      if (desc) cands.sortBy(_._1)(ord.reverse) else cands.sortBy(_._1)(ord)
    var need = k.toLong
    var tau: Option[Any] = None
    val it = sorted.iterator
    while (need > 0 && it.hasNext) {
      val (b, c) = it.next(); need -= c; tau = Some(b)
    }
    if (need > 0) None else tau
  }
}
