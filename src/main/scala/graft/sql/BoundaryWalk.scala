package graft.sql

import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** The hybrid boundary rewrite's per-file classification, extracted so the
  * DRIVER walk (inline manifests / already-paid lazy stats) and the
  * DISTRIBUTED walk (executors over a checkpoint parquet — the 100 TB
  * deployment, where forcing the stats column driver-side is exactly what
  * the `statsDriverCheap` gate forbids) run the SAME decision procedure
  * and can never drift.
  *
  * Everything here is serializable: interval bounds are Catalyst-internal
  * values (Long/Int/Double/UTF8String/Decimal — all Serializable),
  * orderings re-derive from the DataType on whichever side evaluates.
  */
object BoundaryWalk extends Serializable {

  /** One INTERNAL-domain range: (lower, upper), each (value, strict);
    * None = unbounded. */
  type Rng = (Option[(Any, Boolean)], Option[(Any, Boolean)])

  /** One cond column's accumulated CLAUSES — each clause is a union of
    * ranges (a plain comparison is a one-range clause, `IN (…)` a union
    * of points, `a < x OR a >= y` a union of ranges); the conjunction of
    * clauses constrains the column. `wantNull` inverts the column's
    * accounting: the filter keeps rows where the column IS NULL (the
    * data-quality probe `WHERE v IS NULL`) — matching rows per file are
    * then the null rows that are NON-null in every range column, exact
    * from nn (plus the joint-null stat when one range column is itself
    * nullable). A wantNull column carries no range clauses; at most one
    * per condition (the rule gates the shape). */
  final case class IvS(name: String, dt: DataType,
      clauses: Seq[Seq[Rng]], wantNull: Boolean = false)
      extends Serializable

  /** A SUM output slot's column. */
  final case class SumS(name: String) extends Serializable

  /** A MIN/MAX output slot's column. */
  final case class ExtS(name: String, dt: DataType, takeMax: Boolean)
      extends Serializable

  sealed trait FileClass extends Serializable
  /** Every row provably fails the range — contributes nothing. */
  case object Outside extends FileClass
  /** Straddling / unprovable — joins the real counting scan. */
  case object Boundary extends FileClass
  /** Fully inside: exact metadata contributions. `exts` values are
    * internal-domain. */
  final case class Inside(matchCnt: Long,
      sums: Seq[(String, BigDecimal, Long)],
      exts: Seq[(String, Boolean, Any)]) extends FileClass

  /** Classify ONE file. Accessors follow the GraftFileIndex hook
    * contracts exactly:
    *  - `mm`: stats-domain bounds — None unprovable, Some(None) all-null,
    *    Some(Some((min, max))) exact (partition columns synthesize
    *    min = max = path value);
    *  - `nn`: exact live non-null count (partition-aware);
    *  - `sumOf`/`sumNn`: exact ANALYZE sum + its non-null count;
    *  - `rows`: exact live rows (DV marks subtracted).
    */
  def classify(ivs: Seq[IvS], sumCols: Seq[SumS], extCols: Seq[ExtS],
      mm: String => Option[Option[(Any, Any)]],
      nn: String => Option[Long],
      sumOf: String => Option[BigDecimal],
      sumNn: String => Option[Long],
      rows: Option[Long],
      jn: (String, String) => Option[Long] = (_, _) => None,
      na: Seq[String] => Option[Long] = _ => None): FileClass = {
    // per cond column: entirely-failing wins (zero matches — skippable
    // even when another column is only partial), then partial, then
    // all-inside. Internal-domain bounds kept per column for the
    // extremum slots.
    var outside = false
    var partial = false
    val colB = scala.collection.mutable.Map.empty[String, (Any, Any)]
    ivs.foreach { iv =>
      if (!outside && iv.wantNull) {
        // IS NULL: the file's exact null count is rows − nonNull when
        // both are known — no nulls proves outside; unknown scans
        (rows, nn(iv.name)) match {
          case (Some(r), Some(n)) => if (n >= r) outside = true
          case _ => partial = true
        }
      } else if (!outside) mm(iv.name) match {
        case None => partial = true
        case Some(None) => outside = true // all-null: every row fails
        case Some(Some((mnS, mxS))) =>
          (for {
            mn <- GraftStats.internalOf(mnS, iv.dt)
            mx <- GraftStats.internalOf(mxS, iv.dt)
          } yield (mn, mx)) match {
            case None => partial = true
            case Some((mn, mx)) =>
              val ord = TypeUtils.getInterpretedOrdering(iv.dt)
              // a range FAILS the file when no value in [mn, mx] can
              // satisfy it; it COVERS the file when every value does
              def failsR(r: Rng): Boolean =
                r._1.exists { case (v, st) =>
                  if (st) ord.lteq(mx, v) else ord.lt(mx, v) } ||
                r._2.exists { case (v, st) =>
                  if (st) ord.gteq(mn, v) else ord.gt(mn, v) }
              def coversR(r: Rng): Boolean =
                r._1.forall { case (v, st) =>
                  if (st) ord.gt(mn, v) else ord.gteq(mn, v) } &&
                r._2.forall { case (v, st) =>
                  if (st) ord.lt(mx, v) else ord.lteq(mx, v) }
              // a clause (union of ranges) fails when EVERY disjunct
              // fails; the column is fully inside when every clause has
              // a SINGLE covering disjunct (a union covering [mn, mx]
              // only piecewise stays conservative: partial → scan)
              if (iv.clauses.exists(cl => cl.forall(failsR)))
                outside = true
              else if (iv.clauses.forall(cl => cl.exists(coversR)))
                colB(iv.name) = (mn, mx)
              else partial = true
          }
      }
    }
    if (outside) return Outside
    if (partial) return Boundary
    // ALL cond columns fully inside: matching rows = rows non-null in
    // every cond column. With per-column non-null counts and the file's
    // live rows, that composes EXACTLY when at most one cond column
    // carries nulls (two nullable columns can overlap arbitrarily —
    // boundary).
    val contrib: Option[Inside] = for {
      r <- rows
      nns <- {
        val per = ivs.map(iv => nn(iv.name).map(iv.name -> _))
        if (per.forall(_.isDefined)) Some(per.map(_.get).toMap) else None
      }
      nullable = ivs.map(_.name).filter(n => nns(n) < r)
      matchCnt <- {
        val wn = ivs.filter(_.wantNull)
        if (wn.nonEmpty) {
          // ONE IS NULL column (the rule gates the shape; COUNT-family
          // slots only): matching rows are its null rows that are
          // NON-null in every range column — the range comparisons drop
          // nulls. With no nullable range column that is exactly the
          // null count; ONE nullable range column composes through the
          // joint-null stat (nulls(w) − bothNull(w, c)); more decline.
          if (wn.size != 1 || sumCols.nonEmpty || extCols.nonEmpty) None
          else {
            val w = wn.head.name
            val nullsW = r - nns(w)
            // rows null in >= 1 column of a nullable-range set R —
            // pairwise by inclusion-exclusion, larger sets from the
            // per-set ANALYZE stat
            def nullAnyOf(set: Seq[String]): Option[Long] = set match {
              case Seq(c1, c2) =>
                jn(c1, c2).map(j => (r - nns(c1)) + (r - nns(c2)) - j)
              case _ => na(set)
            }
            ivs.filterNot(_.wantNull).map(_.name)
              .filter(n => nns(n) < r) match {
              case Seq() => Some(nullsW)
              case Seq(c) => jn(w, c).map(j => nullsW - j)
              // TWO-plus nullable range columns: matching = |w null ∧
              // every R column non-null| = nullAny(R ∪ {w}) − nullAny(R)
              // (the rows the union gains over R alone are exactly the
              // w-null rows with every R column non-null)
              case more => for {
                naAll <- na(w +: more)
                naR <- nullAnyOf(more)
              } yield naAll - naR
            }
          }
        } else {
          // THREE-plus nullable cond columns (and the two-nullable case
          // when the pair stat is missing) compose through the per-SET
          // null-any ANALYZE stat: matching = rows non-null in EVERY
          // cond column = rows − nullAny(set). Valid for any recorded
          // set that covers the nullable columns and stays within the
          // cond columns (a cond column with zero nulls in this file
          // adds nothing to nullAny) — try the full cond set, then the
          // file's nullable subset.
          def naLookup: Option[Long] = {
            val full = ivs.map(_.name)
            na(full)
              .orElse(if (nullable.size != full.size) na(nullable) else None)
              .map(cnt => r - cnt)
          }
          nullable match {
            case Seq() => Some(r)
            case Seq(one) => Some(nns(one))
            // TWO nullable cond columns compose by inclusion-exclusion
            // when ANALYZE recorded their joint null count: matching =
            // rows non-null in both = nnA + nnB - rows + bothNull
            case Seq(x, y) =>
              jn(x, y).map(j => nns(x) + nns(y) - r + j).orElse(naLookup)
            case _ => naLookup
          }
        }
      }
      // a slot column may ride the metadata only when matching rows =
      // all rows, or = exactly the rows its OWN column is non-null in
      // (then SUM/MIN/MAX skip the same nulls the filter drops)
      slotOk = (c: String) => nullable.isEmpty || nullable == Seq(c)
      sums <- {
        val per = sumCols.map { c =>
          if (!slotOk(c.name)) None
          else for {
            sv <- sumOf(c.name)
            nnc <- sumNn(c.name)
          } yield (c.name, sv, nnc)
        }
        if (per.forall(_.isDefined)) Some(per.map(_.get)) else None
      }
      exts <- {
        val per: Seq[Option[Option[(String, Boolean, Any)]]] =
          extCols.map { e =>
            if (!slotOk(e.name)) None
            else colB.get(e.name) match {
              case Some((mn, mxv)) =>
                Some(Some((e.name, e.takeMax, if (e.takeMax) mxv else mn)))
              case None => mm(e.name) match {
                case None => None
                case Some(None) => Some(None) // all-null: no value
                case Some(Some((mnS, mxS))) =>
                  GraftStats.internalOf(if (e.takeMax) mxS else mnS, e.dt)
                    .map(v => Some((e.name, e.takeMax, v)))
              }
            }
          }
        if (per.forall(_.isDefined)) Some(per.flatMap(_.get)) else None
      }
    } yield Inside(matchCnt, sums, exts)
    contrib.getOrElse(Boundary)
  }

  /** One group's inside totals. */
  final case class Grp(
      cnt: Long,
      sums: Map[String, (BigDecimal, Long)],
      exts: Map[(String, Boolean), Any]) extends Serializable

  val emptyGrp: Grp = Grp(0L, Map.empty, Map.empty)

  /** The walk's accumulated result, PER GROUP (the global walk is the
    * one-group case with the empty key) — mergeable across executors
    * (`boundary` keys and `away` count travel; the inside contributions
    * stay aggregated; group count is bounded by the partition census). */
  final case class Agg(
      groups: Map[Seq[Any], Grp],
      boundary: Vector[String],
      away: Long) extends Serializable

  val emptyAgg: Agg = Agg(Map.empty, Vector.empty, 0L)

  private def mergeExts(extCols: Seq[ExtS],
      a: Map[(String, Boolean), Any], b: Map[(String, Boolean), Any])
      : Map[(String, Boolean), Any] = {
    val dtOf = extCols.map(e => (e.name, e.takeMax) -> e.dt).toMap
    (a.keySet ++ b.keySet).iterator.map { k =>
      val v = (a.get(k), b.get(k)) match {
        case (Some(x), None) => x
        case (None, Some(y)) => y
        case (Some(x), Some(y)) =>
          val ord = TypeUtils.getInterpretedOrdering(dtOf(k))
          if (k._2) (if (ord.gteq(x, y)) x else y)
          else (if (ord.lteq(x, y)) x else y)
        case (None, None) => throw new IllegalStateException("unreachable")
      }
      k -> v
    }.toMap
  }

  private def mergeGrp(extCols: Seq[ExtS], a: Grp, b: Grp): Grp =
    Grp(
      a.cnt + b.cnt,
      (a.sums.keySet ++ b.sums.keySet).iterator.map { n =>
        val (s0, c0) = a.sums.getOrElse(n, (BigDecimal(0), 0L))
        val (s1, c1) = b.sums.getOrElse(n, (BigDecimal(0), 0L))
        n -> (s0 + s1, c0 + c1)
      }.toMap,
      mergeExts(extCols, a.exts, b.exts))

  /** Fold one file's classification under its group key (Seq.empty for
    * the global walk). */
  def fold(extCols: Seq[ExtS], a: Agg, fk: String, key: Seq[Any],
      fc: FileClass): Agg =
    fc match {
      case Outside => a.copy(away = a.away + 1)
      case Boundary => a.copy(boundary = a.boundary :+ fk)
      // ZERO matching rows contribute NOTHING — registering the group
      // would emit a phantom (key, COUNT 0) row where SQL emits no group
      // at all. Reachable via the two-nullable inclusion-exclusion
      // (disjoint non-null sets: nnA + nnB − rows + bothNull = 0); such a
      // file can carry no sums/exts (slotOk is false with two nullables),
      // and dropping any is semantically right regardless: no row
      // matches, so nothing may contribute. The GLOBAL walk reads its
      // group via getOrElse(emptyGrp), so the missing entry still answers
      // COUNT = 0 there (the correct global answer).
      case Inside(0L, _, _) => a.copy(away = a.away + 1)
      case Inside(m, sums, exts) =>
        val g = Grp(m,
          sums.map { case (n, sv, nnc) => n -> (sv, nnc) }.toMap,
          exts.map { case (n, mx, v) => (n, mx) -> v }.toMap)
        a.copy(
          groups = a.groups.updated(key,
            mergeGrp(extCols, a.groups.getOrElse(key, emptyGrp), g)),
          away = a.away + 1)
    }

  /** Re-key the walk's groups through a derived-key function (raw
    * underlying partition values → derived group key), merging raw keys
    * that derive equal — the grouped boundary's `GROUP BY year(day)` /
    * `GROUP BY day % 3` path, where one derived group spans several
    * partition dirs. Cost is bounded by the raw group count (≤ the
    * partition census). */
  def deriveGroups(extCols: Seq[ExtS], a: Agg, f: Seq[Any] => Seq[Any]): Agg =
    a.copy(groups = a.groups.toSeq.groupBy { case (raw, _) => f(raw) }
      .map { case (k, gs) =>
        k -> gs.map(_._2).reduce(mergeGrp(extCols, _, _))
      })

  def merge(extCols: Seq[ExtS], a: Agg, b: Agg): Agg =
    Agg(
      (a.groups.keySet ++ b.groups.keySet).iterator.map { k =>
        k -> mergeGrp(extCols, a.groups.getOrElse(k, emptyGrp),
          b.groups.getOrElse(k, emptyGrp))
      }.toMap,
      a.boundary ++ b.boundary,
      a.away + b.away)

  /** Classify one file from its RAW manifest/checkpoint ingredients —
    * the adapter both the executor-side checkpoint walk and the
    * driver-side added-files pass feed [[classify]] through. Replicates
    * the GraftFileIndex hook contracts exactly:
    *  - partition columns answer from the path segments (min = max =
    *    value; the hive null dir is all-null) — VALID under DV marks;
    *  - data columns answer from ColStat under the same refusal rules as
    *    fileMinMaxOf / fileNonNullOf / fileSumOf (DV-marked files answer
    *    nothing; inexact/truncated bounds answer nothing; allNulls is a
    *    valid "no rows match" answer);
    *  - live rows = manifest rows minus DV-marked rows.
    *
    * @param neededPart (logical name, physical dir name, type) for every
    *                   referenced PARTITION column
    * @param zone       session zone for partition value casts
    * @param groupPart  (logical, physical, type) of the GROUP BY
    *                   partition columns — the returned key is the file's
    *                   internal partition values in this order (empty for
    *                   the global walk)
    */
  def classifyFromStats(path: String, rowsOpt: Option[Long],
      stats: Map[String, graft.sources.DataSkipping.ColStat],
      dvMarkedRows: Long,
      neededPart: Seq[(String, String, DataType)], zone: Option[String],
      ivs: Seq[IvS], sumCols: Seq[SumS], extCols: Seq[ExtS],
      groupPart: Seq[(String, String, DataType)] = Nil)
      : (FileClass, Seq[Any]) = {
    val marked = dvMarkedRows > 0L
    val liveRows: Option[Long] = rowsOpt.map(_ - dvMarkedRows)
    // a ZERO-ROW file is vacuously outside any range — its empty stats
    // map (parquet writes no column chunks) is not "unknown"
    if (liveRows.contains(0L))
      return (Outside, groupPart.map(_ => null))
    // hive-style segments: token dirs never contain '='
    lazy val kv: Map[String, String] = path.split('/').dropRight(1)
      .flatMap { seg =>
        val i = seg.indexOf('=')
        if (i > 0) Some(seg.substring(0, i) -> seg.substring(i + 1)) else None
      }.toMap
    // logical name -> Some(internal value) | None (hive null dir)
    val partVals: Map[String, Option[Any]] = neededPart.map {
      case (n, phys, dt) =>
        n -> (kv.get(phys).filterNot(_ == "__HIVE_DEFAULT_PARTITION__")
          .flatMap { raw =>
            Option(graft.sources.DataSkipping.castPartValue(
              org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .unescapePathName(raw), dt, zone))
          })
    }.toMap
    def mmC(c: String): Option[Option[(Any, Any)]] =
      partVals.get(c) match {
        case Some(None) => Some(None) // null partition value: all-null col
        case Some(Some(v)) =>
          statDomainOf(v).map(sd => Some((sd, sd)))
        case None =>
          if (marked) None
          else stats.get(c) match {
            case None => None
            case Some(st) if st.allNulls => Some(None)
            case Some(st)
                if st.min.isEmpty || st.max.isEmpty || st.inexact => None
            case Some(st) => Some(Some((st.min.get, st.max.get)))
          }
      }
    def nnC(c: String): Option[Long] =
      partVals.get(c) match {
        case Some(None) => Some(0L)
        case Some(Some(_)) => liveRows
        case None =>
          if (marked) None
          else for {
            r <- rowsOpt
            st <- stats.get(c)
            if st.allNulls || (st.min.isDefined && st.max.isDefined)
          } yield if (st.allNulls) 0L else r - st.numNulls
      }
    def sumC(c: String): Option[BigDecimal] =
      if (marked) None else stats.get(c).flatMap(_.sum)
    def jnC(a: String, b: String): Option[Long] =
      if (marked) None
      else {
        val (x, y) = if (a <= b) (a, b) else (b, a)
        stats.get(x).flatMap(_.jointNulls.get(y))
      }
    def naC(set: Seq[String]): Option[Long] =
      if (marked || set.size < 3) None
      else {
        val s = set.sorted
        stats.get(s.head).flatMap(_.nullAny.get(s.tail.mkString(",")))
      }
    val key: Seq[Any] = groupPart.map { case (_, phys, dt) =>
      kv.get(phys).filterNot(_ == "__HIVE_DEFAULT_PARTITION__")
        .map(raw => graft.sources.DataSkipping.castPartValue(
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(raw), dt, zone)).orNull
    }
    (classify(ivs, sumCols, extCols, mmC, nnC, sumC, nnC, liveRows, jnC,
      naC), key)
  }

  /** Catalyst-internal partition value → the stats comparison domain
    * (BigDecimal for numerics/date-days/timestamp-micros, String for
    * strings) — the same domain footer stats live in, so partition and
    * data bounds compare under one ordering. None declines (booleans,
    * binaries — nothing orderable to prune on). Shared by
    * GraftFileIndex's driver hooks and the distributed walk. */
  def statDomainOf(v: Any): Option[Any] = v match {
    case i: java.lang.Integer => Some(BigDecimal(i.intValue()))
    case l: java.lang.Long => Some(BigDecimal(l.longValue()))
    case s: java.lang.Short => Some(BigDecimal(s.intValue()))
    case b: java.lang.Byte => Some(BigDecimal(b.intValue()))
    case d: org.apache.spark.sql.types.Decimal =>
      Some(BigDecimal(d.toJavaBigDecimal))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    // BigDecimal.valueOf round-trips doubles exactly (Double.toString);
    // NaN/Infinity have no BigDecimal image — DECLINE (mirrors
    // DataSkipping.statValue's isFinite gate) instead of throwing at
    // plan time on a NaN double partition value
    case db: java.lang.Double =>
      if (java.lang.Double.isFinite(db.doubleValue()))
        Some(BigDecimal(db.doubleValue())) else None
    case f: java.lang.Float =>
      if (java.lang.Float.isFinite(f.floatValue()))
        Some(BigDecimal(f.floatValue().toDouble)) else None
    case _ => None
  }
}
