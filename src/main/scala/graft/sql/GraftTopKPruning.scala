package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim

/** TOP-K FILE PRUNING from manifest bounds — `ORDER BY c LIMIT k` over a
  * graft table scans only the files that can still contribute to the
  * answer. The manifest holds, per file, the column's exact min/max and
  * its exact non-null value count; sorting files by their BOUND (min for
  * DESC, max for ASC) and taking the shortest prefix whose non-null
  * counts sum to ≥ k proves a threshold τ with "at least k non-null
  * values sit past τ" — so every row of the global top-k lies past τ,
  * and the rule injects `c >= τ` (DESC) / `c <= τ` (ASC) below the Sort.
  * Spark's own pushdown carries the conjunct into the scan, where
  * manifest data skipping drops whole files and parquet row-group
  * pruning drops pages inside the survivors. On a 100 TB time-ordered
  * fact, `ORDER BY ts DESC LIMIT 100` falls from "read everything, keep
  * a k-heap per task" to "read the newest file or two" — the same
  * manifest arithmetic a LIMIT-pushdown in a native engine does, framed
  * so Catalyst's TakeOrderedAndProject still runs unchanged on top.
  *
  * SOUNDNESS. The injected filter keeps a SUPERSET of every possible
  * top-k selection, for all four direction/null-order combos:
  *  - the prefix proof gives ≥ k non-null values past τ, so the k-th
  *    most extreme value v_k is past τ, and every selectable non-null
  *    row (ties included) is past v_k, hence past τ;
  *  - NULLS LAST: nulls can only be selected when fewer than k non-null
  *    rows exist, which the proof excludes — dropping them is safe;
  *  - NULLS FIRST: nulls sort ahead and must survive, so the conjunct
  *    widens to `cmp OR c IS NULL` (files that are all-null on c keep
  *    their stats-pruner exemption: a numNulls > 0 file never prunes on
  *    a null-tolerant predicate).
  * The Sort + Limit stay in the plan and recompute the exact top-k over
  * the filtered rows — the rule never changes semantics, only input.
  *
  * EXACT-OR-DECLINE posture: only files whose manifest stats answer
  * exactly (no DV marks, no truncated bounds, footer null counts set)
  * participate in the prefix proof — opaque files are simply never
  * counted and never pruned. PARTITION columns participate through their
  * path values (exact min = max per file, live rows as the non-null
  * count) — `ORDER BY day DESC LIMIT k` over a date-partitioned table
  * prunes whole DIRECTORIES via the ordinary partition-filter path.
  * A Filter between Sort and scan participates ONLY when every conjunct
  * binds to partition columns (the census walk — the predicate is then
  * file-constant, so the surviving file set is exact and the prefix
  * proof runs on it: `WHERE day >= d ORDER BY ts DESC LIMIT k` prunes).
  * Declines: any data-column conjunct (its selectivity would invalidate
  * the count — and the decline doubles as fixpoint idempotence, since
  * the rule's own injection is exactly such a conjunct; a partition-
  * column injection instead converges via the profitability check, which
  * finds no surviving entirely-past file on revisit), non-attribute sort
  * keys, fewer than k provable non-null values, and thresholds that
  * would not prune any file (zero plan churn on un-clustered data). Per-(column, k, direction) results memoize on the
  * relation's stats closure, so the optimizer fixpoint re-visits cost
  * O(1). Disable with `spark.graft.topk.enabled=false`. */
case class GraftTopKPruning(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.topk.enabled", "true").toBoolean

  /** Memo: stats-closure → (column, k, desc) → injectable bound in the
    * stats domain (None = proved undecidable/unprofitable; null ordering
    * does not change the THRESHOLD, only the conjunct's shape). Weakly
    * keyed so entries die with their snapshot relation. */
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef,
      scala.collection.concurrent.TrieMap[(String, Int, Boolean), Option[Any]]]())

  /** LAZY-STATS dispatch: on a checkpoint-anchored table whose stats map
    * is not already paid for, the per-file hooks must NOT iterate on the
    * driver — the prefix proof runs DISTRIBUTED over the checkpoint
    * parquet instead ([[GraftFileIndex.topkDistThreshold]]), and shapes
    * the distributed walk cannot express decline rather than force. */
  private def driverCheap(leaf: LogicalPlan): Boolean =
    GraftBatchShim.graftStatsDriverCheap(leaf).getOrElse(true)

  /** [[thresholdOf]] behind the dispatch: driver walk when the stats are
    * already driver-resident, distributed walk otherwise (`partConds`
    * carry the census's bound partition filters — evaluated executor-side
    * from each file's path values, selecting the same file population as
    * the driver's pre-filtered census entries). Stats-domain result. */
  private def thresholdVia(leaf: LogicalPlan, files: Seq[String],
      mm: (String, String) => Option[Option[(Any, Any)]],
      nn: (String, String) => Option[Long],
      column: String, k: Int, desc: Boolean,
      partConds: Seq[Expression]): Option[Any] =
    if (driverCheap(leaf)) thresholdOf(files, mm, nn, column, k, desc)
    else GraftBatchShim.graftTopkDistOf(leaf)
      .flatMap(d => d(column, k, desc, Nil, partConds))

  /** [[sortColThreshold]] behind the same dispatch; internal-domain
    * bounds convert to the stats domain for the distributed walk (the two
    * domains are order-isomorphic — the premise of all stats pruning) and
    * the stats-domain tau converts back. Internal-domain result. */
  private def sortColThresholdVia(leaf: LogicalPlan, files: Seq[String],
      mm: (String, String) => Option[Option[(Any, Any)]],
      nn: (String, String) => Option[Long],
      column: String, dt: org.apache.spark.sql.types.DataType,
      k: Int, desc: Boolean, bounds: Seq[(Any, Boolean)],
      partConds: Seq[Expression]): Option[Any] =
    if (driverCheap(leaf))
      sortColThreshold(files, mm, nn, column, dt, k, desc, bounds)
    else for {
      d <- GraftBatchShim.graftTopkDistOf(leaf)
      sb <- traverseOpt(bounds.map { case (v, s) =>
        BoundaryWalk.statDomainOf(v).map((_, s)) })
      t <- d(column, k, desc, sb, partConds)
      ti <- GraftStats.internalOf(t, dt)
    } yield ti

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case g @ GlobalLimit(IntegerLiteral(k),
          ll @ LocalLimit(IntegerLiteral(k2), inner)) if k == k2 && k > 0 =>
        val rewritten = inner match {
          case s: Sort => prune(s, k).map(ns => ll.copy(child = ns))
          case p @ Project(_, s: Sort) =>
            prune(s, k).map(ns => ll.copy(child = p.copy(child = ns)))
          case _ => None
        }
        rewritten.fold(g: LogicalPlan)(nc => g.copy(child = nc))
      case f @ Filter(cond, w: Window) =>
        windowPrune(cond, w).fold(f: LogicalPlan)(nw => f.copy(child = nw))
    }
  }

  /** WINDOW GROUP-LIMIT file pruning — the per-group twin of the Limit
    * case: `ROW_NUMBER() OVER (PARTITION BY day ORDER BY ts DESC) <= k`
    * ("the latest k per day") proves a threshold PER WINDOW GROUP when
    * the window partitions by the table's PARTITION columns: the census
    * hands each group its member files, the same shortest-prefix
    * arithmetic proves τ_g, and the injected predicate is the OR over
    * groups of `part <=> v_g AND ts >= τ_g` (groups with no provable
    * threshold keep their bare group disjunct — never lost, never
    * pruned). Data skipping evaluates the OR per file — the group
    * equalities via path-synthesized partition stats — so each directory
    * keeps only the files that can still hold its own top k. RANK is
    * accepted too (rank ≤ k rows are always within the k-by-multiplicity
    * prefix); DENSE_RANK needs a DISTINCT threshold (its k-th distinct
    * value can sit past the count-based one) and gets it from the
    * ANALYZE sketches' sound distinct LOWER bounds
    * ([[distinctThresholdOf]]) — un-analyzed tables decline. The single
    * window expression must BE the
    * ranking (any other window aggregate would be computed over the
    * filtered rows — wrong). Group count caps at
    * `spark.graft.topk.windowGroupCap` (default 64) to bound predicate
    * width. */
  private def windowPrune(cond: Expression, w: Window): Option[Window] = {
    // exactly one window expression: the rank the filter bounds.
    // ROW_NUMBER/RANK run the COUNT-based prefix proof; DENSE_RANK runs
    // the DISTINCT one (sketch-hash lower bounds — see
    // distinctThresholdOf); anything else declines
    val (rankId, fnKind) = w.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(fn, _), _)) =>
        (al.exprId, fn match {
          case _: org.apache.spark.sql.catalyst.expressions.RowNumber |
               _: org.apache.spark.sql.catalyst.expressions.Rank => 1
          case _: org.apache.spark.sql.catalyst.expressions.DenseRank => 2
          case _ => 0
        })
      case _ => return None
    }
    if (fnKind == 0) return None
    val k = splitConj(cond).collectFirst {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(n))
          if a.exprId == rankId => n
      case LessThan(a: AttributeReference, IntegerLiteral(n))
          if a.exprId == rankId => n - 1
      case EqualTo(a: AttributeReference, IntegerLiteral(n))
          if a.exprId == rankId => n
      case GreaterThanOrEqual(IntegerLiteral(n), a: AttributeReference)
          if a.exprId == rankId => n
    }.getOrElse(return None)
    if (k < 1) return None
    val (oc, dir, nullOrd) = w.orderSpec match {
      case SortOrder(a: AttributeReference, d, no, _) +: _ => (a, d, no)
      case _ => return None
    }
    val desc = dir == Descending
    if (w.partitionSpec.isEmpty) {
      // the empty-partition window is the one global group over every
      // live file — same proof as the Limit case, injected below the
      // Window (revisit declines: scanOf refuses the injected Filter)
      val (files, mm, nn, names, gLeaf) = scanOf(w.child).getOrElse(return None)
      val ocName = names.get(oc.exprId).getOrElse(return None)
      val tauStat =
        if (fnKind == 2) {
          // DENSE_RANK's distinct prefix: driver walk when the stats are
          // already paid for, otherwise the DISTRIBUTED distinct-prefix
          // walk over the checkpoint (per-partition minimal >= k-distinct
          // prefixes, driver re-walk — provably the same tau)
          if (driverCheap(gLeaf))
            GraftBatchShim.topkNdvHashesOf(gLeaf).flatMap(h =>
              distinctThresholdOf(files, mm, h, ocName, oc.dataType, k, desc))
          else GraftBatchShim.graftTopkDistinctDistOf(gLeaf)
            .flatMap(d => d(ocName, k, desc,
              oc.dataType == org.apache.spark.sql.types.BinaryType, None, 1))
            .flatMap(_.headOption.flatten)
        }
        else thresholdVia(gLeaf, files, mm, nn, ocName, k, desc, Nil)
      val tau = tauStat
        .flatMap(GraftStats.internalOf(_, oc.dataType)).getOrElse(return None)
      val cmp: Expression =
        if (desc) GreaterThanOrEqual(oc, Literal(tau, oc.dataType))
        else LessThanOrEqual(oc, Literal(tau, oc.dataType))
      val keep = if (nullOrd == NullsFirst) Or(cmp, IsNull(oc)) else cmp
      return Some(w.copy(child = Filter(keep, w.child)))
    }
    // PARTITIONED window: the census walk accepts partition-only filters
    // below the window (entries pre-filtered exactly — file-constant
    // predicates cost no selectivity guess) and DERIVED window keys
    // (`PARTITION BY year(day)` — bound over the census tuple). Group
    // predicates and thresholds are injected at the LEAF, where every
    // partition column still exists by name.
    import PartitionCensus.{censusOf, liveEntries, bindPart}
    val info = censusOf(w.child).getOrElse(return None)
    // anchored-unforced: PARTITION sort columns never touch the stats map
    // (bounds/counts/per-value sketch tokens synthesize from paths +
    // fileRows). A DATA sort column dispatches to TWO distributed
    // checkpoint jobs — the per-group prefix proofs (count-based, or the
    // DENSE_RANK distinct-prefix walk), then the fire guard aggregation
    // against the proven taus — so the stats map never materializes
    // driver-side.
    val distMode =
      !driverCheap(info.leaf) && info.dataColOf.contains(oc.exprId)
    val (_, mm, nn) = GraftBatchShim.topkStatsOf(info.leaf).getOrElse(return None)
    val ocName = info.dataColOf.get(oc.exprId)
      .orElse(info.idxOf.get(oc.exprId).map(info.partSchema.fieldNames(_)))
      .getOrElse(return None)
    def leafAttr(name: String): Option[AttributeReference] =
      info.leaf.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }
    val ocLeaf = leafAttr(ocName).getOrElse(return None)
    // classify each window partition expr: a plain partition attribute
    // gets an EXACT per-group equality; a derived value gets RANGE bounds
    // over the partition columns it reads (sound: every member row's
    // values lie inside its group's observed per-column range — overlap
    // with other groups only widens the kept set, never loses a row)
    sealed trait Key
    case class Exact(i: Int) extends Key
    case class Derived(bound: Expression) extends Key
    val keys: Seq[Key] = w.partitionSpec.map {
      case a: AttributeReference if info.idxOf.contains(a.exprId) =>
        Exact(info.idxOf(a.exprId))
      case a: AttributeReference if info.derivedOf.contains(a.exprId) =>
        Derived(info.derivedOf(a.exprId))
      case e if e.references.nonEmpty =>
        bindPart(e, info).map(Derived(_)).getOrElse(return None)
      case _ => return None
    }
    val cap = spark.sessionState.conf
      .getConfString("spark.graft.topk.windowGroupCap", "64").toInt
    val fields = info.partSchema.fields
    def valueAt(row: org.apache.spark.sql.catalyst.InternalRow, i: Int): Any =
      if (row.isNullAt(i)) null else row.get(i, fields(i).dataType)
    val entries = liveEntries(info)
    val groups = entries.groupBy { case (row, _, _) =>
      keys.map { case Exact(i) => valueAt(row, i)
                 case Derived(b) => b.eval(row) }
    }.toSeq
    if (groups.isEmpty || groups.size > cap) return None
    val ndvH: Option[(String, String) => Option[(Seq[String], Int)]] =
      if (fnKind == 2) {
        val h = GraftBatchShim.topkNdvHashesOf(info.leaf)
        if (h.isEmpty) return None
        h
      } else None
    val taus: Seq[(Seq[(org.apache.spark.sql.catalyst.InternalRow, Long,
        Seq[String])], Option[Any], Option[Any])] =
      if (distMode) {
        // anchored: ONE checkpoint job proves every group's tau — the
        // census already knows each dir's group (partition-level), so
        // executors just route files by dir and keep O(k) per group
        // (the DENSE_RANK distinct-prefix walk for fnKind 2)
        val dirGroup: Map[String, Int] = groups.zipWithIndex.flatMap {
          case ((_, ents), gi) =>
            ents.map(e => DistStats.partDirOf(e._3.head) -> gi)
        }.toMap
        val arr =
          if (fnKind == 2)
            GraftBatchShim.graftTopkDistinctDistOf(info.leaf)
              .flatMap(d => d(ocName, k, desc,
                oc.dataType == org.apache.spark.sql.types.BinaryType,
                Some(dirGroup), groups.size))
              .getOrElse(return None)
          else GraftBatchShim.graftTopkGroupDistOf(info.leaf)
            .flatMap(h => h(ocName, k, desc, dirGroup, groups.size))
            .getOrElse(return None)
        groups.zipWithIndex.map { case ((_, ents), gi) =>
          (ents, arr(gi), arr(gi).flatMap(GraftStats.internalOf(_, oc.dataType)))
        }
      } else groups.map { case (_, ents) =>
        val fs = ents.flatMap(_._3)
        val tauStat =
          if (fnKind == 2)
            distinctThresholdOf(fs, mm, ndvH.get, ocName, oc.dataType, k, desc)
          else thresholdOf(fs, mm, nn, ocName, k, desc)
        (ents, tauStat, tauStat.flatMap(GraftStats.internalOf(_, oc.dataType)))
      }
    if (taus.forall(_._3.isEmpty)) return None // nothing prunes anywhere
    // FIRE GUARD (fixpoint + profitability): DERIVED keys emit RANGE
    // bounds that can overlap other groups and re-admit entries entirely
    // past their own group's tau, so thresholdOf's per-group
    // profitability alone is not enough — when the injected predicate is
    // partition-only, the revisit still binds the census, proves the
    // same thresholds, and would inject an identical Filter every
    // optimizer iteration until maxIterations. Evaluate the disjunction
    // over the live census FILES on the driver and decline unless at
    // least one file is eliminated. A partition-column sort key
    // evaluates EXACTLY (and is constant per entry, so elimination is
    // whole-entry — the pre-filtered census strictly shrinks per fire:
    // termination); a data-column tau admits a file when it could hold a
    // surviving row (min/max overlap, unprovable stats, possible entry
    // nulls under NULLS FIRST) — conservative in the DECLINING
    // direction, and that branch's injected conjunct fails the census
    // walk on revisit anyway.
    // group admission is PARTITION-level only (exact key equality, or
    // membership in a derived key's observed per-column ranges) — shared
    // by the driver guard's per-file loop and the distributed guard's
    // per-dir effective-tau computation
    def keysAdmit(gents: Seq[(org.apache.spark.sql.catalyst.InternalRow,
        Long, Seq[String])], e: (org.apache.spark.sql.catalyst.InternalRow,
        Long, Seq[String])): Boolean =
      keys.forall {
        case Exact(i) =>
          java.util.Objects.equals(valueAt(gents.head._1, i),
            valueAt(e._1, i))
        case Derived(b) =>
          b.collect { case br: BoundReference => br.ordinal }.distinct
            .forall { i =>
              val dt = fields(i).dataType
              val gvs = gents.map(_._1).filterNot(_.isNullAt(i))
                .map(_.get(i, dt))
              val gHasNull = gents.exists(_._1.isNullAt(i))
              if (e._1.isNullAt(i)) gHasNull
              else if (gvs.isEmpty) false
              else {
                val vOrd = org.apache.spark.sql.catalyst.util.TypeUtils
                  .getInterpretedOrdering(dt)
                val v = e._1.get(i, dt)
                vOrd.gteq(v, gvs.min(vOrd)) && vOrd.lteq(v, gvs.max(vOrd))
              }
            }
      }
    // the kept-rows disjunction — one disjunct per group: its key
    // predicate (exact equality, or the observed ranges of a derived
    // key's inputs) AND its tau comparison when proven
    val disjuncts: Seq[Expression] = taus.map { case (ents, _, tau) =>
      val groupPreds: Seq[Expression] = keys.flatMap {
        case Exact(i) =>
          // constant within the group by construction (it IS a group key)
          Seq(EqualNullSafe(leafAttr(fields(i).name).getOrElse(return None),
            Literal(valueAt(ents.head._1, i), fields(i).dataType)))
        case Derived(b) =>
          // per referenced partition column: the group's observed range
          b.collect { case br: BoundReference => br.ordinal }.distinct
            .map { i =>
              val dt = fields(i).dataType
              val la = leafAttr(fields(i).name).getOrElse(return None)
              val vs = ents.map(_._1).filterNot(_.isNullAt(i))
                .map(_.get(i, dt))
              val hasNull = ents.exists(_._1.isNullAt(i))
              if (vs.isEmpty) IsNull(la): Expression
              else {
                val ord = org.apache.spark.sql.catalyst.util.TypeUtils
                  .getInterpretedOrdering(dt)
                val rng = And(
                  GreaterThanOrEqual(la, Literal(vs.min(ord), dt)),
                  LessThanOrEqual(la, Literal(vs.max(ord), dt)))
                if (hasNull) Or(rng, IsNull(la)) else rng
              }
            }
      }
      val keep = tau.map { t =>
        val cmp: Expression =
          if (desc) GreaterThanOrEqual(ocLeaf, Literal(t, ocLeaf.dataType))
          else LessThanOrEqual(ocLeaf, Literal(t, ocLeaf.dataType))
        if (nullOrd == NullsFirst) Or(cmp, IsNull(ocLeaf)) else cmp
      }
      (groupPreds ++ keep.toSeq).reduceOption[Expression](And)
        .getOrElse(return None) // a keyless group cannot happen here
    }
    if (distMode) {
      // anchored fire guard + pruning: per-dir survival facts aggregate
      // in ONE checkpoint job against each dir's EFFECTIVE tau — the
      // weakest tau among its admitting groups (an admitting group
      // without a provable tau keeps everything); un-admitted dirs
      // survive nowhere. Conservative in the KEEPING direction
      // (unprovable stats survive, possible nulls under NULLS FIRST keep
      // the whole dir). The scan then RESTRICTS to the surviving files —
      // Spark's scan pushdown weakens a mixed `(day <=> d AND ts >=
      // tau_d) OR …` into separate partition-only and data-only
      // disjunctions, so predicate injection alone can only prune
      // against min(tau); the restriction applies the per-group
      // conjunction exactly. The injected Filter still trims rows.
      val statOrd = graft.sources.DataSkipping.statOrdering
      val guardHook = GraftBatchShim.graftTopkGroupGuardOf(info.leaf)
        .getOrElse(return None)
      var dirEff = Map.empty[String, Option[Any]]
      entries.foreach { e =>
        val admitted = taus.filter { case (gents, _, _) =>
          keysAdmit(gents, e) }
        if (admitted.nonEmpty) {
          val eff: Option[Any] =
            if (admitted.exists(t => t._2.isEmpty || t._3.isEmpty)) None
            else {
              val ts = admitted.flatMap(_._2)
              Some(if (desc) ts.min(statOrd) else ts.max(statOrd))
            }
          dirEff += DistStats.partDirOf(e._3.head) -> eff
        }
      }
      val agg = guardHook(ocName, desc, dirEff).getOrElse(return None)
      var survivorKeys = Vector.empty[String]
      entries.foreach { e =>
        val dir = DistStats.partDirOf(e._3.head)
        if (dirEff.contains(dir)) agg.get(dir) match {
          // the walk must account for every live file of the dir —
          // anything else is coverage drift: decline, never guess
          case Some(g) if g.files == e._3.size.toLong =>
            val mayNulls = g.nnUnknown || g.nnSum < g.rows
            if (nullOrd == NullsFirst && mayNulls) survivorKeys ++= e._3
            else survivorKeys ++= g.boundsAdmit
          case _ => return None
        }
      }
      val totalFiles = entries.iterator.map(_._3.size).sum
      if (survivorKeys.size >= totalFiles) return None // nothing eliminated
      val subRel = GraftBatchShim
        .restrictScanTo(spark, info.leaf, survivorKeys).getOrElse(return None)
      var replacedLeaf = false
      val restricted = w.child.transformUp {
        case p if (p eq info.leaf) && !replacedLeaf =>
          replacedLeaf = true; subRel
      }
      if (!replacedLeaf) return None
      return injectAtLeaf(restricted, subRel,
        disjuncts.reduce[Expression](Or)).map(nc => w.copy(child = nc))
    }
    val survivorKeys: Seq[String] = {
      val statOrd = graft.sources.DataSkipping.statOrdering
      val ocPartIdx = info.idxOf.get(oc.exprId)
      def tauAdmitsFile(tauStat: Option[Any], tauInt: Option[Any],
          e: (org.apache.spark.sql.catalyst.InternalRow, Long, Seq[String]),
          f: String): Boolean = (tauStat, tauInt) match {
        case (Some(ts), Some(ti)) => ocPartIdx match {
          case Some(i) =>
            val v = valueAt(e._1, i)
            if (v == null) nullOrd == NullsFirst
            else {
              val vOrd = org.apache.spark.sql.catalyst.util.TypeUtils
                .getInterpretedOrdering(oc.dataType)
              if (desc) vOrd.gteq(v, ti) else vOrd.lteq(v, ti)
            }
          case None =>
            val entryMayHaveNulls = {
              val nns = e._3.map(nn(_, ocName))
              nns.exists(_.isEmpty) || nns.flatten.sum < e._2
            }
            (nullOrd == NullsFirst && entryMayHaveNulls) ||
              (mm(f, ocName).flatten match {
                case None => true // unprovable stats: survives
                case Some((mn, mx)) =>
                  if (desc) statOrd.gteq(mx, ts) else statOrd.lteq(mn, ts)
              })
        }
        case _ => true // no provable tau: the group keeps its bare disjunct
      }
      entries.flatMap { e =>
        e._3.filter { f =>
          taus.exists { case (gents, ts, ti) =>
            keysAdmit(gents, e) && tauAdmitsFile(ts, ti, e, f)
          }
        }
      }
    }
    val totalFiles = entries.iterator.map(_._3.size).sum
    if (survivorKeys.size >= totalFiles) return None // would not eliminate any
    // RESTRICT the scan to the surviving files (Spark's pushdown weakens
    // the mixed per-group disjunction — see the distMode comment) and
    // keep the injected Filter for row trimming
    val subRel = GraftBatchShim
      .restrictScanTo(spark, info.leaf, survivorKeys).getOrElse(return None)
    var replacedLeaf = false
    val restricted = w.child.transformUp {
      case p if (p eq info.leaf) && !replacedLeaf =>
        replacedLeaf = true; subRel
    }
    if (!replacedLeaf) return None
    injectAtLeaf(restricted, subRel, disjuncts.reduce[Expression](Or))
      .map(nc => w.copy(child = nc))
  }

  /** Top-k on a DERIVED partition expression: every row of a census entry
    * shares the entry's evaluated key value, so the entry's live-row count
    * IS its non-null-key count when the value is non-null (and 0 when
    * null). The shortest entry prefix by value with ≥ k rows proves τ;
    * the KEPT entries (value past τ, ties included, plus null-valued
    * entries under NULLS FIRST) re-express as RANGE bounds on the
    * underlying partition columns — sound because each kept entry's own
    * values lie inside the observed ranges, and overlap only widens the
    * kept set. Declines when nothing would prune; the injected predicate
    * is partition-only, so the revisit converges by that same check. */
  private def pruneDerivedKey(s: Sort, keyType: org.apache.spark.sql.types.DataType,
      desc: Boolean, nullOrd: NullOrdering, k: Int, child: LogicalPlan,
      info: PartitionCensus.CensusInfo, bound: Expression): Option[Sort] = {
    import org.apache.spark.sql.catalyst.util.TypeUtils
    val entries = PartitionCensus.liveEntries(info)
    if (entries.isEmpty) return None
    val ord = TypeUtils.getInterpretedOrdering(keyType)
    val valued = entries.map(e => (bound.eval(e._1), e))
    val nonNull = valued.filter(_._1 != null)
    val sorted =
      if (desc) nonNull.sortBy(_._1)(ord.reverse) else nonNull.sortBy(_._1)(ord)
    var need = k.toLong
    var tau: Any = null
    val it = sorted.iterator
    while (need > 0 && it.hasNext) {
      val (v, e) = it.next(); need -= e._2; tau = v
    }
    if (need > 0) return None
    val kept = nonNull.filter { case (v, _) =>
      if (desc) ord.gteq(v, tau) else ord.lteq(v, tau)
    }.map(_._2) ++
      (if (nullOrd == NullsFirst) valued.filter(_._1 == null).map(_._2)
       else Nil)
    val idxs = bound.collect { case br: BoundReference => br.ordinal }.distinct
    if (idxs.isEmpty) return None
    val fields = info.partSchema.fields
    // the range form per referenced column, plus its driver-side
    // evaluation — the fire guard must test the WIDENED kept set (ranges
    // can admit entries the exact threshold would not, e.g. day % 3), or
    // a revisit could keep re-proving the same non-pruning predicate
    case class Rng(i: Int, lo: Any, hi: Any, hasNull: Boolean,
      nullOnly: Boolean)
    val rngs: Seq[Rng] = idxs.map { i =>
      val dt = fields(i).dataType
      val vs = kept.map(_._1).filterNot(_.isNullAt(i)).map(_.get(i, dt))
      val hasNull = kept.exists(_._1.isNullAt(i))
      if (vs.isEmpty) Rng(i, null, null, hasNull = true, nullOnly = true)
      else {
        val vOrd = TypeUtils.getInterpretedOrdering(fields(i).dataType)
        Rng(i, vs.min(vOrd), vs.max(vOrd), hasNull, nullOnly = false)
      }
    }
    val widened = entries.count { e =>
      rngs.forall { r =>
        if (e._1.isNullAt(r.i)) r.hasNull
        else if (r.nullOnly) false
        else {
          val vOrd = TypeUtils.getInterpretedOrdering(fields(r.i).dataType)
          val v = e._1.get(r.i, fields(r.i).dataType)
          vOrd.gteq(v, r.lo) && vOrd.lteq(v, r.hi)
        }
      }
    }
    if (widened >= entries.size) return None // nothing would prune
    val preds: Seq[Expression] = rngs.map { r =>
      val dt = fields(r.i).dataType
      val la = info.leaf.output.collectFirst {
        case la: AttributeReference if la.name == fields(r.i).name => la
      }.getOrElse(return None)
      if (r.nullOnly) IsNull(la): Expression
      else {
        val rng = And(
          GreaterThanOrEqual(la, Literal(r.lo, dt)),
          LessThanOrEqual(la, Literal(r.hi, dt)))
        if (r.hasNull) Or(rng, IsNull(la)) else rng
      }
    }
    injectAtLeaf(child, info.leaf, preds.reduce(And))
      .map(nc => s.copy(child = nc))
  }

  /** Rebuild `plan` with `pred` filtered directly above `leaf` (reference
    * identity) — the injection point where every partition column still
    * exists by name. Revisit idempotence: the injected Filter either fails
    * the census walk's bindPart (data-column conjunct) or removes every
    * entirely-past file, failing thresholdOf's profitability check. */
  private def injectAtLeaf(plan: LogicalPlan, leaf: LogicalPlan,
      pred: Expression): Option[LogicalPlan] = {
    var done = false
    val out = plan.transformUp {
      case p if (p eq leaf) && !done => done = true; Filter(pred, p)
    }
    if (done) Some(out) else None
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  /** The Sort with the threshold filter injected below it, when the
    * manifest proves one that prunes — None otherwise. */
  private def prune(s: Sort, k: Int): Option[Sort] = s match {
    case Sort(SortOrder(a: AttributeReference, dir, nullOrd, _) +: _,
        true, child, _) =>
      val desc = dir == Descending
      scanOf(child) match {
        case Some((files, mm, nn, names, leaf)) =>
          val column = names.get(a.exprId).getOrElse(return None)
          // the distributed walk memoizes per shape on the index itself;
          // the WeakHashMap memo covers only the driver walk
          val bound =
            if (!driverCheap(leaf))
              GraftBatchShim.graftTopkDistOf(leaf)
                .flatMap(d => d(column, k, desc, Nil, Nil))
            else memo
              .computeIfAbsent(mm, _ => scala.collection.concurrent.TrieMap.empty)
              .getOrElseUpdate((column, k, desc),
                thresholdOf(files, mm, nn, column, k, desc))
          bound.flatMap(GraftStats.internalOf(_, a.dataType)).map { v =>
            val cmp =
              if (desc) GreaterThanOrEqual(a, Literal(v, a.dataType))
              else LessThanOrEqual(a, Literal(v, a.dataType))
            val cond =
              if (nullOrd == NullsFirst) Or(cmp, IsNull(a)) else cmp
            s.copy(child = Filter(cond, child))
          }
        case None => pruneFiltered(s, a, desc, nullOrd, k, child)
          .orElse(pruneSortColData(s, a, desc, nullOrd, k, child))
          .orElse(pruneMixed(s, a, desc, nullOrd, k, child))
      }
    // INLINE derived sort key (`ORDER BY day / 4 DESC LIMIT k` — Sorts
    // never get the Project pull-out Aggregates do): bind it over the
    // census tuple and run the entry-prefix proof
    case Sort(SortOrder(e, dir, nullOrd, _) +: _, true, child, _)
        if e.references.nonEmpty =>
      import PartitionCensus.{censusOf, bindPart}
      val info = censusOf(child).getOrElse(return None)
      val bound = bindPart(e, info).getOrElse(return None)
      pruneDerivedKey(s, e.dataType, dir == Descending, nullOrd, k, child,
        info, bound)
    case _ => None
  }

  /** Top-k THROUGH a partition-only WHERE — the dashboard shape
    * `WHERE day >= d ORDER BY ts DESC LIMIT k`. A filter whose every
    * conjunct binds to partition columns selects an EXACT file set (the
    * predicate is constant per file: it keeps all of a file's rows or
    * none), so the shortest-prefix proof runs on the surviving files and
    * the threshold conjunct injects at the leaf, UNDER the user's filter.
    * Any data-column conjunct fails the census walk and declines — its
    * selectivity would invalidate the non-null counts; that same refusal
    * is the fixpoint guard once our own data-column conjunct lands. */
  private def pruneFiltered(s: Sort, a: AttributeReference, desc: Boolean,
      nullOrd: NullOrdering, k: Int, child: LogicalPlan): Option[Sort] = {
    import PartitionCensus.{censusOf, liveEntries}
    val info = censusOf(child).getOrElse(return None)
    // DERIVED sort key (`ORDER BY year(day) DESC LIMIT k`): constant per
    // census entry, so the prefix proof runs over ENTRIES (entry live
    // rows are all non-null in the derived key exactly when the entry's
    // evaluated value is) and the kept set expresses as partition-column
    // ranges, like the window rule's derived groups
    info.derivedOf.get(a.exprId).foreach { bound =>
      return pruneDerivedKey(s, a.dataType, desc, nullOrd, k, child, info,
        bound)
    }
    val (_, mm, nn) = GraftBatchShim.topkStatsOf(info.leaf).getOrElse(return None)
    val column = info.dataColOf.get(a.exprId)
      .orElse(info.idxOf.get(a.exprId).map(info.partSchema.fieldNames(_)))
      .getOrElse(return None)
    val files = liveEntries(info).flatMap(_._3)
    if (files.isEmpty) return None
    val tau = thresholdVia(info.leaf, files, mm, nn, column, k, desc,
      info.conds).getOrElse(return None)
    val la = info.leaf.output.collectFirst {
      case la: AttributeReference if la.name == column => la
    }.getOrElse(return None)
    val v = GraftStats.internalOf(tau, la.dataType).getOrElse(return None)
    val cmp =
      if (desc) GreaterThanOrEqual(la, Literal(v, la.dataType))
      else LessThanOrEqual(la, Literal(v, la.dataType))
    val cond = if (nullOrd == NullsFirst) Or(cmp, IsNull(la)) else cmp
    injectAtLeaf(child, info.leaf, cond).map(nc => s.copy(child = nc))
  }

  /** Top-k through a SORT-COLUMN data filter — the dashboard shape
    * `WHERE ts >= d ORDER BY ts DESC LIMIT k` where the filter column IS
    * the sort column. Sound when EVERY filter conjunct compares the sort
    * column against a literal FACING THE SAME DIRECTION as the sort
    * (>= / > for DESC, <= / < for ASC): the prefix proof counts only
    * files whose ENTIRE value range satisfies every conjunct — their
    * non-null counts are exact under the filter (the comparisons drop
    * null rows, which the non-null count already excludes) — and the
    * threshold injects UNDER the user's filter. Partially-overlapping
    * files are excluded from the proof but stay in the scan.
    * Opposite-direction or different-column conjuncts decline (their
    * per-file selectivity is unknowable from bounds). Profitability
    * demands a file the existing conjuncts do NOT already skip whole
    * whose far edge falls past tau — which doubles as the fixpoint:
    * after one injection every such file IS entirely failing, and the
    * revisit declines (and the injected+user filter pair also fails this
    * path's single-Filter match until CombineFilters merges them, at
    * which point the profitability check declines). No NULLS FIRST
    * widening: the user's own comparison conjuncts drop null rows before
    * the Sort ever sees them. */
  private def pruneSortColData(s: Sort, a: AttributeReference, desc: Boolean,
      nullOrd: NullOrdering, k: Int, child: LogicalPlan): Option[Sort] = {
    import org.apache.spark.sql.catalyst.util.TypeUtils
    def toFilter(p: LogicalPlan): Option[(Expression, LogicalPlan)] = p match {
      case Filter(c, i) => Some((c, i))
      case Project(items, c)
          if items.forall(_.isInstanceOf[AttributeReference]) => toFilter(c)
      case _ => None
    }
    val (cond, inner) = toFilter(child).getOrElse(return None)
    val (files, mm, nn, names, leaf) = scanOf(inner).getOrElse(return None)
    val column = names.get(a.exprId).getOrElse(return None)
    val bounds = traverseOpt(splitConj(cond).map(boundOf(_, a, desc)))
      .getOrElse(return None)
    val t = sortColThresholdVia(leaf, files, mm, nn, column, a.dataType, k,
      desc, bounds, Nil).getOrElse(return None)
    val la = leaf.output.collectFirst {
      case la: AttributeReference if la.name == column => la
    }.getOrElse(return None)
    val cmp: Expression =
      if (desc) GreaterThanOrEqual(la, Literal(t, la.dataType))
      else LessThanOrEqual(la, Literal(t, la.dataType))
    injectAtLeaf(child, leaf, cmp).map(nc => s.copy(child = nc))
  }

  /** Top-k through MIXED filters — partition conjuncts AND sort-column
    * bounds together (`WHERE day >= d AND ts >= t ORDER BY ts DESC LIMIT
    * k`, the full dashboard shape, which both single-flavor paths
    * decline). The TOLERANT census walk binds the partition conjuncts
    * exactly (file-constant ⇒ the surviving entry set is exact) and
    * hands back the sort-column conjuncts; the fully-inside prefix proof
    * then runs over the SURVIVING entries' files only, with the same
    * soundness, profitability, and fixpoint arguments as
    * [[pruneSortColData]] (the injected conjunct is itself a tolerated
    * sort-column bound on revisit, and the newly-skippable check
    * declines). */
  private def pruneMixed(s: Sort, a: AttributeReference, desc: Boolean,
      nullOrd: NullOrdering, k: Int, child: LogicalPlan): Option[Sort] = {
    import PartitionCensus.{censusOf, liveEntries}
    val aId = a.exprId
    val (info, tol) = censusOf(child,
      e => e.references.map(_.exprId).toSet == Set(aId)).getOrElse(return None)
    if (tol.isEmpty) return None // pure partition case: pruneFiltered owns it
    val column = info.dataColOf.get(aId).getOrElse(return None)
    val (_, mm, nn) = GraftBatchShim.topkStatsOf(info.leaf).getOrElse(return None)
    val bounds = traverseOpt(tol.map(boundOf(_, a, desc)))
      .getOrElse(return None)
    val files = liveEntries(info).flatMap(_._3)
    if (files.isEmpty) return None
    val t = sortColThresholdVia(info.leaf, files, mm, nn, column,
      a.dataType, k, desc, bounds, info.conds).getOrElse(return None)
    val la = info.leaf.output.collectFirst {
      case la: AttributeReference if la.name == column => la
    }.getOrElse(return None)
    val cmp: Expression =
      if (desc) GreaterThanOrEqual(la, Literal(t, la.dataType))
      else LessThanOrEqual(la, Literal(t, la.dataType))
    injectAtLeaf(child, info.leaf, cmp).map(nc => s.copy(child = nc))
  }

  /** A conjunct as a SAME-DIRECTION literal bound on the sort column:
    * (internal value, strict?) — anything else is None. */
  private def boundOf(c: Expression, a: AttributeReference,
      desc: Boolean): Option[(Any, Boolean)] = {
    def v(l: Expression): Option[Any] = l match {
      case Literal(x, dt) if x != null && dt == a.dataType => Some(x)
      case _ => None
    }
    def same(x: Expression) = x match {
      case ar: AttributeReference => ar.exprId == a.exprId
      case _ => false
    }
    c match {
      case GreaterThanOrEqual(x, l) if same(x) && desc => v(l).map((_, false))
      case GreaterThan(x, l) if same(x) && desc => v(l).map((_, true))
      case LessThanOrEqual(l, x) if same(x) && desc => v(l).map((_, false))
      case LessThan(l, x) if same(x) && desc => v(l).map((_, true))
      case LessThanOrEqual(x, l) if same(x) && !desc => v(l).map((_, false))
      case LessThan(x, l) if same(x) && !desc => v(l).map((_, true))
      case GreaterThanOrEqual(l, x) if same(x) && !desc => v(l).map((_, false))
      case GreaterThan(l, x) if same(x) && !desc => v(l).map((_, true))
      case _ => None
    }
  }

  private def traverseOpt[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** The shared fully-inside prefix proof: over `files`, only those whose
    * WHOLE value range satisfies every bound contribute their exact
    * non-null counts; the shortest prefix with ≥ k rows proves τ
    * (internal domain), answered only when some not-already-skipped file
    * falls entirely past it (profitability AND the revisit fixpoint). */
  private def sortColThreshold(files: Seq[String],
      mm: (String, String) => Option[Option[(Any, Any)]],
      nn: (String, String) => Option[Long],
      column: String, dt: org.apache.spark.sql.types.DataType,
      k: Int, desc: Boolean, bounds: Seq[(Any, Boolean)]): Option[Any] =
    scala.util.Try {
      import org.apache.spark.sql.catalyst.util.TypeUtils
      val ord = TypeUtils.getInterpretedOrdering(dt)
      def satAll(edge: Any): Boolean = bounds.forall { case (v, strict) =>
        if (desc) { if (strict) ord.gt(edge, v) else ord.gteq(edge, v) }
        else { if (strict) ord.lt(edge, v) else ord.lteq(edge, v) }
      }
      val fbs = files.flatMap { f =>
        for {
          b <- mm(f, column).flatten
          im <- GraftStats.internalOf(b._1, dt)
          ix <- GraftStats.internalOf(b._2, dt)
          c <- nn(f, column)
          if c > 0L
        } yield (im, ix, c)
      }
      val fullSat = fbs.filter { case (mn, mx, _) =>
        satAll(if (desc) mn else mx) }
      val sortedFs =
        if (desc) fullSat.sortBy(_._1)(ord.reverse)
        else fullSat.sortBy(_._2)(ord)
      var need = k.toLong
      var tau: Option[Any] = None
      val it = sortedFs.iterator
      while (need > 0 && it.hasNext) {
        val (mn, mx, c) = it.next(); need -= c
        tau = Some(if (desc) mn else mx)
      }
      if (need > 0) None
      else tau.filter { t =>
        fbs.exists { case (mn, mx, _) =>
          val alreadySkipped = !satAll(if (desc) mx else mn)
          val pastTau = if (desc) ord.lt(mx, t) else ord.gt(mn, t)
          !alreadySkipped && pastTau
        }
      }
    }.toOption.flatten

  /** Descend from the Sort's child to a graft relation through
    * attribute-only Projects (a Filter or anything else declines), keeping
    * the exprId → relation-column-name pairing. */
  private def scanOf(plan: LogicalPlan): Option[(Seq[String],
      (String, String) => Option[Option[(Any, Any)]],
      (String, String) => Option[Long], Map[ExprId, String], LogicalPlan)] =
    GraftBatchShim.topkStatsOf(plan) match {
      case Some((files, mm, nn)) =>
        Some((files, mm, nn,
          plan.output.map(a => a.exprId -> a.name).toMap, plan))
      case None => plan match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          scanOf(child).map { case (files, mm, nn, names, leaf) =>
            val out = items.map(_.asInstanceOf[AttributeReference].exprId).toSet
            (files, mm, nn, names.filter(kv => out(kv._1)), leaf)
          }
        case _ => None
      }
    }

  /** The DENSE_RANK threshold — a DISTINCT-count prefix proof from the
    * ANALYZE sketches. Every hash a KMV sketch retains is the md5 of a
    * REAL value of its (immutable) file: hash collisions only UNDERcount
    * distinct values, saturation only truncates the retained set, and
    * nulls never enter a sketch — so the count of DISTINCT hashes
    * accumulated over a file prefix is a sound LOWER bound on the
    * distinct non-null values past the prefix bound. Sort provable files
    * by bound, union their hash sets, stop at ≥ k distinct hashes: at
    * least k distinct non-null values lie past τ, so the group's k-th
    * distinct value v_k is past τ and every dense_rank ≤ k row (value
    * among the top k distinct values — NULLS FIRST widens with IS NULL
    * at the caller) survives `c past τ`. Exact-or-decline: DV-marked
    * files (marks may have removed any value), files without sketches,
    * and — for BINARY columns — legacy identity-hash recipes (the same
    * bytes hash differently per file there, which would OVERcount) are
    * excluded from the proof but stay in the scan. Profitability as in
    * [[thresholdOf]]. */
  private def distinctThresholdOf(files: Seq[String],
      mm: (String, String) => Option[Option[(Any, Any)]],
      ndvH: (String, String) => Option[(Seq[String], Int)],
      column: String, dt: org.apache.spark.sql.types.DataType,
      k: Int, desc: Boolean): Option[Any] =
    scala.util.Try {
      val ord = graft.sources.DataSkipping.statOrdering
      val cands = files.flatMap { fk =>
        for {
          b <- mm(fk, column).flatten
          hs <- ndvH(fk, column)
          if dt != org.apache.spark.sql.types.BinaryType ||
            hs._2 >= graft.sources.DataSkipping.NdvRecipeCurrent
        } yield if (desc) (b._1, b._2, hs._1) else (b._2, b._1, hs._1)
      }
      val sorted =
        if (desc) cands.sortBy(_._1)(ord.reverse) else cands.sortBy(_._1)(ord)
      val seen = scala.collection.mutable.HashSet.empty[String]
      var tau: Option[Any] = None
      val it = sorted.iterator
      while (seen.size < k && it.hasNext) {
        val (bound, _, hs) = it.next()
        seen ++= hs
        tau = Some(bound)
      }
      if (seen.size < k) None
      else tau.filter { t =>
        sorted.exists { case (_, far, _) =>
          if (desc) ord.lt(far, t) else ord.gt(far, t)
        }
      }
    }.toOption.flatten

  /** The stats-domain threshold: sort provable files by their bound
    * (min DESC for a descending sort, max ASC for ascending), take the
    * shortest prefix with ≥ k non-null values, answer the last taken
    * file's bound — and only when at least one provable file falls
    * entirely past it (so the injection actually prunes). */
  private def thresholdOf(files: Seq[String],
      mm: (String, String) => Option[Option[(Any, Any)]],
      nn: (String, String) => Option[Long],
      column: String, k: Int, desc: Boolean): Option[Any] =
    scala.util.Try {
      val ord = graft.sources.DataSkipping.statOrdering
      // (bound-to-sort-by, far-edge, non-null count) per provable file
      val cands = files.flatMap { fk =>
        for {
          b <- mm(fk, column).flatten
          c <- nn(fk, column)
          if c > 0L
        } yield if (desc) (b._1, b._2, c) else (b._2, b._1, c)
      }
      val sorted =
        if (desc) cands.sortBy(_._1)(ord.reverse) else cands.sortBy(_._1)(ord)
      var need = k.toLong
      var tau: Option[Any] = None
      val it = sorted.iterator
      while (need > 0 && it.hasNext) {
        val (bound, _, c) = it.next()
        need -= c
        tau = Some(bound)
      }
      if (need > 0) None
      else tau.filter { t =>
        // profitable: some provable file lies entirely past the threshold
        // (its far edge is strictly outside the kept range)
        sorted.exists { case (_, far, _) =>
          if (desc) ord.lt(far, t) else ord.gt(far, t)
        }
      }
    }.toOption.flatten
}
