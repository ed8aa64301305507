package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim

/** Stats-domain bound → Catalyst internal value for a column type; None
  * (decline) on any shape the conversion cannot do EXACTLY. Shared by the
  * metadata MIN/MAX rewrites and the join-range inference. */
private[sql] object GraftStats {
  def internalOf(v: Any, dt: org.apache.spark.sql.types.DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    val conv: Option[() => Any] = (v, dt) match {
      case (bd: BigDecimal, ByteType) => Some(() => bd.bigDecimal.byteValueExact())
      case (bd: BigDecimal, ShortType) => Some(() => bd.bigDecimal.shortValueExact())
      case (bd: BigDecimal, IntegerType) => Some(() => bd.bigDecimal.intValueExact())
      case (bd: BigDecimal, LongType) => Some(() => bd.bigDecimal.longValueExact())
      case (bd: BigDecimal, DateType) => Some(() => bd.bigDecimal.intValueExact())
      case (bd: BigDecimal, TimestampType) => Some(() => bd.bigDecimal.longValueExact())
      case (bd: BigDecimal, TimestampNTZType) => Some(() => bd.bigDecimal.longValueExact())
      // float/double stats were built FROM the file's float/double values
      // (statValue widens exactly), so narrowing back is exact
      case (bd: BigDecimal, DoubleType) => Some(() => bd.toDouble)
      case (bd: BigDecimal, FloatType) => Some(() => bd.toFloat)
      case (bd: BigDecimal, d: DecimalType) =>
        Some(() => org.apache.spark.sql.types.Decimal(bd.setScale(d.scale)))
      case (s: String, StringType) =>
        Some(() => org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case _ => None
    }
    conv.flatMap(f => scala.util.Try(f()).toOption)
  }
}

/** JOIN-KEY RANGE INFERENCE from manifest bounds — static
  * dynamic-partition-pruning for equi-joins: `fact ⋈ dim ON fk = pk` can
  * only match fact rows with `fk ∈ [min(pk), max(pk)]`, and BOTH bounds
  * sit in the two manifests at plan time. When the other side's bound
  * STRICTLY narrows a side's own, the rule injects
  * `key >= lo AND key <= hi` on that side — Spark's own predicate
  * pushdown carries it into the scan in the same fixpoint, where manifest
  * data skipping prunes whole files (and directories, for clustered or
  * partitioned keys). At 100 TB this is the fact-scan cost of joining a
  * narrow dim (this month's campaigns, one tenant's catalog) falling from
  * "every fact file" to "the files whose key range overlaps".
  *
  * SOUNDNESS (per join type — rows removed can never change the result):
  *  - INNER / LeftSemi: either side's rows outside the other's key range
  *    match nothing — dropping them removes no matches (NULL keys filter
  *    out too, and NULL never equals anything);
  *  - LeftAnti: only the RIGHT side narrows (right rows outside the
  *    left's range matched nothing, so match-existence per left row is
  *    unchanged; filtering the LEFT would drop rows anti-join must KEEP);
  *  - OUTER joins are left untouched entirely — not for soundness (the
  *    null-producing side could safely narrow) but for COMPOSITION: a
  *    synthetic dim-side filter would block the pinned-outer-join
  *    machinery (join elimination's full-pin path and the MV rewrite's
  *    outer spellings tolerate only vacuous IsNotNull dim conjuncts).
  *
  * EXACT-OR-DECLINE posture: bounds come from the same manifest MIN/MAX
  * hook the metadata rewrites use (truncated strings, DV-marked files,
  * and inexact stats conversions all answer None); both key attributes
  * must be relation-level columns of the SAME type (attribute-only
  * projects, filters allowed); the conjunct is injected only on a STRICT
  * narrowing (equal-range star joins are untouched, so healthy schemas
  * see zero plan churn), and only once (ANY literal range conjunct
  * already on the key — a prior iteration's injection, or the user's own
  * filter, which informs skipping equally well — suppresses the pair
  * before any bound lookup; bounds themselves memoize per (relation,
  * column), so fixpoint re-visits cost O(1)). Runs LAST in
  * the extension list so the strictly-better whole-operator rewrites (MV,
  * elimination, eager agg) see the un-annotated shape first. Disable with
  * `spark.graft.joinRange.enabled=false`. */
case class GraftJoinRangeInference(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.joinRange.enabled", "true").toBoolean

  /** Per-(relation, column) bound memo: `minMaxOf` folds O(files) manifest
    * stats per call, and the optimizer fixpoint re-runs this rule dozens
    * of times per query — the memo makes every re-visit O(1). Keyed
    * WEAKLY by the relation's own minMaxOf closure (one per
    * GraftFileIndex), so entries die with their snapshot. */
  private val boundsMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[String => Option[(Any, Any)],
      scala.collection.concurrent.TrieMap[String, Option[(Any, Any)]]]())

  private def boundsOf(mm: String => Option[(Any, Any)],
      column: String): Option[(Any, Any)] =
    boundsMemo
      .computeIfAbsent(mm, _ => scala.collection.concurrent.TrieMap.empty)
      .getOrElseUpdate(column, mm(column))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(l, r, jt, Some(cond), hint) if cond.deterministic =>
        val (narrowLeft, narrowRight) = jt match {
          case Inner | LeftSemi => (true, true)
          case LeftAnti => (false, true)
          case _ => (false, false)
        }
        val nl = if (narrowLeft) narrowed(l, r, cond) else None
        val nr = if (narrowRight) narrowed(r, l, cond) else None
        if (nl.isEmpty && nr.isEmpty) j
        else Join(nl.getOrElse(l), nr.getOrElse(r), jt, Some(cond), hint)
    }
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  /** Relation-level view of a side: the manifest MIN/MAX hook, the
    * exprId → relation column name map (attribute-only projects — a
    * rename would detach the stats pairing), and every filter conjunct
    * already on the side (the idempotence check). */
  private def relOf(plan: LogicalPlan): Option[
      (String => Option[(Any, Any)], Map[ExprId, String], Seq[Expression])] =
    GraftBatchShim.graftMetadataOf(plan) match {
      case Some((_, mm, _, _)) =>
        Some((mm, plan.output.map(a => a.exprId -> a.name).toMap, Nil))
      case None => plan match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          relOf(child).map { case (mm, names, cs) =>
            val out = items.map(_.asInstanceOf[AttributeReference].exprId).toSet
            (mm, names.filter(kv => out(kv._1)), cs)
          }
        case Filter(c, child) =>
          relOf(child).map { case (mm, names, cs) =>
            (mm, names, cs ++ splitConj(c))
          }
        case _ => None
      }
    }

  /** The narrowed `target`: range conjuncts on its join-key attributes
    * derived from `other`'s manifest bounds, when they STRICTLY narrow
    * the target's own — None when nothing (new) narrows. */
  private def narrowed(target: LogicalPlan, other: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val (tMM, tNames, tConds) = relOf(target).getOrElse(return None)
    val (oMM, oNames, _) = relOf(other).getOrElse(return None)
    val ord = graft.sources.DataSkipping.statOrdering
    val adds: Seq[Expression] = splitConj(cond).flatMap {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        val pair =
          if (target.outputSet.contains(x) && other.outputSet.contains(y))
            Some((x, y))
          else if (target.outputSet.contains(y) && other.outputSet.contains(x))
            Some((y, x))
          else None
        pair.toSeq.flatMap { case (a, b) =>
          // fast idempotence: a range conjunct on this key already sits on
          // the side (a prior iteration's injection) — skip before any
          // bound lookup
          val already = tConds.exists {
            case GreaterThanOrEqual(at: AttributeReference, _: Literal) =>
              at.exprId == a.exprId
            case LessThanOrEqual(at: AttributeReference, _: Literal) =>
              at.exprId == a.exprId
            case _ => false
          }
          if (already || a.dataType != b.dataType) Nil
          else scala.util.Try {
            (tNames.get(a.exprId).flatMap(boundsOf(tMM, _)),
              oNames.get(b.exprId).flatMap(boundsOf(oMM, _))) match {
              case (Some((tLo, tHi)), Some((oLo, oHi))) =>
                val lo =
                  if (ord.gt(oLo, tLo))
                    GraftStats.internalOf(oLo, a.dataType).map(v =>
                      GreaterThanOrEqual(a, Literal(v, a.dataType)))
                  else None
                val hi =
                  if (ord.lt(oHi, tHi))
                    GraftStats.internalOf(oHi, a.dataType).map(v =>
                      LessThanOrEqual(a, Literal(v, a.dataType)))
                  else None
                Seq(lo, hi).flatten
              case _ => Nil
            }
          }.getOrElse(Nil)
        }
      case _ => Nil
    }
    val fresh = adds.filterNot(c => tConds.exists(_.semanticEquals(c)))
    if (fresh.isEmpty) None
    else Some(Filter(fresh.reduce[Expression](And), target))
  }
}
