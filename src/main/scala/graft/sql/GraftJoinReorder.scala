package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim

/** NDV-DRIVEN INNER-JOIN REORDERING (CBO-lite phase 2) — the engine
  * already estimates join selectivity from manifest KMV sketches for
  * BROADCAST decisions ([[org.apache.spark.sql.graft.GraftNdvJoinEstimation]]);
  * this rule uses the same statistics to pick the JOIN ORDER. Spark's own
  * CostBasedJoinReorder needs ANALYZE-populated catalog stats that
  * path-addressed graft tables never have, so a SQL user's literal join
  * order is what executes — and `fact ⋈ bigDim ⋈ tinySubsetDim` written
  * in that order carries the full fact through the first shuffle when
  * joining the subset dim first would have shrunk it 10×.
  *
  * The classic System-R estimate over manifest facts: with every equi-key
  * NDV-sketched and exact live row counts,
  * `|X ⋈ Y| ≈ |X|·|Y| / Π max(ndv_X(k), ndv_Y(k))`. A KMV sketch
  * under-estimates NDV on un-analyzed files, which OVER-estimates join
  * output — symmetric on both candidates, so the comparison degrades
  * gracefully rather than unsafely.
  *
  * CONSERVATIVE BY CONSTRUCTION — the rewrite fires only on the exact
  * shape `(A ⋈ B) ⋈ C` where:
  *  - both joins are INNER, hint-free, with PURE EQUI conditions
  *    (attr = attr conjuncts, each pairing the two sides — anything else
  *    declines);
  *  - C's condition references A only (no B column), so swapping to
  *    `(A ⋈ C) ⋈ B` is plain inner-join associativity;
  *  - all three legs are graft relations (through attribute-only
  *    projections) with live row counts, and EVERY equi key on BOTH
  *    candidates is sketched — no guess without a sketch, a filtered leg
  *    declines (its surviving count is not knowable here);
  *  - the estimates differ by ≥ `spark.graft.joinReorder.ratio`
  *    (default 10): close calls keep the user's order.
  * The replacement wraps in a Project restoring the original column
  * order (Spark's own reorder does the same). Revisit idempotence: a
  * swap-back would need the OPPOSITE ≥10× inequality — impossible.
  * Disable with `spark.graft.joinReorder.enabled=false`. */
case class GraftJoinReorder(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.joinReorder.enabled", "true").toBoolean

  private def ratio: Double = spark.sessionState.conf
    .getConfString("spark.graft.joinReorder.ratio", "10.0").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(l, c, Inner, Some(cAC), JoinHint.NONE) =>
        // column pruning wraps the inner join in an attribute-only
        // Project — see through it (the rebuild re-derives pruning)
        stripAttrProjects(l) match {
          case Join(a, b, Inner, Some(cAB), JoinHint.NONE) =>
            trySwap(j, a, b, c, cAB, cAC).getOrElse(j)
          case _ => j
        }
    }
  }

  private def stripAttrProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(items, ch)
        if items.forall(_.isInstanceOf[AttributeReference]) =>
      stripAttrProjects(ch)
    case other => other
  }

  /** (ndv hook, live rows, output ids) behind attribute-only projections
    * over a graft relation; Filters decline — their surviving row count
    * is not knowable from the manifest. */
  private def statsOf(p: LogicalPlan)
      : Option[(String => Option[Long], Long, Map[ExprId, String])] =
    GraftBatchShim.ndvStatsOf(p) match {
      case Some((ndv, rows)) =>
        Some((ndv, rows, p.output.map(a => a.exprId -> a.name).toMap))
      case None => p match {
        case Project(items, ch)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          statsOf(ch).map { case (ndv, rows, names) =>
            val keep = items.map(_.asInstanceOf[AttributeReference].exprId).toSet
            (ndv, rows, names.filter(kv => keep(kv._1)))
          }
        case _ => None
      }
    }

  /** The condition's equi pairs as (left column, right column) NAMES —
    * None unless EVERY conjunct is attr = attr across the two sides. */
  private def equiPairs(cond: Expression, left: Map[ExprId, String],
      right: Map[ExprId, String]): Option[Seq[(String, String)]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    val pairs = split(cond).map {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        (left.get(x.exprId), right.get(y.exprId),
          left.get(y.exprId), right.get(x.exprId)) match {
          case (Some(l), Some(r), _, _) => (l, r)
          case (_, _, Some(l), Some(r)) => (l, r)
          case _ => return None
        }
      case _ => return None
    }
    if (pairs.isEmpty) None else Some(pairs)
  }

  /** `|X ⋈ Y|` from live rows and per-key sketches — None when any key
    * side is un-sketched. */
  private def estimate(rowsL: Long, ndvL: String => Option[Long],
      rowsR: Long, ndvR: String => Option[Long],
      pairs: Seq[(String, String)]): Option[Double] = {
    var est = rowsL.toDouble * rowsR.toDouble
    pairs.foreach { case (lk, rk) =>
      val dl = ndvL(lk).getOrElse(return None)
      val dr = ndvR(rk).getOrElse(return None)
      est /= math.max(1L, math.max(dl, dr)).toDouble
    }
    Some(est)
  }

  private def trySwap(j: Join, a: LogicalPlan, b: LogicalPlan,
      c: LogicalPlan, cAB: Expression, cAC: Expression): Option[LogicalPlan] = {
    // C's condition must not touch B — otherwise the swap is not
    // associativity but a different query
    if (cAC.references.exists(b.outputSet.contains)) return None
    val (ndvA, rowsA, namesA) = statsOf(a).getOrElse(return None)
    val (ndvB, rowsB, namesB) = statsOf(b).getOrElse(return None)
    val (ndvC, rowsC, namesC) = statsOf(c).getOrElse(return None)
    val pAB = equiPairs(cAB, namesA, namesB).getOrElse(return None)
    val pAC = equiPairs(cAC, namesA, namesC).getOrElse(return None)
    val estAB = estimate(rowsA, ndvA, rowsB, ndvB, pAB).getOrElse(return None)
    val estAC = estimate(rowsA, ndvA, rowsC, ndvC, pAC).getOrElse(return None)
    if (estAC * ratio > estAB) return None // close call: keep the user's order
    val swapped = Join(
      Join(a, c, Inner, Some(cAC), JoinHint.NONE),
      b, Inner, Some(cAB), JoinHint.NONE)
    Some(Project(j.output, swapped))
  }
}
