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
  * CONSERVATIVE BY CONSTRUCTION — the rewrite fires only on the shape
  * `(A ⋈ B) ⋈ C` where:
  *  - both joins are INNER, hint-free, with PURE EQUI conditions
  *    (attr = attr conjuncts, each pairing the two sides — anything else
  *    declines);
  *  - C's condition conjuncts each pair ONE left-composite leg with C
  *    (`attr = attr` across (A, C) or (B, C)) — the swap places each
  *    conjunct at the level where its references are in scope, so
  *    `(A ⋈ C) ⋈ B` and `(B ⋈ C) ⋈ A` are both plain inner-join
  *    associativity, including the BUSHY cross-split `(A⋈B) ⋈ (C⋈D)`
  *    whose top condition touches B and C; mixed A-B conjuncts decline;
  *  - every leg is a graft relation (through attribute-only projections)
  *    with live row counts OR itself such an inner equi-join (estimated
  *    recursively with the same formula — a selective dim BUBBLES DOWN a
  *    whole left-deep chain, one level per optimizer iteration) OR a
  *    FILTERED such leg whose every conjunct has an estimable
  *    selectivity (equality → rows/ndv, range → exact-span fraction,
  *    IN → size/ndv — anything else declines the leg), and EVERY equi
  *    key on BOTH candidates is sketched — no guess without a sketch;
  *  - the estimates differ by ≥ `spark.graft.joinReorder.ratio`
  *    (default 10): close calls keep the user's order. The comparison
  *    assumes COMPARABLE sketch provenance on both candidates; an
  *    ANALYZE'd dim against an un-analyzed one never reorders (the
  *    un-sketched key declines), it keeps the user's order.
  *
  * The right-nested spelling `A ⋈ (B ⋈ C)` ROTATES to left-deep under
  * the same hysteresis when A pairs with exactly one inner leg; neither
  * rewrite emits a right-nested join, so swap and rotate cannot
  * oscillate.
  * The replacement wraps in a Project restoring the original column
  * order (Spark's own reorder does the same). Termination: each swap
  * strictly improves the inner estimate ≥10× at its node — a bubble
  * sort with hysteresis over finitely many left-deep orders; a
  * swap-back would need the OPPOSITE ≥10× inequality — impossible.
  * Disable with `spark.graft.joinReorder.enabled=false`. */
case class GraftJoinReorder(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.joinReorder.enabled", "true").toBoolean

  private def ratio: Double = spark.sessionState.conf
    .getConfString("spark.graft.joinReorder.ratio", "10.0").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    // run to an INTERNAL fixpoint: a selective dim bubbles down a whole
    // chain in one rule application, BEFORE later rules (eager
    // aggregation plants partial aggregates on the fact leg, which this
    // rule's estimator rightly refuses) reshape the legs under it
    var cur = plan
    var changed = true
    var guard = 0
    while (changed && guard < 32) {
      changed = false
      guard += 1
      cur = cur.transformUp {
        case j @ Join(l, r, Inner, Some(cond), JoinHint.NONE) =>
          // column pruning wraps inner joins in attribute-only Projects —
          // see through them (the rebuild re-derives pruning)
          val viaLeft = stripAttrProjects(l) match {
            case Join(a, b, Inner, Some(cAB), JoinHint.NONE) =>
              trySwap(j, a, b, r, cAB, cond)
            case _ => None
          }
          // the RIGHT-NESTED spelling `A ⋈ (B ⋈ C)`: rotate to left-deep
          // when the estimate says the rotated inner join is ≥ratio×
          // smaller (rotation changes which join executes first, so it
          // takes the same hysteresis as a swap); neither rewrite emits
          // a right-nested join, so the two cannot oscillate
          val rewritten = viaLeft.orElse(stripAttrProjects(r) match {
            case Join(b, c, Inner, Some(cBC), JoinHint.NONE) =>
              tryRotate(j, l, b, c, cond, cBC)
            case _ => None
          })
          rewritten match {
            case Some(n) => changed = true; n
            case None => j
          }
      }
    }
    cur
  }

  private def stripAttrProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(items, ch)
        if items.forall(_.isInstanceOf[AttributeReference]) =>
      stripAttrProjects(ch)
    case other => other
  }

  /** (estimated rows, per-column NDV by exprId) of a leg: a graft
    * relation (through attribute-only projections) with live rows, or an
    * INNER equi-join of such legs estimated with this rule's own formula
    * — which is what lets a selective dim BUBBLE DOWN a whole left-deep
    * chain: each optimizer iteration swaps it one level deeper, the
    * composite leg re-estimating as it goes. A joined column's NDV keeps
    * its leg's sketch value capped at the join's estimated rows (a
    * filtering join can only shrink distinctness — the cap errs toward
    * LARGER downstream estimates, symmetric across candidates). Filters
    * and anything else decline. */
  private def estOf(p: LogicalPlan): Option[(Double, ExprId => Option[Long])] =
    GraftBatchShim.ndvStatsOf(p) match {
      case Some((ndv, rows)) =>
        val names = p.output.map(a => a.exprId -> a.name).toMap
        Some((rows.toDouble, id => names.get(id).flatMap(ndv)))
      case None => p match {
        case Project(items, ch)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          estOf(ch) // ids preserved; pruning does not change stats
        // inferred IsNotNull-only filters are join-estimate-transparent:
        // null keys never match anyway, and the slight row overestimate
        // on non-key columns only widens BOTH candidates
        case Filter(c, ch) if splitConj(c).forall {
          case IsNotNull(_: AttributeReference) => true
          case _ => false
        } => estOf(ch)
        // FILTERED legs estimate through per-conjunct selectivities from
        // the same manifest facts — equality as rows/ndv (the KMV sketch
        // under-estimates NDV, which OVER-estimates surviving rows), a
        // range as its fraction of the column's exact span (uniform
        // assumption — the ≥ratio hysteresis absorbs modest skew), IN as
        // list-size/ndv. Any conjunct outside those shapes declines the
        // whole leg: never guess a selectivity. NOTE the provenance
        // asymmetry: an ANALYZE'd leg vs an un-analyzed one compares
        // sketch-grounded against declined — the rule then simply keeps
        // the user's order rather than reorder on one-sided evidence.
        case Filter(c, ch) =>
          for {
            base <- estOf(ch)
            bounds = boundsOf(ch)
            sels <- {
              val per = splitConj(c).map(selOf(_, base._2, bounds))
              if (per.forall(_.isDefined)) Some(per.map(_.get)) else None
            }
          } yield {
            val rowsF = math.max(1.0, base._1 * sels.product)
            val cap =
              math.max(1L, math.min(Long.MaxValue.toDouble, rowsF).toLong)
            (rowsF, (id: ExprId) => base._2(id).map(math.min(_, cap)))
          }
        case Join(l, r, Inner, Some(c), JoinHint.NONE) =>
          for {
            le <- estOf(l)
            re <- estOf(r)
            pairs <- equiPairs(c, l, r)
            est <- estimate(le._1, le._2, re._1, re._2, pairs)
          } yield {
            val lIds = l.output.map(_.exprId).toSet
            val cap = math.max(1L, math.min(Long.MaxValue.toDouble, est).toLong)
            val lookup: ExprId => Option[Long] = id =>
              (if (lIds(id)) le._2(id) else re._2(id)).map(math.min(_, cap))
            (est, lookup)
          }
        case _ => None
      }
    }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x => Seq(x)
  }

  /** Column bounds lookup (by exprId) of a leg — the relation's exact
    * table-level stats-domain bounds, resolved through attribute-only
    * projections. */
  private def boundsOf(p: LogicalPlan): ExprId => Option[(Any, Any)] = {
    val names = p.output.map(a => a.exprId -> a.name).toMap
    val hook = GraftBatchShim.graftColBoundsOf(stripAttrProjects(p))
    id => for { n <- names.get(id); h <- hook; b <- h(n) } yield b
  }

  /** One filter conjunct's selectivity from manifest facts — None when
    * the shape isn't estimable (the whole leg then declines). */
  private def selOf(e: Expression, ndv: ExprId => Option[Long],
      bounds: ExprId => Option[(Any, Any)]): Option[Double] = {
    def num(v: Any): Option[Double] = v match {
      case bd: BigDecimal => Some(bd.toDouble)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: java.lang.Number => Some(n.doubleValue())
      case _ => None
    }
    def eq(a: AttributeReference): Option[Double] =
      ndv(a.exprId).map(d => 1.0 / math.max(1L, d).toDouble)
    // fraction of the column's exact span the interval covers (numeric/
    // temporal internal values only; degenerate spans answer 1.0 — the
    // over-estimating direction)
    def frac(a: AttributeReference, lo: Option[Double],
        hi: Option[Double]): Option[Double] =
      bounds(a.exprId).flatMap { case (mnS, mxS) =>
        for { mn <- num(mnS); mx <- num(mxS) } yield
          if (mx <= mn) 1.0
          else math.min(1.0, math.max(0.0,
            (math.min(hi.getOrElse(mx), mx) -
              math.max(lo.getOrElse(mn), mn)) / (mx - mn)))
      }
    def litNum(x: Expression): Option[Double] = x match {
      case Literal(v, _) if v != null => num(v)
      case _ => None
    }
    e match {
      case IsNotNull(_: AttributeReference) => Some(1.0)
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null => eq(a)
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null => eq(a)
      case In(a: AttributeReference, vs) if vs.forall {
        case Literal(v, _) => v != null
        case _ => false
      } => ndv(a.exprId).map(d =>
        math.min(1.0, vs.size.toDouble / math.max(1L, d).toDouble))
      case GreaterThanOrEqual(a: AttributeReference, l) =>
        litNum(l).flatMap(v => frac(a, Some(v), None))
      case GreaterThan(a: AttributeReference, l) =>
        litNum(l).flatMap(v => frac(a, Some(v), None))
      case LessThanOrEqual(a: AttributeReference, l) =>
        litNum(l).flatMap(v => frac(a, None, Some(v)))
      case LessThan(a: AttributeReference, l) =>
        litNum(l).flatMap(v => frac(a, None, Some(v)))
      case GreaterThanOrEqual(l, a: AttributeReference) =>
        litNum(l).flatMap(v => frac(a, None, Some(v)))
      case GreaterThan(l, a: AttributeReference) =>
        litNum(l).flatMap(v => frac(a, None, Some(v)))
      case LessThanOrEqual(l, a: AttributeReference) =>
        litNum(l).flatMap(v => frac(a, Some(v), None))
      case LessThan(l, a: AttributeReference) =>
        litNum(l).flatMap(v => frac(a, Some(v), None))
      case _ => None
    }
  }

  /** The condition's equi pairs as (left id, right id) — None unless
    * EVERY conjunct is attr = attr across the two sides. */
  private def equiPairs(cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[Seq[(ExprId, ExprId)]] = {
    val lids = l.output.map(_.exprId).toSet
    val rids = r.output.map(_.exprId).toSet
    val pairs = splitConj(cond).map {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        if (lids(x.exprId) && rids(y.exprId)) (x.exprId, y.exprId)
        else if (lids(y.exprId) && rids(x.exprId)) (y.exprId, x.exprId)
        else return None
      case _ => return None
    }
    if (pairs.isEmpty) None else Some(pairs)
  }

  /** `|X ⋈ Y|` from estimated rows and per-key sketches — None when any
    * key side is un-sketched. */
  private def estimate(rowsL: Double, ndvL: ExprId => Option[Long],
      rowsR: Double, ndvR: ExprId => Option[Long],
      pairs: Seq[(ExprId, ExprId)]): Option[Double] = {
    var est = rowsL * rowsR
    pairs.foreach { case (lk, rk) =>
      val dl = ndvL(lk).getOrElse(return None)
      val dr = ndvR(rk).getOrElse(return None)
      est /= math.max(1L, math.max(dl, dr)).toDouble
    }
    Some(est)
  }

  /** Classify the top condition's conjuncts of `(A ⋈ B) ⋈cTop X` by which
    * left-composite leg they pair with X: every conjunct must be a pure
    * `attr = attr` across (A, X) or (B, X) — anything else (non-equi,
    * A-B-mixed, X-only) declines. The CROSS-SPLIT license: a condition
    * touching BOTH legs splits per conjunct, each placed at the level
    * where its references are in scope. */
  private def partitionTop(cTop: Expression, a: LogicalPlan,
      b: LogicalPlan, x: LogicalPlan)
      : Option[(Seq[Expression], Seq[Expression])] = {
    val aIds = a.outputSet
    val bIds = b.outputSet
    val xIds = x.outputSet
    var conjAX = Vector.empty[Expression]
    var conjBX = Vector.empty[Expression]
    splitConj(cTop).foreach {
      case cj @ EqualTo(p: AttributeReference, q: AttributeReference) =>
        def side(at: AttributeReference): Int =
          if (aIds.contains(at)) 0
          else if (bIds.contains(at)) 1
          else if (xIds.contains(at)) 2 else -1
        (side(p), side(q)) match {
          case (0, 2) | (2, 0) => conjAX :+= cj
          case (1, 2) | (2, 1) => conjBX :+= cj
          case _ => return None
        }
      case _ => return None
    }
    Some((conjAX, conjBX))
  }

  /** `(A ⋈cAB B) ⋈cTop X` — enumerate BOTH associations that pull X
    * inward: `(A ⋈ X) ⋈ B` and `(B ⋈ X) ⋈ A`, with cTop's conjuncts
    * SPLIT per leg (the bushy cross-split case: X itself composite and
    * cTop pairing it with both A and B). A candidate needs its inner
    * condition non-empty (no cartesian), every key sketched, and the
    * inner estimate ≥ratio× below est(A ⋈ B); the smaller winner
    * replaces, close calls keep the user's order. */
  private def trySwap(j: Join, a: LogicalPlan, b: LogicalPlan,
      x: LogicalPlan, cAB: Expression, cTop: Expression): Option[LogicalPlan] = {
    val (rowsA, ndvA) = estOf(a).getOrElse(return None)
    val (rowsB, ndvB) = estOf(b).getOrElse(return None)
    val (rowsX, ndvX) = estOf(x).getOrElse(return None)
    val pAB = equiPairs(cAB, a, b).getOrElse(return None)
    val estAB = estimate(rowsA, ndvA, rowsB, ndvB, pAB).getOrElse(return None)
    val (conjAX, conjBX) = partitionTop(cTop, a, b, x).getOrElse(return None)
    def cand(keep: LogicalPlan, keepRows: Double,
        keepNdv: ExprId => Option[Long], innerConj: Seq[Expression],
        outConj: Seq[Expression], out: LogicalPlan)
        : Option[(Double, LogicalPlan)] =
      if (innerConj.isEmpty) None // conditionless inner = cartesian: decline
      else for {
        pKX <- equiPairs(innerConj.reduce(And), keep, x)
        est <- estimate(keepRows, keepNdv, rowsX, ndvX, pKX)
        if est * ratio <= estAB
      } yield (est, Join(
        Join(keep, x, Inner, Some(innerConj.reduce(And)), JoinHint.NONE),
        out, Inner, Some((cAB +: outConj).reduce(And)), JoinHint.NONE))
    val viaA = cand(a, rowsA, ndvA, conjAX, conjBX, b)
    val viaB = cand(b, rowsB, ndvB, conjBX, conjAX, a)
    val best = (viaA, viaB) match {
      case (Some(p), Some(q)) => Some(if (p._1 <= q._1) p else q)
      case (one, None) => one
      case (None, two) => two
    }
    best.map { case (_, swapped) => Project(j.output, swapped) }
  }

  /** The right-nested spelling `A ⋈_cTop (B ⋈_cBC C)` rotates to
    * left-deep when the rotated inner join estimates ≥ratio× smaller
    * than B ⋈ C — plain inner-join associativity (every condition keeps
    * its references in scope at its new position). cTop's conjuncts
    * SPLIT per inner leg (the cross-split case: cTop pairing A with
    * both B and C places each conjunct at its own level); both
    * associations enumerate under the same hysteresis. */
  private def tryRotate(j: Join, a: LogicalPlan, b: LogicalPlan,
      c: LogicalPlan, cTop: Expression, cBC: Expression)
      : Option[LogicalPlan] = {
    val (rowsA, ndvA) = estOf(a).getOrElse(return None)
    val (rowsB, ndvB) = estOf(b).getOrElse(return None)
    val (rowsC, ndvC) = estOf(c).getOrElse(return None)
    val pBC = equiPairs(cBC, b, c).getOrElse(return None)
    val estBC =
      estimate(rowsB, ndvB, rowsC, ndvC, pBC).getOrElse(return None)
    // partition cTop's conjuncts by which inner leg they pair A with —
    // (A,B)- and (A,C)-pairing equi conjuncts; anything else declines
    val (conjAB, conjAC) = partitionTop(cTop, b, c, a) match {
      case Some((bx, cx)) => (bx, cx) // legs (B, C) against "x" = A
      case None => return None
    }
    def cand(inner: LogicalPlan, innerRows: Double,
        innerNdv: ExprId => Option[Long], innerConj: Seq[Expression],
        outConj: Seq[Expression], out: LogicalPlan)
        : Option[(Double, LogicalPlan)] =
      if (innerConj.isEmpty) None // conditionless inner: decline
      else for {
        pAI <- equiPairs(innerConj.reduce(And), a, inner)
        est <- estimate(rowsA, ndvA, innerRows, innerNdv, pAI)
        if est * ratio <= estBC
      } yield (est, Join(
        Join(a, inner, Inner, Some(innerConj.reduce(And)), JoinHint.NONE),
        out, Inner, Some((cBC +: outConj).reduce(And)), JoinHint.NONE))
    val viaB = cand(b, rowsB, ndvB, conjAB, conjAC, c)
    val viaC = cand(c, rowsC, ndvC, conjAC, conjAB, b)
    val best = (viaB, viaC) match {
      case (Some(p), Some(q)) => Some(if (p._1 <= q._1) p else q)
      case (one, None) => one
      case (None, two) => two
    }
    best.map { case (_, sw) => Project(j.output, sw) }
  }
}
