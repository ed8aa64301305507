package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim
import org.apache.spark.sql.types.LongType

/** EAGER AGGREGATION (Yan & Larson's eager group-by): push a partial
  * aggregate below a star join —
  *
  * {{{ SELECT d.g, COUNT(*), SUM(f.v)
  *     FROM fact f JOIN dim d ON f.fk = d.pk GROUP BY d.g }}}
  *
  * becomes `(SELECT fk, COUNT(*) c, SUM(v) s FROM fact GROUP BY fk) ⋈ dim`
  * re-aggregated by `d.g` — the join's fact side shrinks from O(fact
  * rows) to O(distinct join keys) BEFORE the shuffle/broadcast, which at
  * 100 TB is the difference between shuffling the fact and shuffling a
  * rollup of it.
  *
  * EXACTNESS needs no uniqueness or integrity: a fact row that joins k
  * dim rows contributes its values to k (dim-side) groups, and so does
  * its partial — replication distributes over COUNT-as-SUM, SUM, MIN and
  * MAX. What it does need:
  *  - an INNER join (null-keyed fact rows drop identically on both
  *    shapes) or a LEFT join with the fact on the LEFT (an unmatched
  *    fact row and its unmatched partial surface the same null-dim-group
  *    row; fact-as-right is declined — COUNT(*) counts unmatched left
  *    rows a null partial would skip);
  *  - every aggregate input from ONE side (the fact), as COUNT(*)/
  *    COUNT(col)/SUM(integral)/MIN/MAX — fractional SUM/AVG/DISTINCT
  *    decline (re-association is not bit-exact / not decomposable);
  *  - the join condition's fact-side references and the fact-side group
  *    columns all become partial group keys;
  *  - a grouped aggregate (the global COUNT over an empty join would
  *    come back NULL from a SUM re-aggregate).
  *
  * COST GATE: eager aggregation only helps when the partial collapses
  * many rows, so the rule fires only when the fact relation carries
  * ANALYZE'd NDV sketches for every partial key and their product stays
  * under `spark.graft.eagerAgg.maxKeyRatio` (default 0.5) of the
  * manifest row count — no sketch, no transform (the same exact-or-
  * decline posture as every other graft rule). Fixpoint-safe: the
  * rewritten fact side is an Aggregate, which the fact-side walk
  * refuses. Runs AFTER the MV rewrite and join elimination in the
  * extension list, so strictly-better transforms win. Disable with
  * `spark.graft.eagerAgg.enabled=false`.
  */
case class GraftEagerAggregation(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.eagerAgg.enabled", "true").toBoolean

  private def maxKeyRatio: Double = spark.sessionState.conf
    .getConfString("spark.graft.eagerAgg.maxKeyRatio", "0.5").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(groups, aggs,
          j @ Join(l, r, Inner, Some(cond), _), _) if groups.nonEmpty =>
        rewrite(groups, aggs, j, l, r, cond)
          .orElse(rewrite(groups, aggs, j, r, l, cond))
          .getOrElse(agg)
      // LEFT join with the FACT on the LEFT: an unmatched fact row and
      // its unmatched partial surface the same null-dim-group row, so the
      // replication argument carries over verbatim. (Fact-as-RIGHT does
      // NOT: COUNT(*) counts unmatched left rows the null partial would
      // skip — so only this orientation is tried.)
      case agg @ Aggregate(groups, aggs,
          j @ Join(l, r, LeftOuter, Some(cond), _), _) if groups.nonEmpty =>
        rewrite(groups, aggs, j, l, r, cond).getOrElse(agg)
      // column pruning may interpose an attribute-only Project — the
      // outer aggregate references only its own attrs, all still present
      // on the join output, so the Project drops from the rewritten shape
      case agg @ Aggregate(groups, aggs, Project(items,
          j @ Join(l, r, Inner, Some(cond), _)), _)
          if groups.nonEmpty &&
            items.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(groups, aggs, j, l, r, cond)
          .orElse(rewrite(groups, aggs, j, r, l, cond))
          .getOrElse(agg)
      case agg @ Aggregate(groups, aggs, Project(items,
          j @ Join(l, r, LeftOuter, Some(cond), _)), _)
          if groups.nonEmpty &&
            items.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(groups, aggs, j, l, r, cond).getOrElse(agg)
    }
  }

  /** (ndv per column name, live row count) of the fact relation under
    * attribute-only projects / filters. Aggregates (including our own
    * rewrite's partial) refuse the walk — fixpoint safety. */
  private def factStats(plan: LogicalPlan)
      : Option[(String => Option[Long], Long)] =
    GraftBatchShim.ndvStatsOf(plan).orElse(plan match {
      case Project(items, child)
          if items.forall(_.isInstanceOf[AttributeReference]) =>
        factStats(child)
      case Filter(_, child) => factStats(child)
      case _ => None
    })

  private sealed trait Agg
  private case class CountStar(id: ExprId, name: String) extends Agg
  private case class CountCol(id: ExprId, name: String,
      a: AttributeReference) extends Agg
  private case class SumCol(id: ExprId, name: String,
      a: AttributeReference) extends Agg
  private case class MinCol(id: ExprId, name: String,
      a: AttributeReference) extends Agg
  private case class MaxCol(id: ExprId, name: String,
      a: AttributeReference) extends Agg
  private case class GroupRef(a: AttributeReference) extends Agg

  private def rewrite(groups: Seq[Expression], aggs: Seq[NamedExpression],
      j: Join, factSide: LogicalPlan, dimSide: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    // group columns must be plain attributes of either side
    val groupAttrs = groups.map {
      case a: AttributeReference => a
      case _ => return None
    }
    // classify outputs; every aggregate input must be a fact attribute
    val outs: Seq[Agg] = aggs.map {
      case a: AttributeReference => GroupRef(a)
      case al @ Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), n)
          if l.value != null =>
        CountStar(al.exprId, n)
      case al @ Alias(AggregateExpression(Count(Seq(a: AttributeReference)), _, false, None, _), n)
          if factSide.outputSet.contains(a) =>
        CountCol(al.exprId, n, a)
      case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _), n)
          if al.dataType == LongType && factSide.outputSet.contains(a) =>
        SumCol(al.exprId, n, a)
      case al @ Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), n)
          if factSide.outputSet.contains(a) =>
        MinCol(al.exprId, n, a)
      case al @ Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), n)
          if factSide.outputSet.contains(a) =>
        MaxCol(al.exprId, n, a)
      case _ => return None
    }
    if (!outs.exists(o => !o.isInstanceOf[GroupRef])) return None
    // the partial's group keys: every fact attribute the JOIN CONDITION
    // or a GROUP column references. The condition itself must be
    // deterministic (it will evaluate against partial rows).
    if (!cond.deterministic) return None
    val factKeys: Seq[AttributeReference] =
      (cond.references.toSeq ++ groupAttrs)
        .collect { case a: AttributeReference
          if factSide.outputSet.contains(a) => a }
        .groupBy(_.exprId).map(_._2.head).toSeq
    if (factKeys.isEmpty) return None
    // every group column must live on one of the sides
    if (!groupAttrs.forall(a => factSide.outputSet.contains(a) ||
      dimSide.outputSet.contains(a))) return None

    // COST GATE: sketched NDVs for every partial key, product bounded
    val (ndvOf, liveRows) = factStats(factSide).getOrElse(return None)
    if (liveRows <= 0L) return None
    var keyProduct = 1.0
    factKeys.foreach { k =>
      ndvOf(k.name) match {
        case Some(n) => keyProduct *= math.max(1L, n).toDouble
        case None => return None
      }
      if (keyProduct > maxKeyRatio * liveRows) return None
    }

    // partial aggregate on the fact side: keys pass through with their
    // ORIGINAL attribute ids (the join condition keeps binding)
    val pAliases: Seq[(Agg, Option[Alias])] = outs.map {
      case o @ CountStar(_, _) =>
        o -> Some(Alias(new Count(Seq(Literal(1)))
          .toAggregateExpression(), "p_cnt")())
      case o @ CountCol(_, _, a) =>
        o -> Some(Alias(new Count(Seq(a)).toAggregateExpression(),
          s"p_nn_${a.name}")())
      case o @ SumCol(_, _, a) =>
        o -> Some(Alias(new Sum(a).toAggregateExpression(),
          s"p_sum_${a.name}")())
      case o @ MinCol(_, _, a) =>
        o -> Some(Alias(Min(a).toAggregateExpression(),
          s"p_min_${a.name}")())
      case o @ MaxCol(_, _, a) =>
        o -> Some(Alias(Max(a).toAggregateExpression(),
          s"p_max_${a.name}")())
      case o => o -> None
    }
    val partial = Aggregate(factKeys,
      factKeys ++ pAliases.flatMap(_._2), factSide)
    val pAttr: Map[ExprId, Attribute] = pAliases.collect {
      case (o: CountStar, Some(al)) => o.id -> al.toAttribute
      case (o: CountCol, Some(al)) => o.id -> al.toAttribute
      case (o: SumCol, Some(al)) => o.id -> al.toAttribute
      case (o: MinCol, Some(al)) => o.id -> al.toAttribute
      case (o: MaxCol, Some(al)) => o.id -> al.toAttribute
    }.toMap
    val newJoin = Join(partial, dimSide, j.joinType, Some(cond), j.hint)
    def reSum(a: Attribute): Expression = new Sum(a).toAggregateExpression()
    val newAggs: Seq[NamedExpression] = outs.map {
      case GroupRef(a) => a
      case CountStar(id, n) => Alias(reSum(pAttr(id)), n)(exprId = id)
      case CountCol(id, n, _) => Alias(reSum(pAttr(id)), n)(exprId = id)
      case SumCol(id, n, _) => Alias(reSum(pAttr(id)), n)(exprId = id)
      case MinCol(id, n, _) =>
        Alias(Min(pAttr(id)).toAggregateExpression(), n)(exprId = id)
      case MaxCol(id, n, _) =>
        Alias(Max(pAttr(id)).toAggregateExpression(), n)(exprId = id)
    }
    Some(Aggregate(groupAttrs, newAggs, newJoin))
  }
}
