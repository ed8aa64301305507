package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, DoubleType, IntegerType, LongType, ShortType}

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
  * MULTI-JOIN STARS: the fact side is found by DESCENDING the join tree —
  * `fact ⋈ dim1 ⋈ dim2 GROUP BY d1.g, d2.h` pre-aggregates the fact on
  * (fk1, fk2) below BOTH joins, whatever association order the optimizer
  * chose. Replication distributes through each join level identically for
  * the partial and for the raw rows (by induction on the path), so the
  * single-join exactness argument carries level by level. The descent
  * follows the side holding every aggregate input; joins off the path
  * (snowflaked dims) stay opaque.
  *
  * EXACTNESS needs no uniqueness or integrity: a fact row that joins k
  * dim rows contributes its values to k (dim-side) groups, and so does
  * its partial — replication distributes over COUNT-as-SUM, SUM, MIN and
  * MAX. What it does need:
  *  - INNER joins along the fact path (null-keyed fact rows drop
  *    identically on both shapes) or LEFT joins with the fact on the LEFT
  *    (an unmatched fact row and its unmatched partial surface the same
  *    null-dim-group row; fact-as-right is declined — COUNT(*) counts
  *    unmatched left rows a null partial would skip);
  *  - every aggregate input from ONE side (the fact), as COUNT(*)/
  *    COUNT(col)/SUM(integral|decimal)/MIN/MAX/AVG(integral|decimal) —
  *    float/double SUM and AVG decline (re-associating float partials is
  *    not bit-exact). DECIMAL partial sums re-associate exactly — the
  *    re-sum carries 10 extra digits (Spark's own two-phase aggregation
  *    makes the same re-association with the same headroom) and casts
  *    back to the original SUM type, going NULL on overflow exactly where
  *    the unrewritten SUM would. AVG decomposes into exact SUM + COUNT
  *    partials, recombined with the same Divide/cast tree
  *    [[Average.evaluateExpression]] builds — for integral inputs the
  *    decomposed sum is EXACT (long), where the original accumulates in
  *    double: values agree whenever the total is double-representable
  *    (≤2^53), beyond which the original is itself order-nondeterministic;
  *  - the join conditions' fact-side references and the fact-side group
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

  /** How deep the fact path may descend through the join tree — far above
    * any sane star (fact ⋈ 6 dims associated worst-case), just a cycle
    * guard. */
  private val MaxDepth = 6

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // column pruning may interpose attribute-only Projects — the outer
      // aggregate references only its own attrs, all still present on the
      // join output, so they drop from the rewritten shape
      case agg @ Aggregate(groups, aggs, child, _) if groups.nonEmpty =>
        stripProjects(child) match {
          case j: Join => rewrite(groups, aggs, j).getOrElse(agg)
          case _ => agg
        }
    }
  }

  private def stripProjects(plan: LogicalPlan): LogicalPlan = plan match {
    case Project(items, child)
        if items.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
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
      a: AttributeReference, dt: DataType) extends Agg
  private case class MinCol(id: ExprId, name: String,
      a: AttributeReference) extends Agg
  private case class MaxCol(id: ExprId, name: String,
      a: AttributeReference) extends Agg
  private case class AvgCol(id: ExprId, name: String,
      a: AttributeReference, dt: DataType) extends Agg
  private case class GroupRef(a: AttributeReference) extends Agg

  private def isExactIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def rewrite(groups: Seq[Expression], aggs: Seq[NamedExpression],
      j: Join): Option[LogicalPlan] = {
    // group columns must be plain attributes of some side
    val groupAttrs = groups.map {
      case a: AttributeReference => a
      case _ => return None
    }
    // classify outputs; each aggregate input must be a plain attribute —
    // fact-side membership is established by the descent (the chosen path
    // must carry every one of them)
    val outs: Seq[Agg] = aggs.map {
      case a: AttributeReference => GroupRef(a)
      case al @ Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), n)
          if l.value != null =>
        CountStar(al.exprId, n)
      case al @ Alias(AggregateExpression(Count(Seq(a: AttributeReference)), _, false, None, _), n) =>
        CountCol(al.exprId, n, a)
      case al @ Alias(AggregateExpression(Sum(a: AttributeReference, em), _, false, None, _), n)
          if em != EvalMode.TRY &&
            (al.dataType == LongType || al.dataType.isInstanceOf[DecimalType]) =>
        // TRY declines: a try_sum partial that overflowed to NULL would be
        // SKIPPED by the re-sum (a wrong value, not a NULL)
        SumCol(al.exprId, n, a, al.dataType)
      case al @ Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), n) =>
        MinCol(al.exprId, n, a)
      case al @ Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), n) =>
        MaxCol(al.exprId, n, a)
      // AVG decomposes into exact SUM + COUNT(non-null) partials. LEGACY
      // and ANSI only (overflow surfaces as null/throw identically from
      // the re-sum's cast; TRY nulls at a different granularity —
      // declined), and only exact input types: integral (long partial
      // sum) or decimal (the partial sum IS Average's own sumDataType).
      case al @ Alias(AggregateExpression(Average(a: AttributeReference, em), _, false, None, _), n)
          if em != EvalMode.TRY &&
            (isExactIntegral(a.dataType) || a.dataType.isInstanceOf[DecimalType]) =>
        AvgCol(al.exprId, n, a, al.dataType)
      case _ => return None
    }
    if (!outs.exists(o => !o.isInstanceOf[GroupRef])) return None
    val aggInputs = AttributeSet(outs.collect {
      case CountCol(_, _, a) => a
      case SumCol(_, _, a, _) => a
      case MinCol(_, _, a) => a
      case MaxCol(_, _, a) => a
      case AvgCol(_, _, a, _) => a
    })
    // every group column must come out of the join
    if (!groupAttrs.forall(j.outputSet.contains)) return None
    plant(j, Nil, groupAttrs, aggInputs, outs, MaxDepth)
      .map { case (newChild, pAttr) =>
        Aggregate(groupAttrs, reAggregate(outs, pAttr), newChild)
      }
  }

  /** Descend the join tree along the fact path, planting the partial
    * aggregate at the fact leaf and rebuilding the joins above it.
    * `keys` accumulates the fact-side attributes every enclosing join
    * condition references — they become partial group keys so the
    * rebuilt conditions keep binding (original attribute ids pass
    * through the partial). */
  private def plant(plan: LogicalPlan, keys: Seq[AttributeReference],
      groupAttrs: Seq[AttributeReference], aggInputs: AttributeSet,
      outs: Seq[Agg], depth: Int)
      : Option[(LogicalPlan, Map[ExprId, Seq[Attribute]])] = {
    if (depth <= 0) return None
    // leaf attempt: a sketched graft relation (under projects/filters)
    // holding every aggregate input and every accumulated key
    if (aggInputs.subsetOf(plan.outputSet) &&
        keys.forall(plan.outputSet.contains)) {
      factStats(plan) match {
        case Some((ndvOf, liveRows)) =>
          return buildPartial(plan, keys, groupAttrs, outs, ndvOf, liveRows)
        case None => ()
      }
    }
    plan match {
      case Join(l, r, jt, Some(cond), hint)
          if (jt == Inner || jt == LeftOuter) && cond.deterministic =>
        // candidate fact sides: LEFT always; RIGHT only for INNER (an
        // unmatched left row of a LEFT join must keep counting)
        val sides: Seq[Boolean] =
          if (jt == Inner) Seq(true, false) else Seq(true)
        sides.iterator.flatMap { onLeft =>
          val (side, other) = if (onLeft) (l, r) else (r, l)
          if (!aggInputs.subsetOf(side.outputSet)) None
          else {
            // enclosing keys must all route to one side or the other;
            // those on the fact side descend, the rest pass through above
            val (mine, theirs) = keys.partition(side.outputSet.contains)
            if (!theirs.forall(other.outputSet.contains)) None
            else {
              val condKeys = cond.references.toSeq.collect {
                case a: AttributeReference if side.outputSet.contains(a) => a
              }
              plant(side, dedup(mine ++ condKeys), groupAttrs, aggInputs,
                outs, depth - 1).map { case (newSide, pAttr) =>
                val nj = if (onLeft) Join(newSide, other, jt, Some(cond), hint)
                         else Join(other, newSide, jt, Some(cond), hint)
                (nj, pAttr)
              }
            }
          }
        }.nextOption()
      case Project(items, child)
          if items.forall(_.isInstanceOf[AttributeReference]) =>
        plant(child, keys, groupAttrs, aggInputs, outs, depth - 1)
      case _ => None
    }
  }

  private def dedup(as: Seq[AttributeReference]): Seq[AttributeReference] =
    as.groupBy(_.exprId).map(_._2.head).toSeq

  /** The partial aggregate at the fact leaf: keys pass through with their
    * ORIGINAL attribute ids (every rebuilt join condition keeps binding);
    * each output's partial aliases map back through `pAttr`. */
  private def buildPartial(factSide: LogicalPlan,
      keys: Seq[AttributeReference], groupAttrs: Seq[AttributeReference],
      outs: Seq[Agg], ndvOf: String => Option[Long], liveRows: Long)
      : Option[(LogicalPlan, Map[ExprId, Seq[Attribute]])] = {
    val factKeys = dedup(keys ++ groupAttrs.filter(factSide.outputSet.contains))
    if (factKeys.isEmpty) return None
    // COST GATE: sketched NDVs for every partial key, product bounded
    if (liveRows <= 0L) return None
    var keyProduct = 1.0
    factKeys.foreach { k =>
      ndvOf(k.name) match {
        case Some(n) => keyProduct *= math.max(1L, n).toDouble
        case None => return None
      }
      if (keyProduct > maxKeyRatio * liveRows) return None
    }
    val pAliases: Seq[(Agg, Seq[Alias])] = outs.map {
      case o @ CountStar(_, _) =>
        o -> Seq(Alias(new Count(Seq(Literal(1)))
          .toAggregateExpression(), "p_cnt")())
      case o @ CountCol(_, _, a) =>
        o -> Seq(Alias(new Count(Seq(a)).toAggregateExpression(),
          s"p_nn_${a.name}")())
      case o @ SumCol(_, _, a, _) =>
        o -> Seq(Alias(new Sum(a).toAggregateExpression(),
          s"p_sum_${a.name}")())
      case o @ MinCol(_, _, a) =>
        o -> Seq(Alias(Min(a).toAggregateExpression(),
          s"p_min_${a.name}")())
      case o @ MaxCol(_, _, a) =>
        o -> Seq(Alias(Max(a).toAggregateExpression(),
          s"p_max_${a.name}")())
      case o @ AvgCol(_, _, a, _) =>
        o -> Seq(
          Alias(new Sum(a).toAggregateExpression(), s"p_asum_${a.name}")(),
          Alias(new Count(Seq(a)).toAggregateExpression(),
            s"p_acnt_${a.name}")())
      case o => o -> Nil
    }
    val partial = Aggregate(factKeys,
      factKeys ++ pAliases.flatMap(_._2), factSide)
    val pAttr: Map[ExprId, Seq[Attribute]] = pAliases.collect {
      case (o: CountStar, als) => o.id -> als.map(_.toAttribute)
      case (o: CountCol, als) => o.id -> als.map(_.toAttribute)
      case (o: SumCol, als) => o.id -> als.map(_.toAttribute)
      case (o: MinCol, als) => o.id -> als.map(_.toAttribute)
      case (o: MaxCol, als) => o.id -> als.map(_.toAttribute)
      case (o: AvgCol, als) => o.id -> als.map(_.toAttribute)
    }.toMap
    Some((partial, pAttr))
  }

  private def reAggregate(outs: Seq[Agg],
      pAttr: Map[ExprId, Seq[Attribute]]): Seq[NamedExpression] = {
    def reSum(a: Attribute): Expression = new Sum(a).toAggregateExpression()
    /** Re-summed partial cast back to the ORIGINAL output type: identity
      * for long, a precision-narrowing cast for decimal that goes NULL on
      * overflow exactly where the unrewritten SUM's CheckOverflowInSum
      * would (ANSI throws in both). */
    def reSumAs(a: Attribute, dt: DataType): Expression = {
      val s = reSum(a)
      if (s.dataType == dt) s else Cast(s, dt)
    }
    outs.map {
      case GroupRef(a) => a
      case CountStar(id, n) => Alias(reSum(pAttr(id).head), n)(exprId = id)
      case CountCol(id, n, _) => Alias(reSum(pAttr(id).head), n)(exprId = id)
      case SumCol(id, n, _, dt) =>
        Alias(reSumAs(pAttr(id).head, dt), n)(exprId = id)
      case MinCol(id, n, _) =>
        Alias(Min(pAttr(id).head).toAggregateExpression(), n)(exprId = id)
      case MaxCol(id, n, _) =>
        Alias(Max(pAttr(id).head).toAggregateExpression(), n)(exprId = id)
      case AvgCol(id, n, a, dt) =>
        val Seq(sumP, cntP) = pAttr(id)
        val cnt = reSum(cntP)
        // mirror Average.evaluateExpression's recombination tree so the
        // division/rounding semantics are the original's
        val e = a.dataType match {
          case d: DecimalType =>
            // Average's own sumDataType / LongDecimal divisor types
            val sumDT = DecimalType(math.min(d.precision + 10, 38), d.scale)
            Cast(Divide(reSumAs(sumP, sumDT),
              Cast(cnt, DecimalType(20, 0)), EvalMode.LEGACY), dt)
          case _ =>
            Divide(Cast(reSum(sumP), DoubleType), Cast(cnt, DoubleType),
              EvalMode.LEGACY)
        }
        Alias(e, n)(exprId = id)
    }
  }
}
