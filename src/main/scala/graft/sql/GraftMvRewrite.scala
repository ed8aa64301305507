package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim
import org.apache.spark.sql.types.LongType

import graft.sources.{MaterializedView, VersionedTable}

/** Optimizer rule: answer GROUP BY aggregates over a graft table from a
  * REGISTERED, FRESH materialized view ([[graft.sources.MaterializedView]])
  * — the warehouse "materialized view query rewrite". A query like
  *
  * {{{ SELECT g, COUNT(*), SUM(v) FROM graft.`/fact` GROUP BY g }}}
  *
  * over a 100 TB fact with a maintained view becomes a scan of the view's
  * few kilobytes: the rewrite substitutes `Aggregate(query groups,
  * re-aggregated view columns, view scan)` for the whole source aggregate.
  * COUNT(*) re-aggregates as SUM(mv_count) and SUM(c) as SUM(sum_c), so
  * any grouping that is a SUBSET of the view's (a rollup) rewrites too —
  * partial sums compose exactly for the integral types the rewrite
  * accepts.
  *
  * Fires only when ALL of:
  *  - the aggregate's child is (a column-pruning projection of) a graft
  *    snapshot relation carrying registered views (`graft.mv.views`) and a
  *    pinned version — both attached at relation build, so tables without
  *    views cost one pattern match and zero manifest reads;
  *  - every grouping expression is a plain source column, every aggregate
  *    is COUNT(*) (non-distinct, unfiltered) or SUM(col) of LongType —
  *    fractional re-aggregation is declined (reordering float partial
  *    sums is not bit-exact), as is anything a COUNT/SUM view cannot
  *    answer (MIN/MAX/AVG/DISTINCT/FILTER);
  *  - a registered view's refresh watermark ([[VersionedTable.lastTxn]])
  *    equals the relation's pinned source version EXACTLY — a stale view
  *    (source moved, refresh hasn't) or a time-travel read of some other
  *    version silently declines, never approximates. The view is then
  *    read PINNED at the version whose watermark was checked, so a
  *    concurrent refresh cannot slide newer data under the rewrite.
  *
  * The substituted node preserves the original output attribute ids
  * (downstream operators keep binding), and SQL null semantics survive:
  * a global COUNT(*) over an empty table coalesces its SUM(mv_count) to
  * 0, and SUM-of-sums skips the per-group NULLs the view maintains for
  * all-NULL groups. Disable with `spark.graft.mv.rewrite.enabled=false`.
  */
case class GraftMvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.mv.rewrite.enabled", "true").toBoolean

  /** ((registered views, pinned source version), aggregate-side exprId →
    * source column name) — walking attribute-only projections the same way
    * [[GraftMetadataCount]] does. */
  private def sourceOf(plan: LogicalPlan)
      : Option[((Seq[String], Long), Map[ExprId, String])] =
    GraftBatchShim.mvRewriteInfoOf(plan) match {
      case Some(info) =>
        Some((info, plan.output.map(a => a.exprId -> a.name).toMap))
      case None => plan match {
        case Project(items, child) => sourceOf(child).map { case (info, base) =>
          (info, items.flatMap {
            case a: AttributeReference => base.get(a.exprId).map(a.exprId -> _)
            case al @ Alias(a: AttributeReference, _) =>
              base.get(a.exprId).map(al.exprId -> _)
            case _ => None // computed column: aggregates over it must decline
          }.toMap)
        }
        case _ => None
      }
    }

  /** What each output slot of the original aggregate needs from the view. */
  private sealed trait Out
  private case class GroupOut(id: ExprId, name: String, srcCol: String,
      dt: org.apache.spark.sql.types.DataType) extends Out
  private case class CountOut(id: ExprId, name: String) extends Out
  private case class SumOut(id: ExprId, name: String, srcCol: String) extends Out

  private def classify(e: NamedExpression,
      colOf: Map[ExprId, String]): Option[Out] = e match {
    case a: AttributeReference =>
      colOf.get(a.exprId).map(GroupOut(a.exprId, a.name, _, a.dataType))
    case al @ Alias(a: AttributeReference, n) =>
      colOf.get(a.exprId).map(GroupOut(al.exprId, n, _, a.dataType))
    case al @ Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), n)
        if l.value != null =>
      Some(CountOut(al.exprId, n))
    case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _), n)
        if al.dataType == LongType =>
      colOf.get(a.exprId).map(SumOut(al.exprId, n, _))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        rewrite(groupExprs, aggExprs, child).getOrElse(agg)
    }
  }

  private def rewrite(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] =
    for {
      ((views, srcV), colOf) <- sourceOf(child)
      groupCols <- traverse(groupExprs.map {
        case a: AttributeReference => colOf.get(a.exprId)
        case _ => None
      })
      outs <- traverse(aggExprs.map(classify(_, colOf)))
      plan <- views.iterator
        .flatMap(tryView(_, srcV, groupCols, outs)).nextOption()
    } yield plan

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def tryView(mvPath: String, srcV: Long, groupCols: Seq[String],
      outs: Seq[Out]): Option[LogicalPlan] = {
    // freshness, checked and then READ at the same pinned view version
    val hv = VersionedTable.latestVersion(spark, mvPath).getOrElse(return None)
    if (!VersionedTable.lastTxn(spark, mvPath, MaterializedView.App, Some(hv))
        .contains(srcV)) return None
    val props = VersionedTable.propertiesOf(spark, mvPath, Some(hv))
    def cols(k: String): Seq[String] = props.get(k).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val vGroup = cols(MaterializedView.GroupByKey).toSet
    val vSums = cols(MaterializedView.SumColsKey).toSet
    val neededGroups = outs.collect { case g: GroupOut => g.srcCol } ++ groupCols
    val neededSums = outs.collect { case s: SumOut => s.srcCol }
    if (!neededGroups.forall(vGroup) || !neededSums.forall(vSums)) return None

    val viewPlan = VersionedTable.read(spark, mvPath, Some(hv))
      .queryExecution.analyzed
    val attr: Map[String, Attribute] = viewPlan.output.map(a => a.name -> a).toMap
    def longAttr(n: String): Option[Attribute] =
      attr.get(n).filter(_.dataType == LongType)
    val cnt = longAttr(MaterializedView.CountCol).getOrElse(return None)
    // every referenced column must exist on the view with the exact type
    // the original output promised — else decline, never coerce
    val ok = outs.forall {
      case GroupOut(_, _, c, dt) => attr.get(c).exists(_.dataType == dt)
      case SumOut(_, _, c) => longAttr(MaterializedView.sumColName(c)).isDefined
      case _: CountOut => true
    } && groupCols.forall(attr.contains)
    if (!ok) return None

    def reSum(a: Attribute): Expression = new Sum(a).toAggregateExpression()
    val globalAgg = groupCols.isEmpty
    val newAggs: Seq[NamedExpression] = outs.map {
      case GroupOut(id, n, c, _) => Alias(attr(c), n)(exprId = id)
      case CountOut(id, n) =>
        // a GLOBAL count over an empty table is 0, but SUM over the empty
        // view would be NULL — coalesce restores COUNT's totality
        val e = if (globalAgg) Coalesce(Seq(reSum(cnt), Literal(0L)))
                else reSum(cnt)
        Alias(e, n)(exprId = id)
      case SumOut(id, n, c) =>
        Alias(reSum(attr(MaterializedView.sumColName(c))), n)(exprId = id)
    }
    Some(Aggregate(groupCols.map(attr(_)), newAggs, viewPlan))
  }
}
