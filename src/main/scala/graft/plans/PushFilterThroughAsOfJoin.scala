package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.plans.NativeAsOfJoin.AsOfJoinPlan

/** Custom optimizer rule: Catalyst's PushDownPredicates doesn't know the
  * custom as-of node, so a Filter above it would stay above it and the
  * predicate would never reach the parquet scan. Left-side-only conjuncts
  * are safe to push through a left-preserving as-of join (each left row is
  * matched independently), which restores scan-level pushdown for the
  * common "filter the probe side" pattern.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
