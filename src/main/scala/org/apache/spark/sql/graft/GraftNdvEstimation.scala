package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualNullSafe, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** CBO-lite join-side estimation from manifest NDV sketches (the
  * broadcast-decision half of what a full cost-based optimizer buys).
  *
  * Spark's size-only stats propagation keeps a Filter's size estimate at
  * its child's, so `big.join(dim.filter(col === v))` plans a sort-merge
  * join whenever the UNFILTERED dim exceeds the broadcast threshold — even
  * when the filter provably keeps a handful of rows. Delta solves this
  * with table-level column stats; graft stores mergeable per-file KMV
  * sketches in the manifest (`ANALYZE ... COMPUTE NDV`,
  * [[graft.sources.VersionedTable.analyzeNdv]]) and this rule applies the
  * classic equality selectivity `1/ndv` (`|list|/ndv` for IN) to the
  * scan's honest on-disk size, republishing the relation with the
  * estimate. The join planner then reads the shrunken size and flips to a
  * broadcast hash join when it clears the threshold.
  *
  * Conservative by construction: only top-level equality/IN conjuncts on
  * sketched columns contribute (anything else estimates 1.0); un-analyzed
  * files leave their values out of the sketch, which UNDERestimates NDV
  * and therefore OVERestimates surviving size — the STALE-SKETCH
  * direction can never cause an unsafe broadcast. The SKEW direction can:
  * `1/ndv` assumes uniform value frequency, and a column where one value
  * holds most rows survives far larger than the estimate. Two guards
  * bound that exposure: the combined selectivity is FLOORED at
  * `spark.graft.ndv.selectivityFloor` (default 0.001 — a flip needs the
  * unfiltered side within 1000× of the broadcast threshold, capping the
  * worst-case mistaken broadcast), and AQE's runtime re-plan corrects the
  * join strategy from observed sizes at execution. This rule fixes the
  * STATIC plan, which is what decides whether the first execution
  * shuffles 100 TB. Idempotent under the optimizer fix-point via the
  * index's `estimated` marker.
  */
case class GraftNdvJoinEstimation(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        rel @ LogicalRelation(
          r @ HadoopFsRelation(g: GraftFileIndex, _, _, _, _, _), _, _, _, _))
        if !g.estimated =>
      // skew floor: 1/ndv is a uniform-frequency assumption; never let a
      // heavy-hitter column shrink an estimate below this fraction
      val floor = spark.conf.getOption("spark.graft.ndv.selectivityFloor")
        .map(_.toDouble).getOrElse(0.001)
      val sel = math.max(selectivity(cond, g.ndvOf), floor)
      if (sel >= 1.0) f
      else {
        val est = math.max(1L, math.ceil(g.sizeInBytes.toDouble * sel).toLong)
        Filter(cond, rel.copy(relation =
          r.copy(location = g.withSizeEstimate(est))(
            spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])))
      }
  }

  /** Combined selectivity of the top-level conjuncts: product of `n/ndv`
    * over equality/IN predicates on sketched columns, 1.0 for everything
    * else (including un-sketched columns — no guess without a sketch). */
  private def selectivity(cond: Expression,
      ndvOf: String => Option[Long]): Double = {
    def eqSel(a: AttributeReference, n: Int): Double =
      ndvOf(a.name).filter(_ > 0L)
        .map(d => math.min(1.0, n.toDouble / d)).getOrElse(1.0)
    def conj(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conj(l) ++ conj(r)
      case other => Seq(other)
    }
    conj(cond).foldLeft(1.0) { (acc, e) =>
      acc * (e match {
        case EqualTo(a: AttributeReference, _: Literal) => eqSel(a, 1)
        case EqualTo(_: Literal, a: AttributeReference) => eqSel(a, 1)
        case EqualNullSafe(a: AttributeReference, _: Literal) => eqSel(a, 1)
        case EqualNullSafe(_: Literal, a: AttributeReference) => eqSel(a, 1)
        case In(a: AttributeReference, vs)
            if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
          eqSel(a, vs.size)
        case _ => 1.0
      })
    }
  }
}

/** NDV-gated shuffle-partition sizing (query-stage-prep rule): an
  * aggregation exchange hashing on columns whose manifest NDV sketches
  * bound the distinct-group count gets its STATIC partition count capped
  * at `headroom × Πndv` — a rollup that provably collapses to dozens of
  * groups should not fan its shuffle into `spark.sql.shuffle.partitions`
  * map buckets and reduce tasks. AQE's coalescing fixes the reduce side
  * from observed bytes at runtime; this fixes what AQE cannot see until
  * the map side has already run — the number of buckets every map task
  * writes and the scheduler overhead of the empty reducers, which at
  * 1000-executor scale (default 200+ partitions per exchange) is pure
  * waste for a 25-group rollup.
  *
  * SAFETY — the rule only ever touches the exchange FEEDING AN AGGREGATE
  * (matched through an optional Sort, single-child ClusteredDistribution):
  * join exchanges are left alone, because sizing one side of a shuffled
  * join differently from the other would break the co-partitioning
  * EnsureRequirements established. Partition keys must be plain attributes
  * resolving BY EXPRESSION ID to a graft scan's output (grouping
  * pass-through preserves ids; computed keys and renames miss and
  * decline). A KMV sketch can under-estimate, so the cap carries a
  * configurable headroom (`spark.graft.shufflePartitions.headroom`,
  * default 2.0) — and a wrong bound can only cost balance, never
  * correctness (hash partitioning is correct at any count). Disable with
  * `spark.graft.shufflePartitions.enabled=false`. */
case class GraftShufflePartitionSizing(spark: SparkSession)
    extends Rule[org.apache.spark.sql.execution.SparkPlan] {
  import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
  import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.shufflePartitions.enabled", "true").toBoolean

  private def headroom: Double = spark.sessionState.conf
    .getConfString("spark.graft.shufflePartitions.headroom", "2.0").toDouble

  // KMV sketches can UNDER-estimate, and a query-stage-prep resize is
  // unrecoverable at runtime (AQE coalesces, never splits), so the capped
  // count never drops below this floor (clamped to the original count for
  // genuinely tiny exchanges). Bounds the downside of a bad sketch to
  // "floor reducers" instead of "one reducer".
  private def minPartitions: Int = spark.sessionState.conf
    .getConfString("spark.graft.shufflePartitions.min", "4").toInt

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg: BaseAggregateExec => agg.child match {
        case ex: ShuffleExchangeExec =>
          agg.withNewChildren(Seq(resize(ex)))
        case sort @ SortExec(_, _, ex: ShuffleExchangeExec, _) =>
          agg.withNewChildren(Seq(sort.copy(child = resize(ex))))
        case _ => agg
      }
    }
  }

  private def resize(ex: ShuffleExchangeExec): SparkPlan = ex match {
    case ShuffleExchangeExec(hp @ HashPartitioning(exprs, n),
        child, ENSURE_REQUIREMENTS, _)
        if exprs.nonEmpty &&
          exprs.forall(_.isInstanceOf[AttributeReference]) =>
      groupBound(child, exprs.map(_.asInstanceOf[AttributeReference]))
        .map { k =>
          val floor = math.min(n.toLong, math.max(1, minPartitions).toLong)
          val capped = math.max(floor, math.ceil(k * headroom).toLong)
          if (capped >= n) ex
          else ex.copy(outputPartitioning =
            HashPartitioning(exprs, capped.toInt))
        }.getOrElse(ex)
    case _ => ex
  }

  /** Πndv over the partition keys, each resolved by exprId to a graft
    * scan's output beneath the exchange — None unless EVERY key is a
    * sketched scan column (no guess without a sketch), or as soon as the
    * product already exceeds every useful cap. */
  private def groupBound(plan: SparkPlan,
      keys: Seq[AttributeReference]): Option[Long] = {
    val scans = plan.collect {
      case s: FileSourceScanExec
          if s.relation.location.isInstanceOf[GraftFileIndex] =>
        (s.output, s.relation.location.asInstanceOf[GraftFileIndex].ndvOf)
    }
    if (scans.isEmpty) return None
    var product = 1.0
    keys.foreach { k =>
      val ndv = scans.collectFirst {
        case (out, ndvOf) if out.exists(_.exprId == k.exprId) =>
          ndvOf(k.name)
      }.flatten.getOrElse(return None)
      product *= math.max(1L, ndv).toDouble
      if (product > 1e9) return None // far past any partition count
    }
    Some(product.toLong)
  }
}
