package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.GraftBatchShim

/** Session extensions wiring graft tables into the SQL surface:
  *
  * {{{
  *   spark.sql.extensions   = graft.sql.GraftExtensions
  *   spark.sql.catalog.graft = graft.sql.GraftCatalog
  * }}}
  *
  *  - [[GraftAnalysis]] (resolution rule): swaps every READ of a
  *    [[GraftTable]] V2 relation for the V1 `HadoopFsRelation` path — the
  *    same relation `format("graft-table")` builds — so SQL reads get
  *    plan-time manifest skipping, DV/column-mapping inside the scan,
  *    vectorized parquet and whole-stage codegen. It also translates
  *    `MERGE INTO` over a graft table to [[graft.sources.VersionedTable.upsert]]
  *    (the reference's documented MERGE contract,
  *    reference/docs/runbooks/silver-transform.md:114-122).
  *  - [[GraftMetadataCount]] (optimizer rule): answers a bare `COUNT(*)`
  *    over an unfiltered graft snapshot from the commit manifest — zero
  *    data files opened, at any scale. Applies to BOTH the SQL path and
  *    `spark.read.format("graft-table").load(p).count()`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => GraftAnalysis(session))
    ext.injectOptimizerRule(session => GraftMetadataCount(session))
  }
}

/** Resolution-batch rule: V2→V1 read conversion + MERGE translation. */
case class GraftAnalysis(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // A relation that is the TARGET of a write must stay a V2 relation:
    // AppendData/OverwriteByExpression plan through the table's V1-write
    // fallback (converting the target would route INSERT INTO through
    // InsertIntoHadoopFsRelationCommand — raw parquet into the table root,
    // bypassing the commit log). Merge targets are translated by the merge
    // case below, never converted. Identity-based: the same table read in
    // the QUERY side of a write is still converted.
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def protect(p: LogicalPlan): Unit = p.collect {
      case r: DataSourceV2Relation => writeTargets.add(r)
    }
    plan.foreach {
      case w: V2WriteCommand => protect(w.table)
      case m: MergeIntoTable => protect(m.targetTable)
      case i: InsertIntoStatement => protect(i.table)
      case _ => ()
    }

    plan.resolveOperatorsUp {
      case m: MergeIntoTable if m.resolved && graftTarget(m).isDefined =>
        GraftMergeTranslation.translate(spark, m, graftTarget(m).get)

      case r: DataSourceV2Relation if !writeTargets.contains(r) &&
          r.table.isInstanceOf[GraftTable] && r.timeTravelSpec.isEmpty =>
        // same output attrs → references above keep binding
        GraftBatchShim.logicalRelation(
          r.table.asInstanceOf[GraftTable].relation, r.output)
    }
  }

  private def graftTarget(m: MergeIntoTable): Option[GraftTable] =
    EliminateSubqueryAliases(m.targetTable) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        Some(r.table.asInstanceOf[GraftTable])
      case _ => None
    }
}

/** Optimizer rule: a bare `COUNT(*)` (no filter, no grouping, no DISTINCT)
  * over a graft snapshot whose manifest recorded per-file row counts is a
  * METADATA question — [[org.apache.spark.sql.graft.GraftBatchShim.liveRowsOf]]
  * answers it exactly (per-file rows minus deletion-vector marks, the
  * [[graft.sources.VersionedTable.countRows]] contract), so the whole scan
  * collapses to a one-row local relation. Projections are cardinality-
  * preserving and therefore transparent; any Filter/Limit/expansion
  * disables the rewrite. */
case class GraftMetadataCount(spark: SparkSession) extends Rule[LogicalPlan] {

  private def countStar(e: Expression): Boolean = e match {
    case Alias(child, _) => countStar(child)
    case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _) =>
      l.value != null
    case _ => false
  }

  private def snapshotRows(plan: LogicalPlan): Option[Long] = plan match {
    case Project(_, child) => snapshotRows(child) // never changes cardinality
    case other => GraftBatchShim.liveRowsOf(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(countStar) =>
      snapshotRows(child) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(org.apache.spark.sql.catalyst.InternalRow(
              agg.output.map(_ => n): _*)))
        case None => agg
      }
  }
}
