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
    // generated-partition-column pruning: predicates on the BASE column of
    // a generated partition column derive partition predicates (monotone
    // generation shapes only) — directory pruning for ts-range queries
    // over to_date(ts)-partitioned tables
    ext.injectOptimizerRule(session =>
      org.apache.spark.sql.graft.GraftDerivePartitionFilters(session))
    // CBO-lite: equality-selectivity size estimates from manifest NDV
    // sketches (ANALYZE ... COMPUTE NDV) — flips eligible joins on
    // filtered graft scans to broadcast in the STATIC plan
    ext.injectOptimizerRule(session =>
      org.apache.spark.sql.graft.GraftNdvJoinEstimation(session))
    // NDV-gated shuffle-partition sizing: an aggregation exchange hashing
    // on sketched scan columns caps its STATIC partition count at the
    // provable group bound — map tasks stop writing (and the scheduler
    // stops launching) hundreds of empty buckets for a dozens-group rollup
    ext.injectQueryStagePrepRule(session =>
      org.apache.spark.sql.graft.GraftShufflePartitionSizing(session))
    // materialized-view query rewrite: GROUP BY aggregates over a source
    // with a registered FRESH view answer from the view's few rows
    ext.injectOptimizerRule(session => GraftMvRewrite(session))
    // PK/FK join elimination: a star join the query reads no dim column
    // from drops entirely, licensed by a validated FOREIGN KEY pin
    ext.injectOptimizerRule(session => GraftJoinElimination(session))
    // DISTINCT elimination: SELECT DISTINCT over columns covering a
    // pinned UNIQUE key is an identity — the dedup shuffle drops
    ext.injectOptimizerRule(session => GraftDistinctElimination(session))
    // eager aggregation (AFTER the strictly-better rewrites above): a
    // star aggregate's fact side pre-aggregates on the join keys when
    // NDV sketches prove the rollup collapses it
    ext.injectOptimizerRule(session => GraftEagerAggregation(session))
    // maintenance statements Spark's grammar lacks (OPTIMIZE / VACUUM /
    // RESTORE / DESCRIBE HISTORY) — everything else delegates verbatim
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // Delta's `table_changes` as a TABLE-VALUED FUNCTION:
    //   SELECT * FROM graft_table_changes('/path', fromV, toV)
    // the row-level CDF of versions (fromV, toV], _change_type-tagged;
    // fromV = 0 serves the toV snapshot as inserts (initial load)
    ext.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftExtensions].getName, "graft_table_changes"),
      (args: Seq[Expression]) => GraftExtensions.tableChangesPlan(args)))
    // the row-IDENTITY change feed (requires graft.rowTracking):
    //   SELECT * FROM graft_row_changes('/path', fromV, toV)
    // rewritten-but-unchanged rows collapse to nothing; value changes pair
    // as update_preimage/update_postimage under one stable _graft_row_id
    ext.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_row_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftExtensions].getName, "graft_row_changes"),
      (args: Seq[Expression]) => GraftExtensions.rowChangesPlan(args)))
  }
}

object GraftExtensions {
  /** Build the CDF plan for `graft_table_changes(path, fromV, toV)` —
    * arguments must be literals (the range pins which versions diff; an
    * expression-valued range would make the plan's schema dynamic). */
  private def changesArgs(fn: String, args: Seq[Expression]): (String, Long, Long) = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"$fn(path, fromVersion, toVersion): $msg")
    if (args.size != 3) fail(s"expected 3 arguments, got ${args.size}")
    val path = args.head match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case other => fail(s"path must be a string literal (got ${other.sql})")
    }
    def lng(e: Expression, what: String): Long = e match {
      case Literal(v: java.lang.Integer, _) => v.longValue
      case Literal(v: java.lang.Long, _) => v.longValue
      case other => fail(s"$what must be an integer literal (got ${other.sql})")
    }
    (path, lng(args(1), "fromVersion"), lng(args(2), "toVersion"))
  }

  private[sql] def tableChangesPlan(args: Seq[Expression]): LogicalPlan = {
    val (path, fromV, toV) = changesArgs("graft_table_changes", args)
    val spark = SparkSession.active
    GraftBatchShim.ofRelation(spark,
      graft.sources.VersionedTable.changesRelation(spark, path, fromV, toV))
      .queryExecution.logical
  }

  private[sql] def rowChangesPlan(args: Seq[Expression]): LogicalPlan = {
    val (path, fromV, toV) = changesArgs("graft_row_changes", args)
    val spark = SparkSession.active
    GraftBatchShim.ofRelation(spark,
      graft.sources.VersionedTable.rowChangesRelation(spark, path, fromV, toV))
      .queryExecution.logical
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
      case d: DeleteFromTable => protect(d.table)
      case u: UpdateTable => protect(u.table)
      // ALTER TABLE … (ADD CONSTRAINT binds its CHECK expression against
      // the relation child) — converting it would hide the V2 relation
      // from Spark's own DDL resolution (ResolveSessionCatalog probes any
      // LogicalRelation for a catalogTable identifier and ours has none)
      case a: AlterTableCommand => protect(a.table)
      case a: AddCheckConstraint => protect(a.child)
      case _ => ()
    }

    plan.resolveOperatorsUp {
      case m: MergeIntoTable if m.resolved && graftTarget(m).isDefined =>
        GraftMergeTranslation.translate(spark, m, graftTarget(m).get)

      case d: DeleteFromTable if d.resolved && graftRelOf(d.table).isDefined =>
        GraftDmlTranslation.delete(spark, d, graftRelOf(d.table).get)

      case u: UpdateTable if u.resolved && graftRelOf(u.table).isDefined =>
        GraftDmlTranslation.update(spark, u, graftRelOf(u.table).get)

      case r: DataSourceV2Relation if !writeTargets.contains(r) &&
          r.table.isInstanceOf[GraftTable] && r.timeTravelSpec.isEmpty =>
        // same output attrs → references above keep binding
        GraftBatchShim.logicalRelation(
          r.table.asInstanceOf[GraftTable].relation, r.output)
    }
  }

  private def graftTarget(m: MergeIntoTable): Option[GraftTable] =
    graftRelOf(m.targetTable)

  private def graftRelOf(p: LogicalPlan): Option[GraftTable] =
    EliminateSubqueryAliases(p) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        Some(r.table.asInstanceOf[GraftTable])
      case _ => None
    }
}

/** Optimizer rule: a bare `COUNT(*)` / `MIN(col)` / `MAX(col)` aggregate
  * (no filter, no grouping, no DISTINCT) over a graft snapshot is a
  * METADATA question — the manifest's per-file row counts (minus
  * deletion-vector marks, the [[graft.sources.VersionedTable.countRows]]
  * contract) and exact per-file min/max stats
  * ([[graft.sources.VersionedTable.minMaxFromStats]]: refuses marks,
  * truncated bounds, missing stats) answer it without opening a data file,
  * so the whole scan collapses to a one-row local relation. Every
  * aggregate in the list must be answerable or the plan is left alone.
  * Projections are transparent for COUNT (cardinality-preserving) and for
  * MIN/MAX only when the projected item passes the relation's own column
  * through (a computed column reusing the name must not read the base
  * column's stats); any Filter/Limit/expansion disables the rewrite. */
case class GraftMetadataCount(spark: SparkSession) extends Rule[LogicalPlan] {

  /** (relation metadata hooks, aggregate-attr exprId → relation column). */
  private def snapshotOf(plan: LogicalPlan): Option[
      ((Option[Long], String => Option[(Any, Any)]), Map[ExprId, String])] =
    GraftBatchShim.graftMetadataOf(plan) match {
      case Some(meta) =>
        Some((meta, plan.output.map(a => a.exprId -> a.name).toMap))
      case None => plan match {
        case Project(items, child) => snapshotOf(child).map { case (meta, base) =>
          (meta, items.flatMap {
            case a: AttributeReference => base.get(a.exprId).map(a.exprId -> _)
            case al @ Alias(a: AttributeReference, _) =>
              base.get(a.exprId).map(al.exprId -> _)
            case _ => None // computed column: MIN/MAX over it must decline
          }.toMap)
        }
        case _ => None
      }
    }

  /** Stats-domain bound → Catalyst internal value for the column type;
    * None (decline) on any shape the conversion cannot do EXACTLY. */
  private def internalOf(v: Any, dt: org.apache.spark.sql.types.DataType): Option[Any] = {
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

  private def answer(e: Expression, liveRows: Option[Long],
      minMaxOf: String => Option[(Any, Any)],
      colOf: Map[ExprId, String]): Option[Any] = e match {
    case Alias(child, _) => answer(child, liveRows, minMaxOf, colOf)
    case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
        if l.value != null => liveRows
    case AggregateExpression(
        org.apache.spark.sql.catalyst.expressions.aggregate.Min(a: AttributeReference),
        _, false, None, _) =>
      colOf.get(a.exprId).flatMap(minMaxOf(_))
        .flatMap(b => internalOf(b._1, a.dataType))
    case AggregateExpression(
        org.apache.spark.sql.catalyst.expressions.aggregate.Max(a: AttributeReference),
        _, false, None, _) =>
      colOf.get(a.exprId).flatMap(minMaxOf(_))
        .flatMap(b => internalOf(b._2, a.dataType))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      val direct = snapshotOf(child).flatMap {
        case ((liveRows, minMaxOf), colOf) =>
          val values = aggExprs.map(answer(_, liveRows, minMaxOf, colOf))
          if (values.forall(_.isDefined))
            Some(LocalRelation(agg.output,
              Seq(org.apache.spark.sql.catalyst.InternalRow(
                values.map(_.get): _*))))
          else None
      }
      // fallback: GLOBAL aggregates of PARTITION columns (file stats never
      // cover them) answer from the census — `SELECT max(event_date) FROM
      // t [WHERE day-filter]`, the freshness probe every ops dashboard
      // runs, with COUNT's 0-on-empty / MIN-MAX's null-on-empty totality
      direct.orElse(censusGlobal(agg, aggExprs, child)).getOrElse(agg)
    // GROUP BY partition columns — the partition census (`SELECT
    // event_date, COUNT(*) … GROUP BY event_date`, SHOW-PARTITIONS-style
    // DISTINCT, per-partition MIN/MAX of partition columns): the manifest
    // knows every partition's EXACT live row count (per-file rows minus
    // DV marks), so the whole aggregate — scan, shuffle and all —
    // collapses to a LocalRelation of one row per live partition.
    // Filters referencing only partition columns evaluate driver-side
    // against the census tuples (the same values directory pruning uses).
    case agg @ Aggregate(groups, aggExprs, child, _) if groups.nonEmpty =>
      censusOf(child).flatMap { case (census, idxOf, partSchema, conds) =>
        rewriteCensus(agg, groups, aggExprs, census, idxOf, partSchema,
          conds)
      }.getOrElse(agg)
  }

  /** The GLOBAL census answer: COUNT(*) / COUNT(partition cols) /
    * MIN/MAX(partition col) over (partition-only filters over) a
    * census-carrying relation, with SQL's empty-input totality (COUNT 0,
    * MIN/MAX NULL). */
  private def censusGlobal(agg: Aggregate, aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] =
    censusOf(child).flatMap { case (census, idxOf, partSchema, conds) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
      import org.apache.spark.sql.catalyst.util.TypeUtils
      val preds = conds.map(
        org.apache.spark.sql.catalyst.expressions.Predicate.createInterpreted)
      val live = census.filter { case (row, n) =>
        n > 0L && preds.forall(_.eval(row))
      }
      val fields = partSchema.fields
      def valueAt(row: InternalRow, i: Int): Any =
        row.get(i, fields(i).dataType)
      def colIdx(e: Expression): Option[Int] = e match {
        case a: AttributeReference => idxOf.get(a.exprId)
        case _ => None
      }
      def extremum(i: Int, dt: org.apache.spark.sql.types.DataType,
          takeMax: Boolean): Any = {
        val vs = live.map(_._1).filterNot(_.isNullAt(i)).map(valueAt(_, i))
        if (vs.isEmpty) null
        else if (takeMax) vs.max(TypeUtils.getInterpretedOrdering(dt))
        else vs.min(TypeUtils.getInterpretedOrdering(dt))
      }
      val values = aggExprs.map {
        case Alias(e, _) => e match {
          case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
              if l.value != null =>
            live.map(_._2).sum
          case AggregateExpression(Count(args), _, false, None, _)
              if args.nonEmpty =>
            val is = args.map(colIdx(_).getOrElse(return None))
            live.filter(e => is.forall(i => !e._1.isNullAt(i)))
              .map(_._2).sum
          case AggregateExpression(Min(a), _, false, None, _) =>
            extremum(colIdx(a).getOrElse(return None), a.dataType,
              takeMax = false)
          case AggregateExpression(Max(a), _, false, None, _) =>
            extremum(colIdx(a).getOrElse(return None), a.dataType,
              takeMax = true)
          case _ => return None
        }
        case _ => return None
      }
      Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
    }

  /** Census walk: attribute-only projections and partition-column-only
    * filters over a census-carrying graft relation. Returns (census,
    * exprId → partition field index, partition schema, filter conjuncts
    * PRE-BOUND to census tuple indices). */
  private def censusOf(plan: LogicalPlan): Option[(
      Seq[(org.apache.spark.sql.catalyst.InternalRow, Long)],
      Map[ExprId, Int], org.apache.spark.sql.types.StructType,
      Seq[Expression])] =
    GraftBatchShim.graftPartitionCensusOf(plan) match {
      case Some((partSchema, census)) =>
        val idxOf = plan.output.flatMap { a =>
          val i = partSchema.fieldNames.indexOf(a.name)
          if (i >= 0) Some(a.exprId -> i) else None
        }.toMap
        Some((census, idxOf, partSchema, Nil))
      case None => plan match {
        case Project(items, c) => censusOf(c).flatMap {
          case (census, idxOf, ps, conds) =>
            val mapped = items.flatMap {
              case a: AttributeReference =>
                idxOf.get(a.exprId).map(a.exprId -> _)
              case al @ Alias(a: AttributeReference, _) =>
                idxOf.get(a.exprId).map(al.exprId -> _)
              case _ => None // computed column: its consumers must decline
            }.toMap
            Some((census, mapped, ps, conds))
        }
        case Filter(cond, c)
            if cond.deterministic &&
              !cond.exists(_.isInstanceOf[PlanExpression[_]]) =>
          censusOf(c).flatMap { case (census, idxOf, ps, conds) =>
            def split(e: Expression): Seq[Expression] = e match {
              case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
                split(l) ++ split(r)
              case x => Seq(x)
            }
            val cs = split(cond)
            // every conjunct must reference partition columns only — and
            // binds HERE, against the map valid at its own level (a
            // Project above may legitimately prune a filter-only column)
            if (cs.forall(_.references.forall(a => idxOf.contains(a.exprId))))
              Some((census, idxOf, ps, conds ++ cs.map(_.transform {
                case a: AttributeReference =>
                  BoundReference(idxOf(a.exprId), a.dataType, nullable = true)
              })))
            else None
          }
        case _ => None
      }
    }

  private def rewriteCensus(agg: Aggregate, groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      census: Seq[(org.apache.spark.sql.catalyst.InternalRow, Long)],
      idxOf: Map[ExprId, Int],
      partSchema: org.apache.spark.sql.types.StructType,
      conds: Seq[Expression]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
    import org.apache.spark.sql.catalyst.util.TypeUtils
    // every group key must be a partition column
    val gIdx = groups.map {
      case a: AttributeReference => idxOf.getOrElse(a.exprId, return None)
      case _ => return None
    }
    // classify output slots
    sealed trait Slot
    case class GroupSlot(i: Int) extends Slot
    case object CountStarSlot extends Slot
    case class CountColsSlot(is: Seq[Int]) extends Slot
    case class MinSlot(i: Int, dt: org.apache.spark.sql.types.DataType) extends Slot
    case class MaxSlot(i: Int, dt: org.apache.spark.sql.types.DataType) extends Slot
    def colIdx(e: Expression): Option[Int] = e match {
      case a: AttributeReference => idxOf.get(a.exprId)
      case _ => None
    }
    val slots: Seq[Slot] = aggExprs.map {
      case a: AttributeReference => GroupSlot(idxOf.getOrElse(a.exprId, return None))
      case al @ Alias(e, _) => e match {
        case a: AttributeReference =>
          GroupSlot(idxOf.getOrElse(a.exprId, return None))
        case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
            if l.value != null => CountStarSlot
        case AggregateExpression(Count(args), _, false, None, _)
            if args.nonEmpty =>
          CountColsSlot(args.map(colIdx(_).getOrElse(return None)))
        case AggregateExpression(Min(a), _, false, None, _) =>
          MinSlot(colIdx(a).getOrElse(return None), a.dataType)
        case AggregateExpression(Max(a), _, false, None, _) =>
          MaxSlot(colIdx(a).getOrElse(return None), a.dataType)
        case _ => return None
      }
      case _ => return None
    }
    // the partition-only filters arrive pre-bound to census tuple indices
    val preds = conds.map(
      org.apache.spark.sql.catalyst.expressions.Predicate.createInterpreted)
    val live = census.filter { case (row, n) =>
      n > 0L && preds.forall(_.eval(row)) // null-valued predicate filters
    }
    val fields = partSchema.fields
    def valueAt(row: InternalRow, i: Int): Any =
      row.get(i, fields(i).dataType)
    val grouped = live.groupBy { case (row, _) => gIdx.map(valueAt(row, _)) }
    val outRows = grouped.toSeq.map { case (_, entries) =>
      val rep = entries.head._1
      InternalRow.fromSeq(slots.map {
        case GroupSlot(i) => valueAt(rep, i)
        case CountStarSlot => entries.map(_._2).sum
        case CountColsSlot(is) =>
          entries.filter(e => is.forall(i => !e._1.isNullAt(i)))
            .map(_._2).sum
        case MinSlot(i, dt) =>
          val vs = entries.map(_._1).filterNot(_.isNullAt(i))
            .map(valueAt(_, i))
          if (vs.isEmpty) null
          else vs.min(TypeUtils.getInterpretedOrdering(dt))
        case MaxSlot(i, dt) =>
          val vs = entries.map(_._1).filterNot(_.isNullAt(i))
            .map(valueAt(_, i))
          if (vs.isEmpty) null
          else vs.max(TypeUtils.getInterpretedOrdering(dt))
      })
    }
    Some(LocalRelation(agg.output, outRows))
  }
}
