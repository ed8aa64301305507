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
    // constraint-implied filter pruning (AFTER the MV rewrite, whose
    // predicate cover must see the query's conjuncts intact): a conjunct
    // restating a validated CHECK constraint drops — null-rejecting
    // shapes under the filter's own IsNotNull guards only
    ext.injectOptimizerRule(session => GraftConstraintPruning(session))
    // PK/FK join elimination: a star join the query reads no dim column
    // from drops entirely, licensed by a validated FOREIGN KEY pin
    ext.injectOptimizerRule(session => GraftJoinElimination(session))
    // NDV-driven inner-join reordering (CBO-lite phase 2): after
    // elimination, so a dropped dim never anchors an estimate
    ext.injectOptimizerRule(session => GraftJoinReorder(session))
    // DISTINCT elimination: SELECT DISTINCT over columns covering a
    // pinned UNIQUE key is an identity — the dedup shuffle drops
    ext.injectOptimizerRule(session => GraftDistinctElimination(session))
    // eager aggregation (AFTER the strictly-better rewrites above): a
    // star aggregate's fact side pre-aggregates on the join keys when
    // NDV sketches prove the rollup collapses it
    ext.injectOptimizerRule(session => GraftEagerAggregation(session))
    // join-key range inference (LAST — the whole-operator rewrites above
    // must see the un-annotated join shape first): a side's equi-join key
    // gains `>= lo AND <= hi` conjuncts from the OTHER side's manifest
    // bounds when they strictly narrow its own — pushdown carries them
    // into the scan, where data skipping prunes fact files
    ext.injectOptimizerRule(session => GraftJoinRangeInference(session))
    // top-k file pruning: ORDER BY c LIMIT k proves a threshold from the
    // manifest (shortest file prefix by bound with ≥ k non-null values)
    // and injects it below the Sort — the scan reads only files that can
    // still contribute to the top k
    ext.injectOptimizerRule(session => GraftTopKPruning(session))
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

  import PartitionCensus.{CensusInfo, censusOf, bindPart, liveEntries, traverseOpt}

  /** (relation metadata hooks, aggregate-attr exprId → relation column,
    * the relation LEAF — the anchored-dispatch gate's anchor). */
  private def snapshotOf(plan: LogicalPlan): Option[
      ((Option[Long], String => Option[(Any, Any)], String => Option[Long],
        String => Option[BigDecimal]), Map[ExprId, String], LogicalPlan)] =
    GraftBatchShim.graftMetadataOf(plan) match {
      case Some(meta) =>
        Some((meta, plan.output.map(a => a.exprId -> a.name).toMap, plan))
      case None => plan match {
        case Project(items, child) => snapshotOf(child).map {
          case (meta, base, leaf) =>
            (meta, items.flatMap {
              case a: AttributeReference => base.get(a.exprId).map(a.exprId -> _)
              case al @ Alias(a: AttributeReference, _) =>
                base.get(a.exprId).map(al.exprId -> _)
              case _ => None // computed column: MIN/MAX over it must decline
            }.toMap, leaf)
        }
        case _ => None
      }
    }

  /** Stats-domain bound → Catalyst internal value for the column type;
    * None (decline) on any shape the conversion cannot do EXACTLY.
    * (Shared with [[GraftJoinRangeInference]] via [[GraftStats]].) */
  private def internalOf(v: Any, dt: org.apache.spark.sql.types.DataType): Option[Any] =
    GraftStats.internalOf(v, dt)

  /** Exact manifest sum → the SUM aggregate's result-type internal value;
    * None when it does not FIT (a scan would wrap or null there — decline
    * rather than reproduce overflow semantics from metadata). */
  private def sumInternal(v: BigDecimal,
      dt: org.apache.spark.sql.types.DataType): Option[Any] = dt match {
    case org.apache.spark.sql.types.LongType =>
      if (v.isValidLong) Some(v.toLong) else None
    case d: org.apache.spark.sql.types.DecimalType =>
      val dec = org.apache.spark.sql.types.Decimal(v.bigDecimal)
      if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
    case _ => None
  }

  private def answer(e: Expression, liveRows: Option[Long],
      minMaxOf: String => Option[(Any, Any)],
      nonNullOf: String => Option[Long],
      sumOf: String => Option[BigDecimal],
      colOf: Map[ExprId, String]): Option[Any] = e match {
    case Alias(child, _) =>
      answer(child, liveRows, minMaxOf, nonNullOf, sumOf, colOf)
    case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
        if l.value != null => liveRows
    // COUNT(col): live rows minus per-file null counts, summed — exact
    // whenever every live file's footer recorded null counts and carries
    // no DV marks. Single column only: COUNT(a, b) counts rows where ALL
    // args are non-null, which per-column counts cannot compose.
    case AggregateExpression(Count(Seq(a: AttributeReference)),
        _, false, None, _) =>
      colOf.get(a.exprId).flatMap(nonNullOf(_))
    // SUM(col) from the per-file exact sums ANALYZE records (integral/
    // decimal; DV marks or any un-analyzed file decline): SQL totality
    // via the non-null count (0 non-null inputs ⇒ NULL), overflow of the
    // result type declines — never silently wraps where a scan would
    case AggregateExpression(
        org.apache.spark.sql.catalyst.expressions.aggregate.Sum(
          a: AttributeReference, _), _, false, None, _) =>
      for {
        n <- colOf.get(a.exprId)
        nn <- nonNullOf(n)
        v <- if (nn == 0L) Some(null)
             else sumOf(n).flatMap(sumInternal(_, e.dataType))
      } yield v
    // AVG(integral) → DOUBLE: exact sum / non-null count, ONE rounding at
    // the divide — the census AvgDataSlot's semantics on the direct path
    // (SQL NULL totality on zero non-null inputs)
    case AggregateExpression(
        org.apache.spark.sql.catalyst.expressions.aggregate.Average(
          a: AttributeReference, _), _, false, None, _)
        if e.dataType == org.apache.spark.sql.types.DoubleType &&
          (a.dataType == org.apache.spark.sql.types.LongType ||
            a.dataType == org.apache.spark.sql.types.IntegerType ||
            a.dataType == org.apache.spark.sql.types.ShortType ||
            a.dataType == org.apache.spark.sql.types.ByteType) =>
      for {
        n <- colOf.get(a.exprId)
        nn <- nonNullOf(n)
        v <- if (nn == 0L) Some(null)
             else sumOf(n).map(s => s.toDouble / nn.toDouble)
      } yield v
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
        case ((liveRows, minMaxOf, nonNullOf, sumOf), colOf, leaf) =>
          // LAZY-STATS dispatch: on a checkpoint-anchored table whose
          // stats map is not already paid for, the table-level DATA-column
          // channels (MIN/MAX/COUNT(col)/SUM) must not iterate per-file
          // hooks on the driver — ONE distributed census job aggregates
          // the requested columns over the checkpoint parquet and the
          // per-dir results merge here (partition columns keep the driver
          // hooks: they answer from paths + fileRows, never the stats
          // map). No distributed answer → decline to the later arms.
          val cheap = GraftBatchShim.graftStatsDriverCheap(leaf)
            .getOrElse(true)
          val hooksOpt: Option[(String => Option[(Any, Any)],
              String => Option[Long], String => Option[BigDecimal])] =
            if (cheap) Some((minMaxOf, nonNullOf, sumOf))
            else {
              val partCols = GraftBatchShim.graftPartitionColsOf(leaf)
                .getOrElse(Seq.empty).toSet
              val dataCols = aggExprs.flatMap(_.collect {
                case a: AttributeReference => colOf.get(a.exprId)
              }.flatten).distinct.filterNot(partCols)
              if (dataCols.isEmpty) Some((minMaxOf, nonNullOf, sumOf))
              else GraftBatchShim.graftCensusDistOf(leaf)
                .flatMap(_(dataCols)).map { byDir =>
                  val merged: Map[String, DistStats.ColAgg] =
                    dataCols.map(c => c -> byDir.valuesIterator
                      .flatMap(_.get(c))
                      .foldLeft(DistStats.emptyColAgg)(
                        DistStats.mergeColAgg)).toMap
                  val mm2: String => Option[(Any, Any)] = c =>
                    if (partCols(c)) minMaxOf(c)
                    else merged.get(c).flatMap(_.bounds).flatten
                  val nn2: String => Option[Long] = c =>
                    if (partCols(c)) nonNullOf(c)
                    else merged.get(c).flatMap(_.nn)
                  val sm2: String => Option[BigDecimal] = c =>
                    if (partCols(c)) sumOf(c)
                    else merged.get(c).flatMap(_.sum)
                  (mm2, nn2, sm2)
                }
            }
          hooksOpt.flatMap { case (mm2, nn2, sm2) =>
            val values = aggExprs.map(
              answer(_, liveRows, mm2, nn2, sm2, colOf))
            if (values.forall(_.isDefined))
              Some(LocalRelation(agg.output,
                Seq(org.apache.spark.sql.catalyst.InternalRow(
                  values.map(_.get): _*))))
            else None
          }
      }
      // fallback: GLOBAL aggregates of PARTITION columns (file stats never
      // cover them) answer from the census — `SELECT max(event_date) FROM
      // t [WHERE day-filter]`, the freshness probe every ops dashboard
      // runs, with COUNT's 0-on-empty / MIN-MAX's null-on-empty totality;
      // then the HYBRID boundary count for single-column range filters
      direct.orElse(censusGlobal(agg, aggExprs, child))
        .orElse(boundaryCount(agg, aggExprs, child)).getOrElse(agg)
    // ROLLUP / CUBE / GROUPING SETS over the census — the Expand-based
    // aggregate: each Expand projection IS one grouping set (group values
    // or NULL, plus the spark_grouping_id literal), so each set answers
    // independently from the same census entries and the LocalRelation
    // unions the per-set rows. `GROUP BY ROLLUP(day)` at 100 TB becomes
    // manifest arithmetic, subtotals and grand total included.
    case agg @ Aggregate(groups, aggExprs,
        ex @ Expand(_, expOut, child), _)
        if groups.nonEmpty && expOut.exists(_.name == "spark_grouping_id") =>
      censusOf(child).flatMap(
        rollupCensus(agg, groups, aggExprs, ex.projections, expOut, _))
        .getOrElse(agg)
    // GROUP BY partition columns — the partition census (`SELECT
    // event_date, COUNT(*) … GROUP BY event_date`, SHOW-PARTITIONS-style
    // DISTINCT, per-partition MIN/MAX of partition columns): the manifest
    // knows every partition's EXACT live row count (per-file rows minus
    // DV marks), so the whole aggregate — scan, shuffle and all —
    // collapses to a LocalRelation of one row per live partition.
    // Filters referencing only partition columns evaluate driver-side
    // against the census tuples (the same values directory pruning uses).
    case agg @ Aggregate(groups, aggExprs, child, _) if groups.nonEmpty =>
      censusOf(child).flatMap(rewriteCensus(agg, groups, aggExprs, _))
        // the GROUPED hybrid boundary aggregate: `GROUP BY partition col
        // WHERE data-column range` — per-group inside totals from the
        // walk, only the edge files re-aggregate
        .orElse(boundaryCount(agg, aggExprs, child, groups))
        .getOrElse(agg)
  }

  /** The grouping-sets census: answer each Expand projection (one
    * grouping set) independently over the filtered census entries.
    * Substituting a projection into the aggregate's expressions turns
    * grouped-out keys into NULL literals and the grouping id (plus any
    * grouping()/grouping_id() spelling over it) into a foldable constant;
    * everything else classifies through the ordinary census slots.
    * Exact-or-decline: ANY unanswerable slot in ANY set abandons the
    * whole rewrite. */
  private def rollupCensus(agg: Aggregate, groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      projections: Seq[Seq[Expression]], expOut: Seq[Attribute],
      info: CensusInfo): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    val live = liveEntries(info)
    val outRows = projections.flatMap { proj =>
      if (proj.size != expOut.size) return None
      val sub: Map[ExprId, Expression] =
        expOut.map(_.exprId).zip(proj).toMap
      def subst(e: Expression): Expression = e.transformUp {
        case a: AttributeReference if sub.contains(a.exprId) => sub(a.exprId)
      }
      // per-set group keys at CHILD level: bound partition expressions,
      // or constants (NULL for grouped-out keys, the grouping id)
      // scala.util qualifiers: catalyst's Left/Right string expressions
      // shadow the Either constructors under the wildcard import
      val gBound: Seq[scala.util.Either[Any, Expression]] =
        groups.map(subst).map {
          case l: Literal => scala.util.Left(l.value)
          case g if g.foldable => scala.util.Left(g.eval())
          case g =>
            if (!org.apache.spark.sql.catalyst.util.TypeUtils
                .typeWithProperEquals(g.dataType)) return None
            scala.util.Right(bindPart(g, info).getOrElse(return None))
        }
      val slots = traverseOpt(aggExprs.map(subst).map {
        case l: Literal => Some(ConstSlot(l.value))
        case e if e.foldable => Some(ConstSlot(e.eval()))
        case a: AttributeReference => classifySlot(a, info, groupRefs = true)
        case Alias(l: Literal, _) => Some(ConstSlot(l.value))
        case Alias(e, _) if e.foldable &&
            !e.exists(_.isInstanceOf[AggregateExpression]) =>
          Some(ConstSlot(e.eval()))
        case Alias(e, _) => classifySlot(e, info, groupRefs = true)
        case _ => None
      }).getOrElse(return None)
      val dirAgg = censusDirAgg(info, slots).getOrElse(return None)
      val bound = gBound.collect { case scala.util.Right(b) => b }
      // a grouped aggregate over EMPTY input emits no rows — including
      // the grand-total set (unlike the global Aggregate(Nil) totality)
      val grouped: Seq[Seq[(org.apache.spark.sql.catalyst.InternalRow,
          Long, Seq[String])]] =
        if (live.isEmpty) Nil
        else if (bound.isEmpty) Seq(live) // the (sub)total set: one group
        else live.groupBy(e => bound.map(_.eval(e._1))).values.toSeq
      grouped.map { entries =>
        InternalRow.fromSeq(
          slots.map(evalSlot(_, entries, info, dirAgg).getOrElse(return None)))
      }
    }
    Some(LocalRelation(agg.output, outRows))
  }


  /** HYBRID BOUNDARY COUNT — `COUNT(*) WHERE <single-column range>`
    * scans only the files STRADDLING the range edges: a file whose whole
    * [min,max] lies inside the range contributes its exact non-null
    * count from the manifest (the comparisons drop null rows, which the
    * non-null count already excludes), a file entirely outside (or
    * all-null) contributes nothing, and only the boundary files run a
    * real counting scan whose result ADDS to the metadata total.
    * `SELECT COUNT(*) FROM t WHERE ts >= a AND ts < b` over a 100 TB
    * time-clustered fact reads the two edge files instead of the whole
    * range. Exact-or-decline: every conjunct must compare ONE column
    * (data or partition — partition bounds synthesize from path values)
    * against a non-null literal with </<=/>/>=/= (IsNotNull on that same
    * column rides free — matching rows are non-null by construction);
    * DV-marked and stats-less files classify as boundary (scanned, never
    * guessed); COUNT(*) / COUNT(range-column), SUM of long-typed columns
    * (per-file ANALYZE sums; other columns under the range column's
    * null-completeness), and MIN/MAX (file bounds, same gate) all
    * answer. Fires only
    * when at least one file classifies AWAY from the boundary scan —
    * which is also the fixpoint: the rewritten sub-count's relation
    * holds boundary files only, where the revisit classifies nothing
    * away and declines. */
  private def boundaryCount(agg: Aggregate, aggExprs: Seq[NamedExpression],
      child: LogicalPlan, groups: Seq[Expression] = Nil)
      : Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.util.TypeUtils
    // descend to the filter through Projects — attribute-only, or ones
    // carrying COMPUTED columns (PullOutGroupingExpressions materializes
    // a derived group key as `expr AS _groupingexpression` in a Project
    // above the Filter): computed aliases collect as substitutions so
    // group keys inline back to leaf-level expressions. Top-down order —
    // an upper alias may reference a lower one.
    def toFilter(p: LogicalPlan, substs: Seq[Map[ExprId, Expression]])
        : Option[(Expression, LogicalPlan, Seq[Map[ExprId, Expression]])] =
      p match {
        case Filter(c, i) => Some((c, i, substs))
        case Project(items, ch) if items.forall {
            case _: AttributeReference => true
            case Alias(e, _) => e.deterministic &&
              !e.exists(_.isInstanceOf[PlanExpression[_]])
            case _ => false
          } =>
          val m: Map[ExprId, Expression] = items.collect {
            case al @ Alias(e, _) => al.exprId -> e }.toMap
          toFilter(ch, if (m.isEmpty) substs else substs :+ m)
        case _ => None
      }
    val (cond, inner, substs) = toFilter(child, Nil).getOrElse(return None)
    def inlined(e0: Expression): Expression =
      substs.foldLeft(e0)((e, m) => e.transformUp {
        case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
      })
    if (!cond.deterministic || cond.exists(_.isInstanceOf[PlanExpression[_]]))
      return None
    def scanOf(p: LogicalPlan): Option[(Seq[String],
        (String, String) => Option[Option[(Any, Any)]],
        (String, String) => Option[Long], LogicalPlan)] =
      GraftBatchShim.topkStatsOf(p) match {
        case Some((files, mm, nn)) => Some((files, mm, nn, p))
        case None => p match {
          case Project(items, ch)
              if items.forall(_.isInstanceOf[AttributeReference]) =>
            scanOf(ch) // ids preserved through attribute-only projections
          case _ => None
        }
      }
    val (files, mm, nn, leaf) = scanOf(inner).getOrElse(return None)
    // LAZY-STATS contract: this rewrite fires on shapes as common as any
    // count-with-filter, so on a checkpoint-anchored table whose stats
    // map is not already paid for the per-file walk must NOT run on the
    // driver — it runs DISTRIBUTED over the checkpoint parquet instead
    // (below), and declines only when neither path is available
    val driverCheap =
      GraftBatchShim.graftStatsDriverCheap(leaf).getOrElse(false)
    if (!driverCheap && GraftBatchShim.graftBoundaryDistOf(leaf).isEmpty)
      return None
    // conjuncts accumulate PER-COLUMN interval CLAUSES in the INTERNAL
    // domain: a plain comparison is a one-range clause, `IN (…)` a union
    // of points, and `a < x OR a >= y` a union of ranges — every clause
    // on ONE column (cross-column disjunctions decline: their per-file
    // verdicts don't compose per column). `WHERE ts >= a AND ts < b AND
    // day IN (…)` classifies each file against every column at once.
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    def splitOr(e: Expression): Seq[Expression] = e match {
      case Or(l, r) => splitOr(l) ++ splitOr(r)
      case x => Seq(x)
    }
    def lit(l: Expression, dt: org.apache.spark.sql.types.DataType)
        : Option[Any] = l match {
      case Literal(v, d) if v != null && d == dt => Some(v)
      case _ => None
    }
    type Rng = BoundaryWalk.Rng
    def attr(x: Expression): Option[AttributeReference] = x match {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    // one comparison → (col, range), both orientations
    def rangeOf(c: Expression): Option[(AttributeReference, Rng)] = {
      def both(x: Expression, y: Expression,
          attrFirst: Any => Rng, litFirst: Any => Rng) =
        (for (a <- attr(x); v <- lit(y, a.dataType)) yield (a, attrFirst(v)))
          .orElse(
            for (a <- attr(y); v <- lit(x, a.dataType)) yield (a, litFirst(v)))
      def pt(v: Any): Rng = (Some((v, false)), Some((v, false)))
      c match {
        case GreaterThanOrEqual(x, y) => both(x, y,
          v => (Some((v, false)), None), v => (None, Some((v, false))))
        case GreaterThan(x, y) => both(x, y,
          v => (Some((v, true)), None), v => (None, Some((v, true))))
        case LessThanOrEqual(x, y) => both(x, y,
          v => (None, Some((v, false))), v => (Some((v, false)), None))
        case LessThan(x, y) => both(x, y,
          v => (None, Some((v, true))), v => (Some((v, true)), None))
        case EqualTo(x, y) => both(x, y, pt, pt)
        case _ => None
      }
    }
    // `a != c` (and NOT(a = c)) is the two-range union (−∞,c) ∪ (c,∞)
    def neqClause(c: Expression): Option[(AttributeReference, Seq[Rng])] = {
      def mk(x: Expression, y: Expression) =
        (for (a <- attr(x); v <- lit(y, a.dataType)) yield (a, v))
          .orElse(for (a <- attr(y); v <- lit(x, a.dataType)) yield (a, v))
          .map { case (a, v) =>
            (a, Seq((None, Some((v, true))): Rng, (Some((v, true)), None): Rng))
          }
      c match {
        case Not(EqualTo(x, y)) => mk(x, y)
        case _ => None
      }
    }
    def clauseOf(c: Expression): Option[(AttributeReference, Seq[Rng])] =
      c match {
        // registers the column; covers every non-null value (matching
        // rows are non-null in every cond column by construction)
        case IsNotNull(a: AttributeReference) => Some((a, Seq((None, None))))
        case In(a: AttributeReference, vs) if vs.nonEmpty =>
          val pts = vs.map(v => lit(v, a.dataType))
          if (pts.forall(_.isDefined))
            Some((a, pts.map(_.get)
              .map(v => (Some((v, false)), Some((v, false))): Rng)))
          else None
        // OptimizeIn rewrites larger IN lists to InSet (internal-domain
        // values, type-consistent by construction; null declines)
        case InSet(a: AttributeReference, hs)
            if hs.nonEmpty && !hs.contains(null) =>
          Some((a, hs.toSeq
            .map(v => (Some((v, false)), Some((v, false))): Rng)))
        case o @ Or(_, _) =>
          val parts = splitOr(o).map(clauseOf)
          if (parts.forall(_.isDefined)) {
            val ps = parts.map(_.get)
            if (ps.forall(_._1.exprId == ps.head._1.exprId))
              Some((ps.head._1, ps.flatMap(_._2)))
            else None // cross-column OR
          } else None
        case cmp => neqClause(cmp)
          .orElse(rangeOf(cmp).map { case (a, r) => (a, Seq(r)) })
      }
    // `WHERE v IS NULL [AND range conjuncts]` — the data-quality probe:
    // matching rows per file are the null-complement intersected with the
    // range columns' non-null rows — exact per file from nn (and the
    // joint-null stat when one range column is itself nullable), so the
    // count answers from metadata with at most the edge scans. ONE
    // IS NULL column, COUNT(*)-family slots only.
    val conjs = split(cond)
    val (nullConjs, rangeConjs) = conjs.partition {
      case IsNull(_: AttributeReference) => true
      case _ => false
    }
    val nullCols = nullConjs.collect { case IsNull(a: AttributeReference) => a }
    val wantNull = nullCols.nonEmpty
    if (wantNull && nullCols.map(_.exprId).distinct.size != 1) return None
    val rangeClauses: Seq[(AttributeReference, Seq[Rng])] =
      rangeConjs.map(c => clauseOf(c).getOrElse(return None))
    // a range clause on the IS NULL column itself is contradictory or
    // redundant (Catalyst folds the real cases) — decline, never guess
    if (wantNull && rangeClauses.exists(_._1.exprId == nullCols.head.exprId))
      return None
    val clauseList: Seq[(AttributeReference, Seq[Rng])] =
      (if (wantNull) Seq((nullCols.head, Nil)) else Nil) ++ rangeClauses
    if (clauseList.isEmpty) return None
    val condCols: Seq[AttributeReference] =
      clauseList.map(_._1).distinctBy(_.exprId)
    val condIds: Set[ExprId] = condCols.map(_.exprId).toSet
    def leafAttr(id: ExprId): Option[AttributeReference] =
      leaf.output.collectFirst {
        case la: AttributeReference if la.exprId == id => la
      }
    // every cond column must be a leaf column (name resolution)
    val condName: Map[ExprId, String] = condCols.map { a =>
      a.exprId -> leafAttr(a.exprId).getOrElse(return None).name
    }.toMap
    // GROUPED: every group key must be a deterministic row-local
    // expression over PARTITION columns only — a bare column, or a
    // DERIVED key (`year(day)`, `day % 3`) — so each file knows its group
    // (constant per file): inside totals accumulate per group and only
    // the boundary files re-aggregate. The walk keys on the RAW
    // underlying partition values; derived keys evaluate driver-side over
    // the walk's (census-bounded) group map, merging raw keys that
    // derive equal (one derived group spanning several partition dirs).
    val normGroups: Seq[Expression] = groups.map {
      case Alias(c, _) => c
      case g => g
    }
    lazy val partCols: Set[String] = GraftBatchShim
      .graftPartitionColsOf(leaf).getOrElse(Set.empty[String].toSeq).toSet
    val groupExprsLeaf: Seq[Expression] = normGroups.map(inlined).map { g =>
      if (!g.deterministic || g.exists(_.isInstanceOf[PlanExpression[_]]) ||
          g.exists(_.isInstanceOf[AggregateExpression]) ||
          !org.apache.spark.sql.catalyst.util.TypeUtils
            .typeWithProperEquals(g.dataType)) return None
      val remapped = g.transform {
        case a: AttributeReference =>
          leafAttr(a.exprId).getOrElse(return None)
      }
      if (!remapped.references.forall(a => partCols(a.name))) return None
      remapped
    }
    // the DISTINCT underlying partition columns the walk keys on (raw
    // values; the derived keys bind over this tuple)
    val groupUnder: Seq[AttributeReference] = groupExprsLeaf
      .flatMap(_.references.toSeq)
      .collect { case a: AttributeReference => a }.distinctBy(_.exprId)
    // an output slot matches a group key by the grouping Alias/attr id,
    // or semantically (Catalyst keeps the expression in both lists)
    val groupIdById: Map[ExprId, Int] = groups.zipWithIndex.collect {
      case (al: Alias, i) => al.exprId -> i
      case (a: AttributeReference, i) => a.exprId -> i
    }.toMap
    def groupIdx(e0: Expression): Option[Int] = {
      val e = e0 match { case Alias(c, _) => c; case x => x }
      e match {
        case a: AttributeReference if groupIdById.contains(a.exprId) =>
          Some(groupIdById(a.exprId))
        case _ =>
          val ie = inlined(e)
          val i = normGroups.indexWhere(g =>
            g.semanticEquals(e) || inlined(g).semanticEquals(ie))
          if (i >= 0) Some(i) else None
      }
    }
    // output slots: COUNT(*) / COUNT(a cond column) — matching rows are
    // non-null in every cond column by construction — plus SUM(long) and
    // MIN/MAX from per-file metadata, gated per file on the cond
    // columns' null-completeness (below)
    sealed trait BSlot
    case object BCount extends BSlot
    case class BSum(col: AttributeReference) extends BSlot
    case class BExt(col: AttributeReference, takeMax: Boolean) extends BSlot
    case class BAvg(col: AttributeReference) extends BSlot
    case class BGroup(i: Int) extends BSlot
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.ByteType)
    val slots: Seq[BSlot] = aggExprs.map {
      case e if groups.nonEmpty &&
          !e.exists(_.isInstanceOf[AggregateExpression]) &&
          groupIdx(e).isDefined =>
        BGroup(groupIdx(e).get)
      case Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), _)
          if l.value != null => BCount
      case Alias(AggregateExpression(Count(Seq(a: AttributeReference)), _, false, None, _), _)
          if condIds(a.exprId) &&
            !nullCols.exists(_.exprId == a.exprId) =>
        // COUNT(range col) = matchCnt (matching rows are non-null in
        // every range column); COUNT(the IS NULL col) is 0, NOT matchCnt
        // — that one falls through and declines
        BCount
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Sum(
            a: AttributeReference, em), _, false, None, _), _)
          if em.evalMode != EvalMode.TRY &&
            al.dataType == org.apache.spark.sql.types.LongType =>
        BSum(leafAttr(a.exprId).getOrElse(return None))
      // AVG(integral) → DOUBLE: exact decimal partials recombine with ONE
      // final rounding — DuckDB's own integer-AVG semantics (exact sum,
      // single divide), and the mathematically exact answer where a
      // double-accumulating scan would have rounded along the way
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Average(
            a: AttributeReference, _), _, false, None, _), _)
          if al.dataType == org.apache.spark.sql.types.DoubleType &&
            integral(a.dataType) =>
        BAvg(leafAttr(a.exprId).getOrElse(return None))
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Min(
            a: AttributeReference), _, _, None, _), _)
          if al.dataType == a.dataType =>
        BExt(leafAttr(a.exprId).getOrElse(return None), takeMax = false)
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Max(
            a: AttributeReference), _, _, None, _), _)
          if al.dataType == a.dataType =>
        BExt(leafAttr(a.exprId).getOrElse(return None), takeMax = true)
      case _ => return None
    }
    // IS NULL answers COUNT-family (and group passthrough) slots only —
    // sums/extrema of matching rows are not derivable from per-file stats
    if (wantNull && slots.exists {
      case BCount | BGroup(_) => false
      case _ => true
    }) return None
    // AVG rides the same exact-sum channel the SUM slots use
    val sumCols: Seq[AttributeReference] = slots.collect {
      case BSum(c) => c
      case BAvg(c) => c }.distinctBy(_.exprId)
    val extKeys: Seq[(AttributeReference, Boolean)] = slots.collect {
      case BExt(c, mx) => (c, mx) }.distinct
    lazy val sumHooks = org.apache.spark.sql.graft.GraftBatchShim
      .graftSumHooksOf(leaf)
    val fileRows = GraftBatchShim.graftFileRowsOf(leaf)
      .getOrElse(Map.empty[String, Long])
    if (sumCols.nonEmpty && sumHooks.isEmpty) return None
    // the per-file decision procedure is BoundaryWalk.classify — shared
    // with the DISTRIBUTED checkpoint walk so the two paths cannot drift
    val ivSpecs: Seq[BoundaryWalk.IvS] = condCols.map(a =>
      BoundaryWalk.IvS(condName(a.exprId), a.dataType,
        clauseList.filter(_._1.exprId == a.exprId).map(_._2),
        wantNull = nullCols.exists(_.exprId == a.exprId)))
    val sumSpecs: Seq[BoundaryWalk.SumS] =
      sumCols.map(c => BoundaryWalk.SumS(c.name))
    val extSpecs: Seq[BoundaryWalk.ExtS] = extKeys.map { case (c, mx) =>
      BoundaryWalk.ExtS(c.name, c.dataType, mx) }
    val groupNames: Seq[String] = groupUnder.map(_.name)
    val walkAgg0: BoundaryWalk.Agg =
      if (driverCheap) {
        // inline manifests / already-paid lazy stats: walk on the driver.
        // A file's group key is its RAW underlying partition values
        // (min = max bounds); a file whose key is indeterminable joins
        // the boundary scan.
        def keyOf(f: String): Option[Seq[Any]] =
          if (groupUnder.isEmpty) Some(Nil)
          else {
            val per = groupUnder.map { g =>
              mm(f, g.name) match {
                case Some(None) => Some(null) // hive null dir: NULL group
                case Some(Some((vS, _))) =>
                  GraftStats.internalOf(vS, g.dataType)
                case None => None
              }
            }
            if (per.forall(_.isDefined)) Some(per.map(_.get)) else None
          }
        val jnHook = GraftBatchShim.graftJointNullsOf(leaf)
          .getOrElse((_: String, _: String, _: String) => None)
        val naHook = GraftBatchShim.graftNullAnyOf(leaf)
          .getOrElse((_: String, _: Seq[String]) => None)
        files.foldLeft(BoundaryWalk.emptyAgg) { (acc, f) =>
          val fc0 = BoundaryWalk.classify(ivSpecs, sumSpecs, extSpecs,
            c => mm(f, c), c => nn(f, c),
            c => sumHooks.get._1(f, c), c => sumHooks.get._2(f, c),
            fileRows.get(f), (a, b) => jnHook(f, a, b),
            set => naHook(f, set))
          val (fc, key) = keyOf(f) match {
            case Some(k) => (fc0, k)
            case None => (BoundaryWalk.Boundary: BoundaryWalk.FileClass, Nil)
          }
          BoundaryWalk.fold(extSpecs, acc, f, key, fc)
        }
      } else {
        // checkpoint-anchored: executors classify the checkpoint rows,
        // only the aggregated totals and boundary keys come back — the
        // stats column never materializes driver-side
        GraftBatchShim.graftBoundaryDistOf(leaf)
          .flatMap(walk => walk(ivSpecs, sumSpecs, extSpecs, groupNames))
          .getOrElse(return None)
      }
    if (walkAgg0.away == 0L) return None // nothing classified away
    // DERIVED group keys: evaluate each group expression over the raw
    // partition-value tuple and merge raw keys that derive equal — a
    // no-op re-key for bare-column groups. Runs BEFORE the per-group
    // sum-fit checks (merged sums are what must fit).
    val walkAgg: BoundaryWalk.Agg =
      if (groups.isEmpty) walkAgg0
      else {
        val underIdx: Map[ExprId, Int] =
          groupUnder.map(_.exprId).zipWithIndex.toMap
        val bound: Seq[Expression] = groupExprsLeaf.map(_.transform {
          case a: AttributeReference =>
            BoundReference(underIdx(a.exprId), a.dataType, nullable = true)
        })
        BoundaryWalk.deriveGroups(extSpecs, walkAgg0, raw => {
          val row = org.apache.spark.sql.catalyst.InternalRow.fromSeq(raw)
          bound.map(_.eval(row))
        })
      }
    val boundaryN = walkAgg.boundary.size
    // sum-fit / avg-encodable checks hold PER GROUP (the global walk is
    // the one-group case under the empty key)
    val bsumNames = slots.collect { case BSum(c) => c.name }.toSet
    val avgNames = slots.collect { case BAvg(c) => c.name }.toSet
    for (g <- walkAgg.groups.values; (n, (v, _)) <- g.sums) {
      if (bsumNames(n) && !v.isValidLong) return None
      if (avgNames(n) && v.abs >= BigDecimal(10).pow(38)) return None
    }
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    if (groups.nonEmpty)
      // the boundary side rebuilds LEAF-level (Filter over the restricted
      // scan): a computed Project above the filter (the pulled-out
      // derived key) would prune the partition columns the leaf-level
      // group expressions reference
      return boundaryGrouped(agg, aggExprs, Filter(cond, inner), leaf,
        groupExprsLeaf,
        slots.map {
          case BGroup(i) => GSlot.Group(i)
          case BCount => GSlot.Cnt
          case BSum(c) => GSlot.Sm(c)
          case BAvg(c) => GSlot.Av(c)
          case BExt(c, mx) => GSlot.Ext(c, mx)
        }, walkAgg)
    val grp0 = walkAgg.groups.getOrElse(Seq.empty, BoundaryWalk.emptyGrp)
    val insideCnt = grp0.cnt
    val insideNnIn: String => Long = n => grp0.sums.get(n).fold(0L)(_._2)
    val insideExt: ((String, Boolean)) => Option[Any] = grp0.exts.get
    // sums proven to fit long / encode as Decimal(38,0) by the per-group
    // checks above
    val insideSumLong: Map[String, Long] = grp0.sums.collect {
      case (n, (v, _)) if bsumNames(n) => n -> v.toLong
    }
    def insideSumOf(n: String): BigDecimal =
      grp0.sums.get(n).map(_._1).getOrElse(BigDecimal(0))
    if (boundaryN == 0)
      return Some(LocalRelation(agg.output,
        Seq(org.apache.spark.sql.catalyst.InternalRow.fromSeq(
          slots.zip(aggExprs).map {
            case (BCount, _) => insideCnt
            case (BSum(c), _) =>
              if (insideNnIn(c.name) > 0L) insideSumLong(c.name)
              else null // SQL SUM totality: no non-null inputs
            case (BAvg(c), _) =>
              // exact sum, ONE rounding at the divide — SQL NULL totality
              if (insideNnIn(c.name) > 0L)
                insideSumOf(c.name).toDouble / insideNnIn(c.name).toDouble
              else null
            case (BExt(c, mx), _) =>
              insideExt((c.name, mx)).orNull // MIN/MAX: null on none
          }))))
    val subRel = GraftBatchShim
      .restrictScanTo(spark, leaf, walkAgg.boundary).getOrElse(return None)
    val newChild = child.transformUp { case p if p eq leaf => subRel }
    val cnt = Alias(Count(Seq(Literal(1L))).toAggregateExpression(),
      "__graft_bcnt")()
    val subSums: Map[ExprId, Alias] = sumCols.map { c =>
      c.exprId -> Alias(new org.apache.spark.sql.catalyst.expressions
        .aggregate.Sum(c).toAggregateExpression(),
        s"__graft_bsum_${c.name}")()
    }.toMap
    val subExts: Map[(ExprId, Boolean), Alias] = extKeys.map { case (c, mx) =>
      val fn =
        if (mx) org.apache.spark.sql.catalyst.expressions.aggregate.Max(c)
        else org.apache.spark.sql.catalyst.expressions.aggregate.Min(c)
      (c.exprId, mx) -> Alias(fn.toAggregateExpression(),
        s"__graft_bext_${c.name}_$mx")()
    }.toMap
    // AVG boundary channels: exact decimal sum (Decimal(38,0) — a file
    // would need ~10^19 rows of max longs to overflow it) + the non-null
    // count of the column under the pushed filter
    val avgKeys: Seq[AttributeReference] = slots.collect {
      case BAvg(c) => c }.distinctBy(_.exprId)
    val subAvgSum: Map[ExprId, Alias] = avgKeys.map { c =>
      c.exprId -> Alias(new org.apache.spark.sql.catalyst.expressions
        .aggregate.Sum(Cast(c, dec38)).toAggregateExpression(),
        s"__graft_bavgs_${c.name}")()
    }.toMap
    val subAvgCnt: Map[ExprId, Alias] = avgKeys.map { c =>
      c.exprId -> Alias(Count(Seq(c)).toAggregateExpression(),
        s"__graft_bavgc_${c.name}")()
    }.toMap
    val subAgg = Aggregate(Nil,
      cnt +: (subSums.values.toSeq ++ subExts.values.toSeq ++
        subAvgSum.values.toSeq ++ subAvgCnt.values.toSeq), newChild)
    import org.apache.spark.sql.catalyst.expressions.Add
    val outPs: Seq[NamedExpression] = slots.zip(aggExprs).map {
      case (BCount, e) =>
        Alias(Add(Literal(insideCnt), cnt.toAttribute), e.name)(
          exprId = e.exprId)
      case (BSum(c), e) =>
        val sub = subSums(c.exprId).toAttribute
        // SQL SUM totality through the split: with inside non-null
        // inputs the total is never NULL (coalesce the possibly-empty
        // boundary half); without them the boundary half IS the answer
        val expr: Expression =
          if (insideNnIn(c.name) > 0L)
            Add(Literal(insideSumLong(c.name)),
              Coalesce(Seq(sub, Literal(0L))))
          else sub
        Alias(expr, e.name)(exprId = e.exprId)
      case (BAvg(c), e) =>
        // exact decimal partials, ONE rounding at the final divide —
        // integer-AVG semantics (what DuckDB computes), and exact where
        // a double-accumulating scan would round along the way. The If
        // guard keeps SQL NULL totality without relying on legacy
        // divide-by-zero (ANSI sessions would throw).
        val bS = subAvgSum(c.exprId).toAttribute
        val bC = subAvgCnt(c.exprId).toAttribute
        val num: Expression = Add(
          Literal(org.apache.spark.sql.types.Decimal(
            insideSumOf(c.name).setScale(0).bigDecimal), dec38),
          Coalesce(Seq(bS, Literal(
            org.apache.spark.sql.types.Decimal(0L), dec38))))
        val den: Expression = Add(Literal(insideNnIn(c.name)), bC)
        val expr: Expression = If(EqualTo(den, Literal(0L)),
          Literal(null, org.apache.spark.sql.types.DoubleType),
          Divide(Cast(num, org.apache.spark.sql.types.DoubleType),
            Cast(den, org.apache.spark.sql.types.DoubleType),
            EvalMode.LEGACY))
        Alias(expr, e.name)(exprId = e.exprId)
      case (BExt(c, mx), e) =>
        val sub = subExts((c.exprId, mx)).toAttribute
        // Least/Greatest SKIP nulls (null only when all inputs are), so
        // the empty-boundary null composes with the inside extremum
        val expr: Expression = insideExt((c.name, mx)) match {
          case None => sub
          case Some(v) =>
            if (mx) org.apache.spark.sql.catalyst.expressions.Greatest(
              Seq(Literal(v, c.dataType), sub))
            else org.apache.spark.sql.catalyst.expressions.Least(
              Seq(Literal(v, c.dataType), sub))
        }
        Alias(expr, e.name)(exprId = e.exprId)
    }
    Some(Project(outPs, subAgg))
  }

  /** The grouped boundary rewrite's output slots: positional group keys
    * plus the aggregate families the global path supports. */
  private object GSlot {
    sealed trait T
    final case class Group(i: Int) extends T
    case object Cnt extends T
    final case class Sm(c: AttributeReference) extends T
    final case class Av(c: AttributeReference) extends T
    final case class Ext(c: AttributeReference, takeMax: Boolean) extends T
  }

  /** GROUPED hybrid boundary aggregate — `SELECT day, COUNT(*), SUM(v)
    * WHERE ts range GROUP BY day` reads only the edge files: the walk
    * accumulated inside totals PER GROUP (group keys are partition
    * columns — or DERIVED row-local functions of them, already evaluated
    * into `walkAgg`'s keys — constant per file); boundary files
    * re-aggregate per group under the original filter, and the two sides
    * union and re-combine. Grouped-aggregate-over-empty semantics hold
    * by construction: a group appears only where some file contributed.
    * `groupExprs` are LEAF-level group key expressions, index-aligned
    * with both `GSlot.Group(i)` and the walk keys. */
  private def boundaryGrouped(agg: Aggregate, aggExprs: Seq[NamedExpression],
      child: LogicalPlan, leaf: LogicalPlan,
      groupExprs: Seq[Expression], gslots: Seq[GSlot.T],
      walkAgg: BoundaryWalk.Agg): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min, Sum => ASum}
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val dec38 = DecimalType(38, 0)
    val sumCols = gslots.collect { case GSlot.Sm(c) => c }.distinctBy(_.exprId)
    val avgCols = gslots.collect { case GSlot.Av(c) => c }.distinctBy(_.exprId)
    val extKeys = gslots.collect { case GSlot.Ext(c, mx) => (c, mx) }.distinct
    // pure-metadata: one LocalRelation row per group
    if (walkAgg.boundary.isEmpty) {
      val rows = walkAgg.groups.toSeq.map { case (key, g) =>
        InternalRow.fromSeq(gslots.map {
          case GSlot.Group(i) => key(i)
          case GSlot.Cnt => g.cnt
          case GSlot.Sm(c) =>
            val (v, nn) = g.sums.getOrElse(c.name, (BigDecimal(0), 0L))
            if (nn > 0L) v.toLong else null
          case GSlot.Av(c) =>
            val (v, nn) = g.sums.getOrElse(c.name, (BigDecimal(0), 0L))
            if (nn > 0L) v.toDouble / nn.toDouble else null
          case GSlot.Ext(c, mx) => g.exts.get((c.name, mx)).orNull
        })
      }
      return Some(LocalRelation(agg.output, rows))
    }
    val subRel = GraftBatchShim
      .restrictScanTo(spark, leaf, walkAgg.boundary).getOrElse(return None)
    val newChild = child.transformUp { case p if p eq leaf => subRel }
    // channel schema — POSITIONAL across the union's two sides
    val chanGroup = groupExprs.zipWithIndex.map { case (g, i) =>
      AttributeReference(s"__graft_gk_$i", g.dataType, nullable = true)() }
    val chanCnt = AttributeReference("__graft_gcnt", LongType,
      nullable = false)()
    val chanSum = sumCols.map(c => c.exprId -> AttributeReference(
      s"__graft_gsum_${c.name}", LongType, nullable = true)()).toMap
    val chanExt = extKeys.map { case (c, mx) => (c.exprId, mx) ->
      AttributeReference(s"__graft_gext_${c.name}_$mx", c.dataType,
        nullable = true)() }.toMap
    val chanAvgS = avgCols.map(c => c.exprId -> AttributeReference(
      s"__graft_gavgs_${c.name}", dec38, nullable = true)()).toMap
    val chanAvgC = avgCols.map(c => c.exprId -> AttributeReference(
      s"__graft_gavgc_${c.name}", LongType, nullable = false)()).toMap
    val chanOrder: Seq[Attribute] = chanGroup ++ (chanCnt +:
      (sumCols.map(c => chanSum(c.exprId)) ++
        extKeys.map(k => chanExt((k._1.exprId, k._2))) ++
        avgCols.map(c => chanAvgS(c.exprId)) ++
        avgCols.map(c => chanAvgC(c.exprId))))
    val insideRows = walkAgg.groups.toSeq.map { case (key, g) =>
      InternalRow.fromSeq(key ++ (g.cnt +:
        (sumCols.map { c =>
          val (v, nn) = g.sums.getOrElse(c.name, (BigDecimal(0), 0L))
          if (nn > 0L) v.toLong else null
        } ++
          extKeys.map { case (c, mx) => g.exts.get((c.name, mx)).orNull } ++
          avgCols.map { c =>
            val (v, nn) = g.sums.getOrElse(c.name, (BigDecimal(0), 0L))
            if (nn > 0L)
              org.apache.spark.sql.types.Decimal(v.setScale(0).bigDecimal)
            else null
          } ++
          avgCols.map(c =>
            g.sums.getOrElse(c.name, (BigDecimal(0), 0L))._2))))
    }
    val insideRel = LocalRelation(chanOrder, insideRows)
    val bOut: Seq[NamedExpression] =
      groupExprs.zipWithIndex.map { case (g, i) =>
        Alias(g, s"__graft_gk_$i")() } ++
        (Alias(Count(Seq(Literal(1L))).toAggregateExpression(),
          "__graft_gcnt")() +:
          (sumCols.map(c => Alias(new ASum(c).toAggregateExpression(),
            s"__graft_gsum_${c.name}")()) ++
            extKeys.map { case (c, mx) =>
              val fn = if (mx) Max(c) else Min(c)
              Alias(fn.toAggregateExpression(),
                s"__graft_gext_${c.name}_$mx")()
            } ++
            avgCols.map(c => Alias(
              new ASum(Cast(c, dec38)).toAggregateExpression(),
              s"__graft_gavgs_${c.name}")()) ++
            avgCols.map(c => Alias(Count(Seq(c)).toAggregateExpression(),
              s"__graft_gavgc_${c.name}")())))
    val bAgg = Aggregate(groupExprs, bOut, newChild)
    val u = Union(Seq(insideRel, bAgg))
    val uo = u.output
    val uG = uo.take(groupExprs.size)
    var pos = groupExprs.size
    def nextU(): Attribute = { val a = uo(pos); pos += 1; a }
    val uCnt = nextU()
    val uSum = sumCols.map(c => c.exprId -> nextU()).toMap
    val uExt = extKeys.map { case (c, mx) =>
      (c.exprId, mx) -> nextU() }.toMap
    val uAvgS = avgCols.map(c => c.exprId -> nextU()).toMap
    val uAvgC = avgCols.map(c => c.exprId -> nextU()).toMap
    val outs: Seq[NamedExpression] = gslots.zip(aggExprs).map {
      case (GSlot.Group(i), e) =>
        Alias(uG(i), e.name)(exprId = e.exprId)
      case (GSlot.Cnt, e) =>
        // every group in the union has >= 1 non-null count row
        Alias(new ASum(uCnt).toAggregateExpression(), e.name)(
          exprId = e.exprId)
      case (GSlot.Sm(c), e) =>
        // SUM skips the null channel rows — SQL totality per group
        Alias(new ASum(uSum(c.exprId)).toAggregateExpression(), e.name)(
          exprId = e.exprId)
      case (GSlot.Av(c), e) =>
        val num = new ASum(uAvgS(c.exprId)).toAggregateExpression()
        val den = new ASum(uAvgC(c.exprId)).toAggregateExpression()
        Alias(If(EqualTo(den, Literal(0L)), Literal(null, DoubleType),
          Divide(Cast(num, DoubleType), Cast(den, DoubleType),
            EvalMode.LEGACY)), e.name)(exprId = e.exprId)
      case (GSlot.Ext(c, mx), e) =>
        val fn = if (mx) Max(uExt((c.exprId, mx)))
          else Min(uExt((c.exprId, mx)))
        Alias(fn.toAggregateExpression(), e.name)(exprId = e.exprId)
    }
    Some(Aggregate(uG, outs, u))
  }

  /** The GLOBAL census answer: COUNT(*) / COUNT(partition cols) /
    * MIN/MAX of partition OR stats-covered data columns, over
    * (partition-only filters over) a census-carrying relation, with SQL's
    * empty-input totality (COUNT 0, MIN/MAX NULL). */
  private def censusGlobal(agg: Aggregate, aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    val info = censusOf(child).getOrElse(return None)
    val slots = traverseOpt(aggExprs.map {
      case Alias(e, _) => classifySlot(e, info, groupRefs = false)
      case _ => None
    }).getOrElse(return None)
    val dirAgg = censusDirAgg(info, slots).getOrElse(return None)
    val live = liveEntries(info)
    val values = slots.map(
      evalSlot(_, live, info, dirAgg).getOrElse(return None))
    Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
  }

  /** The LAZY-STATS dispatch for census DATA-column slots: when the
    * relation is checkpoint-anchored and its stats map is not already
    * driver-resident, the per-file hooks must NOT iterate on the driver —
    * fetch the per-(partition dir, column) aggregates computed
    * DISTRIBUTED over the checkpoint instead, and decline (None) when
    * that walk cannot ship. Some(None) = driver hooks are fine (or no
    * data column is referenced); Some(Some(map)) = evaluate dir-level. */
  private def censusDirAgg(info: CensusInfo, slots: Seq[Slot])
      : Option[Option[Map[String, Map[String, DistStats.ColAgg]]]] = {
    val dataCols = slots.collect {
      case SumDataSlot(c, _) => c
      case CountDataSlot(c) => c
      case AvgDataSlot(c) => c
      case MinMaxDataSlot(c, _, _) => c
    }.distinct
    if (dataCols.isEmpty ||
        GraftBatchShim.graftStatsDriverCheap(info.leaf).getOrElse(true))
      Some(None)
    else GraftBatchShim.graftCensusDistOf(info.leaf)
      .flatMap(_(dataCols)) match {
      case Some(m) => Some(Some(m))
      case None => None // anchored, no distributed answer: decline, never force
    }
  }

  // --- census slot machinery, shared by the grouped and global cases ---

  private sealed trait Slot
  private case class GroupSlot(i: Int) extends Slot
  /** A DERIVED group key's value (bound expression over the census tuple —
    * constant within the group by construction). */
  private case class GroupExprSlot(e: Expression) extends Slot
  private case object CountStarSlot extends Slot
  /** COUNT(cols): live rows whose every argument (a partition column or a
    * derived partition value, pre-bound) is non-null — constant within a
    * partition, so per-entry null checks are row-level ones. */
  private case class CountColsSlot(es: Seq[Expression]) extends Slot
  /** COUNT(DISTINCT cols): distinct all-non-null argument tuples among
    * the live entries — "how many days (or YEARS — derived) of data"
    * without touching a file. */
  private case class CountDistinctSlot(es: Seq[Expression]) extends Slot
  private case class MinMaxSlot(i: Int,
      dt: org.apache.spark.sql.types.DataType, takeMax: Boolean) extends Slot
  /** MIN/MAX of a DERIVED partition value: evaluate per census entry
    * (row-local function of partition columns ⇒ the per-partition value
    * IS every member row's value). */
  private case class MinMaxExprSlot(e: Expression,
      dt: org.apache.spark.sql.types.DataType, takeMax: Boolean) extends Slot
  /** A constant output slot (NULLed-out group keys and grouping ids in a
    * grouping-sets rewrite). */
  private case class ConstSlot(v: Any) extends Slot
  /** SUM of a DATA column from the per-file exact sums ANALYZE records
    * (integral/decimal; SQL NULL totality via the non-null counts). */
  private case class SumDataSlot(colName: String,
      dt: org.apache.spark.sql.types.DataType) extends Slot
  /** COUNT of a DATA column: per-file live non-null counts summed. */
  private case class CountDataSlot(colName: String) extends Slot
  /** AVG of an INTEGRAL data column: the exact sum / non-null count
    * quotient with ONE rounding at the divide — integer-AVG semantics as
    * DuckDB computes it, and the mathematically exact answer where a
    * double-accumulating scan would have rounded along the way (past
    * 2^53 the scan's own result depends on its partial order; the
    * metadata answer does not reproduce any one order). SQL NULL on zero
    * non-null inputs; decimal/float inputs decline. */
  private case class AvgDataSlot(colName: String) extends Slot
  /** MIN/MAX of a DATA column from per-file manifest stats. */
  private case class MinMaxDataSlot(colName: String,
      dt: org.apache.spark.sql.types.DataType, takeMax: Boolean) extends Slot



  private def classifySlot(e: Expression, info: CensusInfo,
      groupRefs: Boolean): Option[Slot] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
    // a COUNT argument bound to the census tuple: a partition column, an
    // already-derived value, or an inline partition-derivable expression
    def colBound(x: Expression): Option[Expression] = x match {
      case a: AttributeReference if info.idxOf.contains(a.exprId) =>
        Some(BoundReference(info.idxOf(a.exprId), a.dataType,
          nullable = true))
      case a: AttributeReference => info.derivedOf.get(a.exprId)
      case e2 if e2.references.nonEmpty => bindPart(e2, info)
      case _ => None
    }
    def minMax(a: Expression, takeMax: Boolean): Option[Slot] = a match {
      case at: AttributeReference => info.idxOf.get(at.exprId)
        .map(MinMaxSlot(_, at.dataType, takeMax))
        .orElse(info.derivedOf.get(at.exprId)
          .map(MinMaxExprSlot(_, at.dataType, takeMax)))
        .orElse(info.dataColOf.get(at.exprId)
          .map(MinMaxDataSlot(_, at.dataType, takeMax)))
      // an inline derived value (`MAX(year(d))` with no Project pull-out):
      // constant per partition ⇒ the per-entry extremum IS the row-level one
      case other if other.references.nonEmpty =>
        bindPart(other, info).map(MinMaxExprSlot(_, other.dataType, takeMax))
      case _ => None
    }
    e match {
      case a: AttributeReference if groupRefs =>
        info.idxOf.get(a.exprId).map(GroupSlot(_))
          .orElse(info.derivedOf.get(a.exprId).map(GroupExprSlot(_)))
      case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
          if l.value != null => Some(CountStarSlot)
      case AggregateExpression(Count(args), _, false, None, _)
          if args.nonEmpty =>
        traverseOpt(args.map(colBound)).map(CountColsSlot(_))
          .orElse(args match {
            // COUNT(data col): footer null counts per file (multi-arg
            // counts rows where ALL are non-null — not composable)
            case Seq(a: AttributeReference) =>
              info.dataColOf.get(a.exprId).map(CountDataSlot(_))
            case _ => None
          })
      case e2 @ AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Sum(
            a: AttributeReference, _), _, false, None, _) =>
        info.dataColOf.get(a.exprId).map(SumDataSlot(_, e2.dataType))
      // AVG(integral data col) → DOUBLE: exact sum / non-null count
      case e2 @ AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Average(
            a: AttributeReference, _), _, false, None, _)
          if e2.dataType == org.apache.spark.sql.types.DoubleType &&
            (a.dataType == org.apache.spark.sql.types.LongType ||
              a.dataType == org.apache.spark.sql.types.IntegerType ||
              a.dataType == org.apache.spark.sql.types.ShortType ||
              a.dataType == org.apache.spark.sql.types.ByteType) =>
        info.dataColOf.get(a.exprId).map(AvgDataSlot(_))
      case AggregateExpression(Count(args), _, true, None, _)
          // DISTINCT dedups by VALUE equality — decline types without it
          if args.nonEmpty && args.forall(a =>
            org.apache.spark.sql.catalyst.util.TypeUtils
              .typeWithProperEquals(a.dataType)) =>
        traverseOpt(args.map(colBound)).map(CountDistinctSlot(_))
      case AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Min(a),
          _, false, None, _) => minMax(a, takeMax = false)
      case AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Max(a),
          _, false, None, _) => minMax(a, takeMax = true)
      case _ => None
    }
  }

  /** One slot's value over a set of census entries (a group, or the whole
    * filtered table): None means the slot CANNOT be answered exactly —
    * the caller abandons the rewrite. With `dirAgg` set (anchored table,
    * stats not driver-resident) the DATA-column slots read the
    * distributed per-(partition dir, column) aggregates instead of
    * iterating per-file hooks — same refusal semantics, dir granularity
    * (entries ARE partition dirs, so any entry grouping composes). */
  private def evalSlot(slot: Slot,
      entries: Seq[(org.apache.spark.sql.catalyst.InternalRow, Long, Seq[String])],
      info: CensusInfo,
      dirAgg: Option[Map[String, Map[String, DistStats.ColAgg]]] = None)
      : Option[Any] = {
    import org.apache.spark.sql.catalyst.util.TypeUtils
    val fields = info.partSchema.fields
    def valueAt(row: org.apache.spark.sql.catalyst.InternalRow, i: Int): Any =
      row.get(i, fields(i).dataType)
    // one ColAgg per entry for `colName`, refusal (None) propagating —
    // an entry's member files are exactly its partition dir's live files
    def dirAggsOf(m: Map[String, Map[String, DistStats.ColAgg]],
        colName: String): Option[Seq[DistStats.ColAgg]] = {
      val per = entries.map(e => e._3.headOption
        .flatMap(f => m.get(DistStats.partDirOf(f)))
        .flatMap(_.get(colName)))
      if (per.forall(_.isDefined)) Some(per.map(_.get)) else None
    }
    slot match {
      case ConstSlot(v) => Some(v)
      case GroupSlot(i) =>
        Some(entries.headOption.map(e => valueAt(e._1, i)).orNull)
      case GroupExprSlot(e) =>
        Some(entries.headOption.map(en => e.eval(en._1)).orNull)
      case CountStarSlot => Some(entries.map(_._2).sum)
      case CountColsSlot(es) =>
        Some(entries.filter(e => es.forall(_.eval(e._1) != null))
          .map(_._2).sum)
      case CountDistinctSlot(es) =>
        Some(entries.map(e => es.map(_.eval(e._1)))
          .filter(_.forall(_ != null)).distinct.size.toLong)
      case MinMaxSlot(i, dt, takeMax) =>
        val vs = entries.map(_._1).filterNot(_.isNullAt(i))
          .map(valueAt(_, i))
        Some(if (vs.isEmpty) null
          else if (takeMax) vs.max(TypeUtils.getInterpretedOrdering(dt))
          else vs.min(TypeUtils.getInterpretedOrdering(dt)))
      case MinMaxExprSlot(e, dt, takeMax) =>
        val vs = entries.map(en => e.eval(en._1)).filter(_ != null)
        Some(if (vs.isEmpty) null
          else if (takeMax) vs.max(TypeUtils.getInterpretedOrdering(dt))
          else vs.min(TypeUtils.getInterpretedOrdering(dt)))
      case SumDataSlot(colName, dt) =>
        // exact per-file sums + non-null counts: ANY file that cannot
        // answer exactly (DV marks, never analyzed) abandons the rewrite;
        // zero non-null inputs is SQL NULL; a result-type overflow
        // declines (a scan would wrap or null there — never mimic from
        // metadata)
        val (nn, tot) = sumChannelsOf(colName, entries, info, dirAgg)
          .getOrElse(return None)
        if (nn == 0L) Some(null)
        else sumInternal(tot, dt) match {
          case Some(v) => Some(v)
          case None => return None
        }
      case CountDataSlot(colName) =>
        sumChannelsOf(colName, entries, info, dirAgg,
          needSum = false) match {
          case Some((nn, _)) => Some(nn)
          case None => return None
        }
      case AvgDataSlot(colName) =>
        // exact-sum / non-null-count quotient with ONE rounding at the
        // divide — integer-AVG semantics as DuckDB computes it (exact
        // accumulation, single conversion), and the boundary rewrite's
        // BAvg discipline. Where the sum leaves double's 2^53 window a
        // double-accumulating scan may differ in the last ulp depending
        // on its own partial order — the metadata answer is the
        // mathematically exact one, not a reproduction of one particular
        // accumulation order.
        val (nn, tot) = sumChannelsOf(colName, entries, info, dirAgg)
          .getOrElse(return None)
        if (nn == 0L) Some(null)
        else Some(tot.toDouble / nn.toDouble)
      case MinMaxDataSlot(colName, dt, takeMax) =>
        // exact per-file bounds: ANY file that cannot answer exactly (DV
        // marks, missing/truncated stats) abandons the rewrite; all-NULL
        // files contribute nothing, and zero contributing files is NULL
        val bounds: Seq[(Any, Any)] = dirAgg match {
          case Some(m) => dirAggsOf(m, colName).getOrElse(return None)
            .map(_.bounds match {
              case None => return None
              case Some(b) => b
            }).flatten
          case None => entries.flatMap(_._3).map(f =>
            info.fileMinMaxOf(f, colName) match {
              case None => return None
              case Some(b) => b
            }).flatten
        }
        if (bounds.isEmpty) Some(null)
        else {
          val statV =
            if (takeMax) bounds.map(_._2)
              .max(graft.sources.DataSkipping.statOrdering)
            else bounds.map(_._1)
              .min(graft.sources.DataSkipping.statOrdering)
          internalOf(statV, dt) match {
            case Some(v) => Some(v)
            case None => return None // inexact conversion: refuse, not lie
          }
        }
    }
  }

  /** A data column's (non-null count, exact sum) over `entries` — per-file
    * driver hooks, or the distributed per-dir aggregates when `dirAgg` is
    * set. None the moment anything cannot answer exactly. */
  private def sumChannelsOf(colName: String,
      entries: Seq[(org.apache.spark.sql.catalyst.InternalRow, Long, Seq[String])],
      info: CensusInfo,
      dirAgg: Option[Map[String, Map[String, DistStats.ColAgg]]],
      needSum: Boolean = true): Option[(Long, BigDecimal)] = dirAgg match {
    case Some(m) =>
      var nn = 0L
      var tot = BigDecimal(0)
      entries.foreach { e =>
        val agg = e._3.headOption
          .flatMap(f => m.get(DistStats.partDirOf(f)))
          .flatMap(_.get(colName)).getOrElse(return None)
        agg.nn match {
          case Some(n) => nn += n
          case None => return None
        }
        if (needSum) agg.sum match {
          case Some(x) => tot += x
          case None => return None
        }
      }
      Some((nn, tot))
    case None =>
      val (sumOfF, nnOfF) = org.apache.spark.sql.graft.GraftBatchShim
        .graftSumHooksOf(info.leaf).getOrElse(return None)
      var nn = 0L
      var tot = BigDecimal(0)
      entries.flatMap(_._3).foreach { f =>
        nnOfF(f, colName) match {
          case Some(n) => nn += n
          case None => return None
        }
        if (needSum) sumOfF(f, colName) match {
          case Some(x) => tot += x
          case None => return None
        }
      }
      Some((nn, tot))
  }

  private def rewriteCensus(agg: Aggregate, groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      info: CensusInfo): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    // every group key must be a partition column or a derived partition
    // value (`year(event_date)` — bound and evaluated per census entry);
    // non-atomic key types decline (driver grouping uses value equality)
    val gBound: Seq[Expression] = groups.map { g =>
      if (!org.apache.spark.sql.catalyst.util.TypeUtils
          .typeWithProperEquals(g.dataType))
        return None // e.g. byte[] groups by reference — decline, not mis-group
      bindPart(g, info).getOrElse(return None)
    }
    val slots = traverseOpt(aggExprs.map {
      case a: AttributeReference => classifySlot(a, info, groupRefs = true)
      case Alias(e, _)
          if !e.exists(_.isInstanceOf[AggregateExpression]) &&
            groups.exists(_.semanticEquals(e)) =>
        // a group expression spelled inline in the output (`year(d) AS yr`
        // with no Project pull-out)
        bindPart(e, info).map(GroupExprSlot(_))
      case Alias(e, _) =>
        classifySlot(e, info, groupRefs = true)
      case _ => None
    }).getOrElse(return None)
    val dirAgg = censusDirAgg(info, slots).getOrElse(return None)
    val live = liveEntries(info)
    val grouped = live.groupBy { case (row, _, _) =>
      gBound.map(_.eval(row)) }
    val outRows = grouped.toSeq.map { case (_, entries) =>
      InternalRow.fromSeq(
        slots.map(evalSlot(_, entries, info, dirAgg).getOrElse(return None)))
    }
    Some(LocalRelation(agg.output, outRows))
  }
}

