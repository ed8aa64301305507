package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, DoubleType, IntegerType, LongType, ShortType}

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
  * PREDICATES: a view maintained over `WHERE p` answers queries whose
  * filter conjuncts include p's (matched semantically after name
  * canonicalization — folded/rewritten shapes that no longer match
  * decline, never mis-match). Conjuncts beyond the view's — including all
  * of them, for an unfiltered view — survive as a RESIDUAL filter over
  * the view, provided they reference only the view's GROUP BY columns
  * (group columns are constant within a group, so filtering view rows is
  * exactly filtering source rows). Anything else declines.
  *
  * Fires only when ALL of:
  *  - the aggregate's child is (attribute-only projections / filters
  *    over) a graft snapshot relation carrying registered views
  *    (`graft.mv.views`) and a pinned version — both attached at relation
  *    build, so tables without views cost one pattern match and zero
  *    manifest reads;
  *  - every grouping expression matches a view group item (plain column
  *    or derived key), and every aggregate re-aggregates EXACTLY from a
  *    maintained companion: COUNT(*) / COUNT(col) / SUM / MIN / MAX /
  *    AVG (sum+count recombined) of integral or decimal columns, and the
  *    exact-distinct family (COUNT/SUM/AVG(DISTINCT)) through the stored
  *    ndv column or its (group, value) helper. Fractional SUM/AVG decline
  *    (reordering float partial sums is not bit-exact), as does anything
  *    FILTERed. GROUPING SETS / ROLLUP / CUBE rewrite to the same Expand
  *    shape over the view (the distinct family declines there);
  *  - a registered view's refresh watermark ([[VersionedTable.lastTxn]])
  *    equals the relation's pinned source version EXACTLY — a stale view
  *    (source moved, refresh hasn't) or a time-travel read of some other
  *    version silently declines, never approximates. The view is then
  *    read PINNED at the version whose watermark was checked, so a
  *    concurrent refresh cannot slide newer data under the rewrite.
  *
  * The substituted node preserves the original output attribute ids
  * (downstream operators keep binding), and SQL null semantics survive:
  * a global COUNT(*) over an empty (or fully-filtered) table coalesces
  * its SUM(mv_count) to 0, and SUM-of-sums skips the per-group NULLs the
  * view maintains for all-NULL groups. Disable with
  * `spark.graft.mv.rewrite.enabled=false`.
  */
object GraftMvRewrite {
  /** Stable synthetic ExprId per COLUMN NAME for predicate normalization:
    * both sides of a comparison draw from this map, so equal names always
    * share an id and DIFFERENT names never do — deriving the id from
    * name.hashCode would let colliding names (the classic "Aa"/"BB")
    * falsely match two different predicates. */
  private val nameIds =
    new java.util.concurrent.ConcurrentHashMap[String, ExprId]()
  private def idFor(n: String): ExprId =
    nameIds.computeIfAbsent(n, _ => NamedExpression.newExprId)
}

case class GraftMvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.mv.rewrite.enabled", "true").toBoolean

  /** Name-canonical form of an expression: every attribute reference
    * resolves through `envOf` to its canonical SOURCE-LEVEL expression — a
    * synthetic attribute keyed by source column name for relation columns,
    * or the (already-canonical) computed expression for derived Project
    * columns (the optimizer's PullOutGroupingExpressions extracts
    * `year(d)` into exactly such a column). Two plans' expressions then
    * compare with `semanticEquals` and rebuild against any attribute
    * space. None when the expression reaches outside the environment, is
    * non-deterministic, or carries a subquery. */
  private def named(e: Expression,
      envOf: Map[ExprId, Expression]): Option[Expression] = {
    if (!e.deterministic || e.exists(_.isInstanceOf[PlanExpression[_]]))
      return None
    var ok = true
    // manual substitution, NOT transformDown: a replacement like
    // `year(canonAttr(d))` contains canonical attrs whose ids are not in
    // the environment — descending into it would mis-flag them as
    // unresolvable
    def subst(x: Expression): Expression = x match {
      case a: AttributeReference => envOf.get(a.exprId) match {
        case Some(canon) => canon
        case None => ok = false; a
      }
      case other => other.mapChildren(subst)
    }
    val t = subst(e)
    if (!ok) return None
    // fold constant subtrees: the QUERY side arrives optimizer-folded
    // (`cast(2 as bigint)` → `2L`) while the view's stored WHERE is only
    // analyzed — without folding, identical predicates would never match
    Some(t.transformDown {
      case e if e.foldable && !e.isInstanceOf[Literal] =>
        Literal.create(e.eval(), e.dataType)
    })
  }

  private def canonAttr(a: Attribute): Expression =
    AttributeReference(a.name, a.dataType, a.nullable)(
      exprId = GraftMvRewrite.idFor(a.name))

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** The join half of a matched `fact ⋈ dim` shape: the dim relation's
    * identity (path + pinned version) and the equi-join key pairs as
    * (fact column, dim column) names. */
  private case class QueryJoin(dimPath: String, dimV: Long,
      pairs: Set[(String, String)]) {
    def keyNames: Set[String] = pairs.flatMap(p => Set(p._1, p._2))
  }

  /** What the aggregate's child resolved to: the FACT relation's rewrite
    * info, the merged exprId → canonical-expression environment, every
    * filter conjunct found anywhere in the walked tree (above or below a
    * join — pushdown moves them, the pool is position-independent), and
    * the join halves when the child is a star shape (one per joined
    * dimension, any association order). */
  private case class SrcInfo(views: Seq[String], srcV: Long,
      env: Map[ExprId, Expression], conds: Seq[Expression],
      joins: Seq[QueryJoin],
      /** The fact relation's raw FK declarations — what lets an OUTER star
        * spelling prove it IS the inner join the view maintains. */
      fkRaw: Seq[String])

  /** Walk projections (attribute-passing AND computed columns), filters,
    * and INNER equi-joins whose other side is a plain graft snapshot
    * (a dimension) — one per star arm, whatever association the
    * optimizer chose. */
  private def sourceOf(plan: LogicalPlan): Option[SrcInfo] =
    GraftBatchShim.mvRewriteInfoOf(plan) match {
      case Some((views, v)) =>
        Some(SrcInfo(views, v,
          plan.output.map(a => a.exprId -> canonAttr(a)).toMap, Nil, Nil,
          GraftBatchShim.fkInfoOf(plan).map(_._3).getOrElse(Nil)))
      case None => plan match {
        case Project(items, child) =>
          sourceOf(child).map { s =>
            s.copy(env = items.flatMap {
              case a: AttributeReference => s.env.get(a.exprId).map(a.exprId -> _)
              case al @ Alias(e, _) => named(e, s.env).map(al.exprId -> _)
              case _ => None
            }.toMap)
          }
        case Filter(cond, child) =>
          sourceOf(child).flatMap { s =>
            // the filter's output is its child's, so `env` is exactly the
            // map cond's references resolve in
            val split = splitConjuncts(cond).map(named(_, s.env))
            if (split.forall(_.isDefined))
              Some(s.copy(conds = s.conds ++ split.map(_.get)))
            else None
          }
        case Join(l, r, Inner, Some(cond), _) =>
          joined(l, r, cond).orElse(joined(r, l, cond))
        // OUTER star spellings (the BI `fact LEFT JOIN dim` idiom, and its
        // RIGHT mirror): the query IS the inner join the view maintains
        // when a validated FK pin at exactly these snapshots proves every
        // fact row matched — requirePin makes joined() check it
        case Join(l, r, LeftOuter, Some(cond), _) =>
          joined(l, r, cond, requirePin = true)
        case Join(l, r, RightOuter, Some(cond), _) =>
          joined(r, l, cond, requirePin = true)
        case _ => None
      }
    }

  /** Match `accumulatedSide INNER JOIN dimSide ON <equi keys>`: the
    * accumulated side resolves through [[sourceOf]] (the bare fact, or
    * fact ⋈ earlier dims — multi-dim stars compose one arm at a time),
    * the dim side through [[dimOf]]; the join condition must be PURE key
    * equalities. The canonical environment is keyed by column NAME, so a
    * non-key name shared by both sides would alias two different columns
    * — refused here (a join view over such tables cannot exist anyway:
    * create refuses the collision). The join keys may reference EARLIER
    * dims' columns too (snowflakes) — `fact.env` already carries them. */
  private def joined(factSide: LogicalPlan, dimSide: LogicalPlan,
      cond: Expression, requirePin: Boolean = false): Option[SrcInfo] =
    for {
      fact <- sourceOf(factSide)
      (dimPath, dimV, dimEnv, dimConds) <- dimOf(dimSide)
      pairs <- traverse(splitConjuncts(cond).map {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          (plainCol(a, fact.env), plainCol(b, dimEnv),
            plainCol(b, fact.env), plainCol(a, dimEnv)) match {
            case (Some(fa), Some(db), _, _) => Some((fa, db))
            case (_, _, Some(fb), Some(da)) => Some((fb, da))
            case _ => None
          }
        case _ => None // any non-equi conjunct: not the recorded shape
      }).map(_.toSet)
      keyNames = pairs.flatMap(p => Set(p._1, p._2))
      shared = factSide.output.map(_.name).toSet
        .intersect(dimSide.output.map(_.name).toSet)
      if shared.subsetOf(keyNames)
      // OUTER spelling: a validated FK pin at EXACTLY (fact.srcV, dimV)
      // proves every fact row matched (keys non-null, dim key unique), so
      // the outer join produces no null-extended rows — it IS the inner
      // join. A dim-side filter would break that (a lost match NULLS the
      // row instead of dropping it): only the vacuous IsNotNull on an
      // equated key column is tolerated (null keys never match anything).
      if !requirePin || (fact.fkRaw.flatMap(graft.sources.ForeignKeys.parse)
        .exists(d => d.fkCols.zip(d.pkCols).toSet == pairs &&
          new org.apache.hadoop.fs.Path(d.dimPath).toUri.getPath == dimPath &&
          d.factPin == fact.srcV && d.dimPin == dimV) &&
        dimConds.forall {
          case IsNotNull(at: AttributeReference) => keyNames.contains(at.name)
          case _ => false
        })
    } yield SrcInfo(fact.views, fact.srcV, fact.env ++ dimEnv,
      fact.conds ++ dimConds,
      fact.joins :+ QueryJoin(dimPath, dimV, pairs), fact.fkRaw)

  private def plainCol(a: AttributeReference,
      env: Map[ExprId, Expression]): Option[String] =
    env.get(a.exprId).collect { case at: AttributeReference => at.name }

  /** The dimension side: (projections/filters over) ANY graft snapshot
    * relation — identified by root path + pinned version. */
  private def dimOf(plan: LogicalPlan)
      : Option[(String, Long, Map[ExprId, Expression], Seq[Expression])] =
    GraftBatchShim.graftSnapshotOf(plan) match {
      case Some((root, v)) =>
        Some((root.toUri.getPath, v,
          plan.output.map(a => a.exprId -> canonAttr(a)).toMap, Nil))
      case None => plan match {
        case Project(items, child) =>
          dimOf(child).map { case (p, v, base, conds) =>
            (p, v, items.flatMap {
              case a: AttributeReference => base.get(a.exprId).map(a.exprId -> _)
              case al @ Alias(e, _) => named(e, base).map(al.exprId -> _)
              case _ => None
            }.toMap, conds)
          }
        case Filter(cond, child) =>
          dimOf(child).flatMap { case (p, v, base, conds) =>
            val split = splitConjuncts(cond).map(named(_, base))
            if (split.forall(_.isDefined))
              Some((p, v, base, conds ++ split.map(_.get)))
            else None
          }
        case _ => None
      }
    }

  /** The SOURCE COLUMN NAME behind an attribute, when its canonical form
    * is a plain relation column (what SUM/MIN/MAX/COUNT(col) need — they
    * answer from per-COLUMN companions on the view). */
  private def colName(a: AttributeReference,
      envOf: Map[ExprId, Expression]): Option[String] =
    envOf.get(a.exprId).collect { case at: AttributeReference => at.name }

  /** What each output slot of the original aggregate needs from the view.
    * Group slots carry their NAME-CANONICAL expression — a plain column or
    * a derived key (`to_date(ts)`), matched against the view's group items
    * the same way predicates are. */
  private sealed trait Out
  private case class GroupOut(id: ExprId, name: String, norm: Expression,
      dt: org.apache.spark.sql.types.DataType) extends Out
  private case class CountOut(id: ExprId, name: String) extends Out
  /** COUNT(col) — the NON-NULL count: answers from the view's nn_<col>
    * companion (maintained for every SUM/MIN/MAX column). */
  private case class CountColOut(id: ExprId, name: String,
      srcCol: String) extends Out
  private case class SumOut(id: ExprId, name: String, srcCol: String,
      dt: org.apache.spark.sql.types.DataType) extends Out
  private case class MinOut(id: ExprId, name: String, srcCol: String,
      dt: org.apache.spark.sql.types.DataType) extends Out
  private case class MaxOut(id: ExprId, name: String, srcCol: String,
      dt: org.apache.spark.sql.types.DataType) extends Out
  /** AVG(col) — answered from the view's sum_<col>/nn_<col> companions
    * (exactly how the MV DDL maintains AVG: a stored quotient would go
    * stale the moment either component moved). `srcDt` is the SOURCE
    * column type (drives the recombination tree), `dt` the original AVG
    * output type. */
  private case class AvgOut(id: ExprId, name: String, srcCol: String,
      srcDt: org.apache.spark.sql.types.DataType,
      dt: org.apache.spark.sql.types.DataType) extends Out
  /** COUNT(DISTINCT col[, col…]) — answers from the view's ndv companion
    * at exact grouping, from the tuple's helper at rollups. `srcCols`
    * matches a stored tuple as a SET (column order is semantics-free). */
  private case class NdvOut(id: ExprId, name: String,
      srcCols: Seq[String]) extends Out
  /** SUM(DISTINCT col) — answers from the HELPER table at every grouping
    * (the helper IS the materialized distinct value set; re-summing with
    * DISTINCT dedups values shared across rolled-up groups). Integral and
    * decimal inputs only, like SumOut. */
  private case class SumDistinctOut(id: ExprId, name: String,
      srcCol: String, dt: org.apache.spark.sql.types.DataType) extends Out
  /** AVG(DISTINCT col) — recombines the helper's COUNT(DISTINCT) and
    * SUM(DISTINCT) at every grouping, with Average's own divide tree. */
  private case class AvgDistinctOut(id: ExprId, name: String,
      srcCol: String, srcDt: org.apache.spark.sql.types.DataType,
      dt: org.apache.spark.sql.types.DataType) extends Out

  private def classify(e: NamedExpression,
      env: Map[ExprId, Expression]): Option[Out] = e match {
    case a: AttributeReference =>
      named(a, env).map(GroupOut(a.exprId, a.name, _, a.dataType))
    case al @ Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), n)
        if l.value != null =>
      Some(CountOut(al.exprId, n))
    case al @ Alias(AggregateExpression(Count(Seq(a: AttributeReference)), _, false, None, _), n) =>
      colName(a, env).map(CountColOut(al.exprId, n, _))
    // COUNT(DISTINCT col[, col…]): exact from the maintained ndv
    // companion / its (group, value-tuple) helper
    case al @ Alias(AggregateExpression(Count(as), _, true, None, _), n)
        if as.nonEmpty && as.forall(_.isInstanceOf[AttributeReference]) =>
      traverse(as.map(a =>
        colName(a.asInstanceOf[AttributeReference], env)))
        .map(NdvOut(al.exprId, n, _))
    // SUM at LongType or DecimalType: integral partial sums are exact, and
    // DECIMAL partial sums re-associate exactly too — the re-sum carries 10
    // extra digits (the same headroom Spark's own two-phase aggregation
    // uses) and casts back to the original SUM type, going NULL/throwing on
    // overflow exactly where the unrewritten SUM would. Float/double SUM
    // declines (re-association is not bit-exact). TRY declines: an
    // overflowed-to-NULL stored partial would be SKIPPED by the re-sum.
    case al @ Alias(AggregateExpression(Sum(a: AttributeReference, em), _, false, None, _), n)
        if em.evalMode != EvalMode.TRY &&
          (al.dataType == LongType ||
            al.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]) =>
      colName(a, env).map(SumOut(al.exprId, n, _, al.dataType))
    // SUM(DISTINCT col): exact from the distinct helper's value rows
    case al @ Alias(AggregateExpression(Sum(a: AttributeReference, em), _, true, None, _), n)
        if em.evalMode != EvalMode.TRY &&
          (al.dataType == LongType ||
            al.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]) =>
      colName(a, env).map(SumDistinctOut(al.exprId, n, _, al.dataType))
    // AVG(DISTINCT col): helper sum-distinct / count-distinct recombined
    case al @ Alias(AggregateExpression(Average(a: AttributeReference, em), _, true, None, _), n)
        if em != EvalMode.TRY && (a.dataType == LongType ||
          a.dataType == IntegerType || a.dataType == ShortType ||
          a.dataType == ByteType || a.dataType.isInstanceOf[DecimalType]) =>
      colName(a, env).map(AvgDistinctOut(al.exprId, n, _, a.dataType,
        al.dataType))
    // AVG recombines from exact SUM + non-null-COUNT components — the
    // same decomposition the view itself maintains. Integral and decimal
    // inputs only (double sums don't re-associate bit-exactly); TRY
    // declines as for SUM.
    case al @ Alias(AggregateExpression(Average(a: AttributeReference, em), _, false, None, _), n)
        if em != EvalMode.TRY && (a.dataType == LongType ||
          a.dataType == IntegerType || a.dataType == ShortType ||
          a.dataType == ByteType || a.dataType.isInstanceOf[DecimalType]) =>
      colName(a, env).map(AvgOut(al.exprId, n, _, a.dataType, al.dataType))
    // MIN/MAX re-aggregate EXACTLY for any orderable type: the min of
    // group-minima IS the min (no reordering concern, unlike float sums).
    // DISTINCT is a no-op on extrema, so both spellings classify alike
    case al @ Alias(AggregateExpression(Min(a: AttributeReference), _, _, None, _), n) =>
      colName(a, env).map(MinOut(al.exprId, n, _, a.dataType))
    case al @ Alias(AggregateExpression(Max(a: AttributeReference), _, _, None, _), n) =>
      colName(a, env).map(MaxOut(al.exprId, n, _, a.dataType))
    // a non-aggregate output slot: a group key, plain or derived — the
    // normalized form must match one of the view's group items
    case al @ Alias(g, n)
        if !g.exists(_.isInstanceOf[AggregateExpression]) =>
      named(g, env).map(GroupOut(al.exprId, n, _, al.dataType))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs,
          ex @ org.apache.spark.sql.catalyst.plans.logical.Expand(_, expOut, child), _)
          if expOut.exists(_.name == "spark_grouping_id") =>
        rewriteSets(groupExprs, aggExprs, ex, child).getOrElse(agg)
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        rewrite(groupExprs, aggExprs, child).getOrElse(agg)
    }
  }

  private def dbg(msg: => String): Unit =
    if (spark.sessionState.conf.getConfString(
      "spark.graft.mv.rewrite.debug", "false").toBoolean)
      // scalastyle:off println
      println(s"[mv-rewrite] $msg")
      // scalastyle:on println

  private def rewrite(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] =
    for {
      src <- sourceOf(child)
      _ = dbg(s"source v=${src.srcV} views=${src.views} conds=${src.conds} " +
        s"joins=${src.joins}")
      groupKeys <- traverse(groupExprs.map {
        case g if !g.exists(_.isInstanceOf[AggregateExpression]) =>
          val r = named(g, src.env)
          dbg(s"group expr $g (${g.getClass.getSimpleName}) -> $r; env keys=${src.env.keySet}")
          r
        case g => dbg(s"group expr $g contains aggregate"); None
      })
      _ = dbg(s"groupKeys=$groupKeys")
      outs <- traverse(aggExprs.map(classify(_, src.env)))
      _ = dbg(s"outs=$outs")
      plan <- src.views.iterator
        .flatMap(tryView(_, src, groupKeys, outs)).nextOption()
    } yield plan

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** The view's maintained SOURCE FRAME — the bare source relation, or
    * `fact ⋈ dims…` (each dim pinned) for a join view: the column space
    * the stored WHERE and derived group keys resolve in. */
  private def sourceFrameOf(props: Map[String, String])
      : Option[org.apache.spark.sql.DataFrame] =
    props.get(MaterializedView.SourceKey).flatMap { src =>
      scala.util.Try(MaterializedView.joinAll(spark,
        VersionedTable.read(spark, src),
        MaterializedView.joinsIn(props))).toOption
    }

  /** The view's WHERE predicate as name-canonical conjuncts — resolved by
    * filtering the view's SOURCE frame with the stored SQL, so types
    * and implicit casts land exactly as they did at create/refresh. */
  private def viewConds(props: Map[String, String]): Option[Seq[Expression]] =
    props.get(MaterializedView.WhereKey).filter(_.nonEmpty) match {
      case None => Some(Nil)
      case Some(sql) =>
        for {
          frame <- sourceFrameOf(props)
          analyzed <- scala.util.Try(
            frame.filter(org.apache.spark.sql.functions.expr(sql))
              .queryExecution.analyzed).toOption
          (cond, base) <- analyzed.collectFirst { case Filter(c, ch) =>
            (c, ch.output.map(a => a.exprId -> canonAttr(a)).toMap) }
          conjuncts <- traverse(splitConjuncts(cond).map(named(_, base)))
        } yield conjuncts
    }

  /** The view's group items as (alias, name-canonical expression) — plain
    * columns and derived keys (`day -> to_date(ts)`) alike. Plain-column
    * views (no [[MaterializedView.GroupExprsKey]]) build their items from
    * the VIEW's own attributes — same name, type, and relation
    * nullability as the source column by the groupBy pass-through — so
    * the common case costs no extra relation build; derived keys resolve
    * their stored SQL against the SOURCE relation so types land exactly
    * as create/refresh computed them. */
  private def groupItemsOf(props: Map[String, String],
      viewAttr: Map[String, Attribute]): Option[Seq[(String, Expression)]] = {
    val aliases = props.get(MaterializedView.GroupByKey).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    if (aliases.isEmpty) return None
    val exprOf = MaterializedView.groupExprsIn(props)
    if (exprOf.isEmpty)
      return traverse(aliases.map(a => viewAttr.get(a).map(va =>
        a -> canonAttr(va))))
    for {
      frame <- sourceFrameOf(props)
      analyzed <- scala.util.Try(
        frame.select(aliases.map(a =>
          org.apache.spark.sql.functions.expr(exprOf.getOrElse(a, s"`$a`"))
            .as(a)): _*)
          .queryExecution.analyzed).toOption
      items <- analyzed.collectFirst {
        case Project(projItems, ch) =>
          val base = ch.output.map(x => x.exprId -> canonAttr(x)).toMap
          traverse(projItems.map {
            case al @ Alias(e, a) => named(e, base).map(a -> _)
            case at: AttributeReference => named(at, base).map(at.name -> _)
            case _ => None
          })
      }.flatten
    } yield items
  }

  /** The view version whose refresh watermark equals `srcV` — the head
    * when fresh (the common case, O(1)), else a BINARY SEARCH over the
    * view's history: watermarks are monotone in view version (each
    * refresh moves the cursor forward, atomically with its commit), so a
    * TIME-TRAVEL query over the source rewrites to the view AS IT WAS.
    * A non-head hit additionally probes that its files still exist
    * (vacuum may have reclaimed them — a view is small, so the probe is
    * a handful of driver existence checks); declines otherwise. */
  private def versionFor(mvPath: String, srcV: Long): Option[Long] = {
    val head = VersionedTable.latestVersion(spark, mvPath).getOrElse(return None)
    def wm(v: Long): Option[Long] = scala.util.Try(
      VersionedTable.lastTxn(spark, mvPath, MaterializedView.App, Some(v)))
      .toOption.flatten
    wm(head) match {
      case Some(w) if w == srcV => Some(head)
      case Some(w) if w < srcV => None // view behind even at its head
      case _ =>
        var lo = 0L; var hi = head
        while (lo < hi) { // earliest version with watermark >= srcV
          val mid = lo + (hi - lo) / 2
          if (wm(mid).exists(_ >= srcV)) hi = mid else lo = mid + 1
        }
        wm(lo).filter(_ == srcV).map(_ => lo)
          .filter(v => scala.util.Try(
            VersionedTable.versionReadable(spark, mvPath, v)).getOrElse(false))
    }
  }

  private def tryView(mvPath: String, src: SrcInfo,
      groupKeys: Seq[Expression], outs: Seq[Out]): Option[LogicalPlan] = {
    val queryConds = src.conds
    // freshness, checked and then READ at the same pinned view version.
    // The DEFINITION comes from the head — it is immutable (redefinition
    // is refused), while a history hit's own version may predate the
    // props commit that follows the create snapshot
    val hv = versionFor(mvPath, src.srcV).getOrElse(return None)
    val props = VersionedTable.propertiesOf(spark, mvPath)
    // JOIN agreement: a join view answers only the join query over ITS
    // fact/dims/keys, each dim pinned at ITS version — and only at the
    // view HEAD (the pins are head properties that move on FULL refresh,
    // so historical view versions cannot vouch for their own pins). The
    // query's join arms match the view's as a SET (association order and
    // query spelling order are both free).
    val viewJoins = MaterializedView.joinsIn(props)
    if (viewJoins.size != src.joins.size)
      return None // join-ness mismatch: cannot answer
    val joinKeyNames: Set[String] =
      if (viewJoins.isEmpty) Set.empty
      else {
        if (!VersionedTable.latestVersion(spark, mvPath).contains(hv))
          return None
        var remaining = src.joins
        viewJoins.foreach { case (dimPath, keys, pinned) =>
          val canon = new org.apache.hadoop.fs.Path(dimPath).toUri.getPath
          val i = remaining.indexWhere(q =>
            q.dimPath == canon && q.pairs == keys.toSet && q.dimV == pinned)
          if (i < 0) return None
          remaining = remaining.patch(i, Nil, 1)
        }
        src.joins.flatMap(_.keyNames).toSet
      }
    def cols(k: String): Seq[String] = props.get(k).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val vSums = cols(MaterializedView.SumColsKey).toSet
    val vMinMax = cols(MaterializedView.MinMaxColsKey).toSet
    val vNn = vSums ++ vMinMax // every maintained value col has nn_<col>
    val neededSums = outs.collect {
      case s: SumOut => s.srcCol
      case a: AvgOut => a.srcCol }
    val neededMinMax = outs.collect {
      case m: MinOut => m.srcCol
      case m: MaxOut => m.srcCol }
    val neededNn = outs.collect {
      case c: CountColOut => c.srcCol
      case a: AvgOut => a.srcCol }
    // stored distinct tuples, matched as SETS (COUNT(DISTINCT a, b) ==
    // COUNT(DISTINCT b, a)); the canonical (stored) order names the view
    // column and the helper path
    val canonTuple: Map[Set[String], Seq[String]] =
      MaterializedView.distinctsIn(props).map(t => t.toSet -> t).toMap
    def canonOf(cs: Seq[String]): Option[Seq[String]] =
      canonTuple.get(cs.toSet).filter(_.size == cs.distinct.size)
    val vNdvSingle: Set[String] =
      canonTuple.values.filter(_.size == 1).map(_.head).toSet
    val neededNdv = outs.collect { case d: NdvOut =>
      canonOf(d.srcCols).getOrElse(return None) }
    val neededAvgD = outs.collect { case d: AvgDistinctOut => d.srcCol }
    val neededSumD = outs.collect { case d: SumDistinctOut => d.srcCol } ++
      neededAvgD
    if (!neededSums.forall(vSums) ||
        !neededMinMax.forall(vMinMax) || !neededNn.forall(vNn) ||
        !neededSumD.forall(vNdvSingle)) return None

    val viewPlan = VersionedTable.read(spark, mvPath, Some(hv))
      .queryExecution.analyzed
    val attr: Map[String, Attribute] = viewPlan.output.map(a => a.name -> a).toMap
    // group-key cover: every grouping slot (and group output) must match a
    // view group item — plain columns and derived keys compare by their
    // name-canonical expressions, exactly like predicates
    val items = groupItemsOf(props, attr).getOrElse {
      dbg(s"$mvPath: groupItemsOf failed"); return None }
    dbg(s"$mvPath: items=$items hv=$hv")
    def aliasFor(norm: Expression): Option[String] = items
      .find(_._2.canonicalized.semanticEquals(norm.canonicalized)).map(_._1)
    val groupAliases = traverse(groupKeys.map(aliasFor)).getOrElse {
      dbg(s"$mvPath: group keys unmatched"); return None }
    // COUNT(DISTINCT) has two shapes: EXACT grouping reads the stored
    // ndv_<col> (each output group is exactly one view row); a ROLLUP
    // (grouping subset, including global) answers from the HELPER table —
    // the materialized (group, value) dedup — as COUNT(DISTINCT value)
    // over its rows, LEFT-joined back onto the view rollup so groups with
    // no non-null values still emit 0. Each helper pins at the version
    // whose refresh watermark matches the queried source snapshot, exactly
    // like the view itself (time travel included).
    val exactGrouping = items.map(_._1).toSet == groupAliases.toSet
    // helper-answered tuples: SUM/AVG(DISTINCT) always (no stored
    // companion); COUNT(DISTINCT) only when the grouping rolls up past
    // the stored ndv
    val helperCols: Seq[Seq[String]] =
      (neededSumD.map(Seq(_)) ++
        (if (exactGrouping) Nil else neededNdv)).distinct
    val ndvHelpers: Map[Seq[String], LogicalPlan] =
      if (helperCols.isEmpty) Map.empty
      else {
        val built = helperCols.flatMap { t =>
          val hp = MaterializedView.distinctHelperPath(mvPath, t)
          versionFor(hp, src.srcV).flatMap { hv =>
            scala.util.Try(VersionedTable.read(spark, hp, Some(hv))
              .queryExecution.analyzed).toOption
          }.map(t -> _)
        }
        if (built.size != helperCols.size) {
          dbg(s"$mvPath: distinct helper(s) unavailable at v=${src.srcV}")
          return None
        }
        built.toMap
      }
    val outAliases: Map[ExprId, String] = traverse(outs.collect {
      case GroupOut(id, _, norm, _) => aliasFor(norm).map(id -> _)
    }).getOrElse(return None).toMap
    // residuals may only reference PLAIN group columns (a residual on a
    // derived key's BASE column cannot apply over the view)
    val plainGroup: Set[String] = (items.map(_._1).toSet --
      MaterializedView.groupExprsIn(props).keySet)

    // predicate cover: every view conjunct must appear among the query's;
    // what remains of the query's is the residual, applied over the view —
    // legal only on group columns (constant within a group)
    val vConds = viewConds(props).getOrElse(return None)
    var residual = queryConds
    vConds.foreach { vc =>
      val i = residual.indexWhere(_.canonicalized.semanticEquals(vc.canonicalized))
      if (i < 0) return None // the view filters rows this query wants
      residual = residual.patch(i, Nil, 1)
    }
    // optimizer-inferred IsNotNull conjuncts that a matched NULL-INTOLERANT
    // view conjunct already guarantees (a null there made the predicate
    // NULL, so the row never reached the view) are satisfied by every view
    // row — drop them rather than decline
    def nullRejecting(e: Expression): Boolean = e match {
      case _: AttributeReference | _: Literal => true
      case x => x.nullIntolerant && x.children.forall(nullRejecting)
    }
    val nullRejected: Set[String] = vConds.filter(nullRejecting)
      .flatMap(_.collect { case a: AttributeReference => a.name }).toSet
    residual = residual.filterNot {
      // join-key IsNotNull conjuncts (inferred from the equi-join) hold on
      // every view row — an inner equi-join never admits a null key
      case IsNotNull(a: AttributeReference) =>
        nullRejected(a.name) || joinKeyNames(a.name)
      case _ => false
    }
    val residualCols = residual.flatMap(_.collect {
      case a: AttributeReference => a.name })
    if (!residualCols.forall(plainGroup)) return None

    def longAttr(n: String): Option[Attribute] =
      attr.get(n).filter(_.dataType == LongType)
    val cnt = longAttr(MaterializedView.CountCol).getOrElse(return None)
    // every referenced column must exist on the view with the exact type
    // the original output promised — else decline, never coerce
    val ok = outs.forall {
      case GroupOut(id, _, _, dt) =>
        outAliases.get(id).flatMap(attr.get).exists(_.dataType == dt)
      case SumOut(_, _, c, dt) =>
        // the view's stored sum column has the SAME Sum result type the
        // query's aggregate promises (both sum the same source column)
        attr.get(MaterializedView.sumColName(c)).exists(_.dataType == dt)
      case CountColOut(_, _, c) =>
        longAttr(MaterializedView.nnColName(c)).isDefined
      case MinOut(_, _, c, dt) =>
        attr.get(MaterializedView.minColName(c)).exists(_.dataType == dt)
      case MaxOut(_, _, c, dt) =>
        attr.get(MaterializedView.maxColName(c)).exists(_.dataType == dt)
      case AvgOut(_, _, c, srcDt, _) =>
        attr.get(MaterializedView.sumColName(c))
          .exists(_.dataType == expectedSumType(srcDt)) &&
          longAttr(MaterializedView.nnColName(c)).isDefined
      case NdvOut(_, _, cs) =>
        canonOf(cs).exists(t =>
          longAttr(MaterializedView.ndvColName(t)).isDefined)
      // helper-answered: types derive from the same source column (the
      // helper's value col IS the source col); presence checked above
      case _: SumDistinctOut => true
      case _: AvgDistinctOut => true
      case _: CountOut => true
    } && groupAliases.forall(attr.contains) &&
      residualCols.forall(n => attr.contains(n))
    if (!ok) return None

    // rebuild the residual against the view's attributes (same names, same
    // types by the groupBy pass-through — checked, never coerced)
    if (!residual.forall(_.collect { case a: AttributeReference => a }
        .forall(a => attr.get(a.name).exists(_.dataType == a.dataType))))
      return None
    val residualOnView = residual.map(_.transform {
      case a: AttributeReference => attr(a.name)
    })
    val scan: LogicalPlan =
      if (residualOnView.isEmpty) viewPlan
      else Filter(residualOnView.reduce(And), viewPlan)

    def reSum(a: Attribute): Expression = new Sum(a).toAggregateExpression()
    val globalAgg = groupKeys.isEmpty
    def toViewAgg(out: Out): NamedExpression = (out: Out) match {
      case GroupOut(id, n, _, _) => Alias(attr(outAliases(id)), n)(exprId = id)
      case CountOut(id, n) =>
        // a GLOBAL count over an empty (or fully-filtered) table is 0, but
        // SUM over the empty view would be NULL — coalesce restores
        // COUNT's totality
        val e = if (globalAgg) Coalesce(Seq(reSum(cnt), Literal(0L)))
                else reSum(cnt)
        Alias(e, n)(exprId = id)
      case SumOut(id, n, c, dt) =>
        // decimal re-sums widen by 10 digits — cast back to the original
        // SUM type (NULL/throw on overflow exactly as the source SUM's
        // CheckOverflowInSum would); long re-sums are already exact
        val re = reSum(attr(MaterializedView.sumColName(c)))
        val e = if (re.dataType == dt) re else Cast(re, dt)
        Alias(e, n)(exprId = id)
      case CountColOut(id, n, c) =>
        // COUNT(col) totality, like COUNT(*): 0 on empty, never NULL
        val re = reSum(attr(MaterializedView.nnColName(c)))
        val e = if (globalAgg) Coalesce(Seq(re, Literal(0L))) else re
        Alias(e, n)(exprId = id)
      case MinOut(id, n, c, _) =>
        Alias(Min(attr(MaterializedView.minColName(c))).toAggregateExpression(),
          n)(exprId = id)
      case MaxOut(id, n, c, _) =>
        Alias(Max(attr(MaterializedView.maxColName(c))).toAggregateExpression(),
          n)(exprId = id)
      case NdvOut(id, n, cs) =>
        // EXACT grouping only (rollups route through the helper join
        // below): every output group is exactly one view row, so any
        // pick-one re-aggregate reads the stored value
        Alias(Max(attr(MaterializedView.ndvColName(canonOf(cs).get)))
          .toAggregateExpression(), n)(exprId = id)
      case o: SumDistinctOut =>
        // never a view slot — the helper-join path below owns it
        throw new IllegalStateException(
          s"SUM(DISTINCT ${o.srcCol}) reached the view-slot builder")
      case o: AvgDistinctOut =>
        throw new IllegalStateException(
          s"AVG(DISTINCT ${o.srcCol}) reached the view-slot builder")
      case AvgOut(id, n, c, srcDt, dt) =>
        // the recombination tree Average.evaluateExpression itself builds,
        // over the view's exact SUM + non-null-COUNT components (the divide
        // is LEGACY there in every eval mode — count 0 yields SQL NULL)
        val re = reSum(attr(MaterializedView.sumColName(c)))
        val cnt = reSum(attr(MaterializedView.nnColName(c)))
        val e = srcDt match {
          case _: DecimalType =>
            val sumDT = expectedSumType(srcDt)
            val total = if (re.dataType == sumDT) re else Cast(re, sumDT)
            Cast(Divide(total, Cast(cnt, DecimalType(20, 0)),
              EvalMode.LEGACY), dt)
          case _ =>
            Divide(Cast(re, DoubleType), Cast(cnt, DoubleType),
              EvalMode.LEGACY)
        }
        Alias(e, n)(exprId = id)
    }
    if (ndvHelpers.isEmpty)
      return Some(Aggregate(groupAliases.map(attr(_)),
        outs.map(toViewAgg), scan))

    // ROLLUP COUNT(DISTINCT): base view rollup (ndv slots excluded, hidden
    // copies of the subset keys appended for the join — the query need not
    // have selected them), one COUNT(DISTINCT value) aggregate per helper,
    // LEFT-joined on the subset keys, final Project restoring the original
    // slot order with absent groups' counts coalesced to 0
    val hiddenKeys: Seq[NamedExpression] =
      groupAliases.distinct.map(al => Alias(attr(al), s"__graft_k_$al")())
    val baseAggs = outs.filterNot {
      case _: NdvOut => !exactGrouping // exact grouping reads the view ndv
      case _: SumDistinctOut => true // never stored — always the helper
      case _: AvgDistinctOut => true
      case _ => false
    }.map(toViewAgg) ++ hiddenKeys
    val keyAttrOf: Map[String, Attribute] =
      groupAliases.distinct.zip(hiddenKeys.map(_.toAttribute)).toMap
    // AVG(DISTINCT) reads BOTH channels from the helper at every grouping
    // (its per-group count-distinct over helper rows equals the stored ndv
    // at exact grouping, so one source serves both shapes)
    val needD: Set[Seq[String]] =
      (if (exactGrouping) Set.empty[Seq[String]] else neededNdv.toSet) ++
        neededAvgD.map(Seq(_))
    val needSd: Set[String] = neededSumD.toSet
    var dAttrOf = Map.empty[Seq[String], Attribute]
    var sdAttrOf = Map.empty[String, Attribute]
    var joined: LogicalPlan =
      if (baseAggs.nonEmpty) Aggregate(groupAliases.map(attr(_)), baseAggs, scan)
      else null // global all-distinct query: anchor on the first helper
    helperCols.foreach { t =>
      val hPlan = ndvHelpers(t)
      val hAttr: Map[String, Attribute] = hPlan.output.map(a => a.name -> a).toMap
      // residuals re-apply on the helper: they reference plain group
      // columns, which the helper stores under the same names and types —
      // without them a filtered-out group's values would leak into the
      // rollup's distinct set
      val resOk = residual.forall(_.collect { case a: AttributeReference => a }
        .forall(a => hAttr.get(a.name).exists(_.dataType == a.dataType)))
      val keysOk = groupAliases.forall(hAttr.contains) &&
        t.forall(hAttr.contains)
      if (!resOk || !keysOk) return None
      val hScan: LogicalPlan =
        if (residual.isEmpty) hPlan
        else Filter(residual.map(_.transform {
          case a: AttributeReference => hAttr(a.name)
        }).reduce(And), hPlan)
      val hKeys = groupAliases.distinct.map(hAttr(_))
      val nm = t.mkString("_")
      val dAlias =
        if (!needD(t)) None
        else Some(Alias(Count(t.map(hAttr(_)))
          .toAggregateExpression(isDistinct = true), s"__graft_d_$nm")())
      // DISTINCT dedups values shared across rolled-up groups; within one
      // stored group the helper already has each value once (single-col
      // tuples only — SUM/AVG(DISTINCT) have no multi-column form)
      val sdAlias =
        if (t.size != 1 || !needSd(t.head)) None
        else Some(Alias(new Sum(hAttr(t.head))
          .toAggregateExpression(isDistinct = true), s"__graft_sd_$nm")())
      val hAgg = Aggregate(hKeys, hKeys ++ dAlias.toSeq ++ sdAlias.toSeq, hScan)
      dAlias.foreach(a => dAttrOf += t -> a.toAttribute)
      sdAlias.foreach(a => sdAttrOf += t.head -> a.toAttribute)
      joined =
        if (joined == null) hAgg
        else {
          val cond = groupAliases.distinct
            .map(al => EqualTo(keyAttrOf(al), hAttr(al)))
            .reduceOption[Expression](And)
          Join(joined, hAgg, LeftOuter, cond, JoinHint.NONE)
        }
    }
    // reference helper slots through the JOIN's output: a helper Count is
    // non-nullable on its own aggregate, but crossing a LeftOuter makes it
    // nullable — keeping the pre-join attribute would let NullPropagation
    // truncate Coalesce(d, 0) after its "never-null" first child and turn
    // an all-missing group's 0 into NULL (the anchor helper, never joined,
    // correctly keeps its own non-nullable attribute)
    val liveOut = joined.output.map(a => a.exprId -> a).toMap
    def live(a: Attribute): Attribute = liveOut.getOrElse(a.exprId, a)
    val finalProj: Seq[NamedExpression] = outs.map {
      case NdvOut(id, n, cs) if !exactGrouping =>
        // anchored on the first helper (no base): its own count is never
        // absent; joined helpers coalesce for groups they never saw
        Alias(Coalesce(Seq(live(dAttrOf(canonOf(cs).get)), Literal(0L))),
          n)(exprId = id)
      case SumDistinctOut(id, n, c, dt) =>
        // SQL SUM totality: NULL on empty/all-null groups — exactly what
        // the missing-join-row null already is
        val sd = live(sdAttrOf(c))
        val e: Expression = if (sd.dataType == dt) sd else Cast(sd, dt)
        Alias(e, n)(exprId = id)
      case AvgDistinctOut(id, n, c, srcDt, dt) =>
        // Average's own recombination over the helper's exact components
        // (missing join row → nulls → SQL NULL average, as unrewritten)
        val sd: Expression = live(sdAttrOf(c))
        val d: Expression = live(dAttrOf(Seq(c)))
        val e = srcDt match {
          case sdt: DecimalType =>
            val sumDT = expectedSumType(sdt)
            val total = if (sd.dataType == sumDT) sd else Cast(sd, sumDT)
            Cast(Divide(total, Cast(d, DecimalType(20, 0)),
              EvalMode.LEGACY), dt)
          case _ =>
            Divide(Cast(sd, DoubleType), Cast(d, DoubleType),
              EvalMode.LEGACY)
        }
        Alias(e, n)(exprId = id)
      case o =>
        // base slots pass through the join under their original ids
        joined.output.find(_.exprId == idOf(o)).getOrElse(return None)
    }
    Some(Project(finalProj, joined))
  }

  private def idOf(o: Out): ExprId = o match {
    case GroupOut(id, _, _, _) => id
    case CountOut(id, _) => id
    case CountColOut(id, _, _) => id
    case SumOut(id, _, _, _) => id
    case MinOut(id, _, _, _) => id
    case MaxOut(id, _, _, _) => id
    case AvgOut(id, _, _, _, _) => id
    case NdvOut(id, _, _) => id
    case SumDistinctOut(id, _, _, _) => id
    case AvgDistinctOut(id, _, _, _, _) => id
  }

  /** The type `SUM(col)` carries for a source column type — what the
    * view's stored sum companion has (both sum the same column). */
  private def expectedSumType(srcDt: DataType): DataType = srcDt match {
    case d: DecimalType => DecimalType(math.min(d.precision + 10, 38), d.scale)
    case _ => LongType
  }

  /** Output-slot shapes of a grouping-sets aggregate: a pass-through of
    * an Expand position (group key or the grouping id), an expression of
    * the grouping id alone (grouping()/grouping_id() spellings), or a
    * standard re-aggregatable slot. */
  private sealed trait SOut
  private case class PosOut2(id: ExprId, name: String, pos: Int) extends SOut
  private case class GidFnOut(id: ExprId, name: String,
    e: Expression) extends SOut
  private case class AggOut2(o: Out) extends SOut

  // --------------------------------------------------------------------
  // GROUPING SETS (ROLLUP / CUBE) through the view: the Expand-based
  // aggregate rewrites to the SAME shape over the view — partial
  // aggregates pass through the Expand unchanged (each grouping set
  // re-aggregates replicated view rows exactly like a plain rollup of
  // the view's grouping), group positions project the view's group
  // column or NULL per set, and the grouping id rides as the literal it
  // already is. The exact-distinct family (COUNT/SUM/AVG(DISTINCT))
  // answers from the (group, value) HELPER through a MIRRORED Expand:
  // the helper's rows replicate per set under the same null patterns,
  // re-aggregate per (set keys, gid) — values shared across rolled-up
  // groups dedup exactly as the flat rollup path proves — and LEFT-join
  // back onto the base set rewrite on NULL-SAFE key equality (subtotal
  // rows carry NULLed-out keys BY DESIGN, and genuine NULL group values
  // must keep matching their helper groups; plain EqualTo would silently
  // zero every subtotal). BI subtotal dashboards over a 100 TB fact
  // answer from the view's few rows, grand total included.
  // --------------------------------------------------------------------

  private def rewriteSets(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      ex: org.apache.spark.sql.catalyst.plans.logical.Expand,
      child: LogicalPlan): Option[LogicalPlan] = {
    val expOut = ex.output
    val projections = ex.projections
    val n = expOut.size
    if (projections.isEmpty || projections.exists(_.size != n)) return None
    val src = sourceOf(child).getOrElse(return None)
    val gidIdx = expOut.indexWhere(_.name == "spark_grouping_id")
    if (gidIdx < 0) return None
    val gidVals: Seq[Literal] = projections.map(_(gidIdx) match {
      case l: Literal => l
      case _ => return None
    })
    // per-position shape: UNIFORM value positions extend the environment
    // (same child expression in every set — the pass-through channel agg
    // functions read); GROUP positions vary between a fixed expression
    // and NULL; anything else declines
    val uniformEnv = scala.collection.mutable.Map.empty[ExprId, Expression]
    val groupNorm = scala.collection.mutable.Map.empty[Int, Expression]
    val nullAt: Int => Seq[Boolean] = i => projections.map(_(i) match {
      case Literal(null, _) => true
      case _ => false
    })
    (0 until n).foreach { i =>
      if (i != gidIdx) {
        val col = projections.map(_(i))
        val nonNull = col.filterNot {
          case Literal(null, _) => true
          case _ => false
        }
        if (nonNull.isEmpty) {
          // all-null position: only sound as a group key that is NULL in
          // every set — unusual; decline rather than reason about it
          if (expOut(i).references.nonEmpty) return None
        } else if (!nonNull.forall(_.semanticEquals(nonNull.head))) {
          return None // two different expressions share a position
        } else named(nonNull.head, src.env) match {
          case Some(norm) =>
            if (nonNull.size == col.size) uniformEnv += expOut(i).exprId -> norm
            groupNorm += i -> norm // uniform positions may still group
          case None => return None
        }
      }
    }
    // the aggregate's grouping expressions: expOut attributes only, gid
    // included (the grouping-sets shape)
    val gKeys: Seq[Int] = groupExprs.map {
      case a: AttributeReference =>
        val i = expOut.indexWhere(_.exprId == a.exprId)
        if (i < 0) return None
        i
      case _ => return None
    }
    if (!gKeys.contains(gidIdx)) return None
    val groupPos: Seq[Int] = gKeys.filterNot(_ == gidIdx).distinct
    if (groupPos.exists(!groupNorm.contains(_))) return None
    // output slots: group positions and gid pass through; expressions of
    // the gid alone (grouping()/grouping_id() spellings) rebuild against
    // the new gid attribute; everything else classifies as a standard
    // re-aggregatable slot — the distinct family declines
    val env = src.env ++ uniformEnv
    val souts: Seq[SOut] = aggExprs.map {
      case a: AttributeReference =>
        val i = expOut.indexWhere(_.exprId == a.exprId)
        if (i < 0) return None
        PosOut2(a.exprId, a.name, i)
      case al @ Alias(a: AttributeReference, nm)
          if expOut.exists(_.exprId == a.exprId) =>
        PosOut2(al.exprId, nm, expOut.indexWhere(_.exprId == a.exprId))
      case al @ Alias(e, nm)
          if e.deterministic && e.references.nonEmpty &&
            e.references.forall(_.exprId == expOut(gidIdx).exprId) &&
            !e.exists(_.isInstanceOf[AggregateExpression]) =>
        GidFnOut(al.exprId, nm, e)
      case other =>
        classify(other, env).map(AggOut2(_)).getOrElse(return None)
    }
    souts.foreach {
      case PosOut2(_, _, p) if p != gidIdx && !groupNorm.contains(p) =>
        return None
      case _ => ()
    }
    val outs = souts.collect { case AggOut2(o) => o }
    src.views.iterator.flatMap(trySetView(_, src, groupPos.map(groupNorm),
      groupPos, gidVals, nullAt, souts, outs, gKeys, gidIdx, expOut))
      .nextOption()
  }

  /** The per-view half of the grouping-sets rewrite: freshness, join
    * agreement, group/predicate cover, then the Aggregate-over-Expand
    * build against the view scan. */
  private def trySetView(mvPath: String, src: SrcInfo,
      groupNorms: Seq[Expression], groupPos: Seq[Int], gidVals: Seq[Literal],
      nullAt: Int => Seq[Boolean], souts: Seq[SOut], outs: Seq[Out],
      gKeys: Seq[Int], gidIdx: Int,
      expOut: Seq[Attribute]): Option[LogicalPlan] = {
    val queryConds = src.conds
    val hv = versionFor(mvPath, src.srcV).getOrElse(return None)
    val props = VersionedTable.propertiesOf(spark, mvPath)
    val viewJoins = MaterializedView.joinsIn(props)
    if (viewJoins.size != src.joins.size) return None
    if (viewJoins.nonEmpty) {
      if (!VersionedTable.latestVersion(spark, mvPath).contains(hv))
        return None
      var remaining = src.joins
      viewJoins.foreach { case (dimPath, keys, pinned) =>
        val canon = new org.apache.hadoop.fs.Path(dimPath).toUri.getPath
        val i = remaining.indexWhere(q =>
          q.dimPath == canon && q.pairs == keys.toSet && q.dimV == pinned)
        if (i < 0) return None
        remaining = remaining.patch(i, Nil, 1)
      }
    }
    val joinKeyNames: Set[String] = src.joins.flatMap(_.keyNames).toSet
    def cols(k: String): Seq[String] = props.get(k).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val vSums = cols(MaterializedView.SumColsKey).toSet
    val vMinMax = cols(MaterializedView.MinMaxColsKey).toSet
    val vNn = vSums ++ vMinMax
    val neededSums = outs.collect {
      case s: SumOut => s.srcCol
      case a: AvgOut => a.srcCol }
    val neededMinMax = outs.collect {
      case m: MinOut => m.srcCol
      case m: MaxOut => m.srcCol }
    val neededNn = outs.collect {
      case c: CountColOut => c.srcCol
      case a: AvgOut => a.srcCol }
    if (!neededSums.forall(vSums) || !neededMinMax.forall(vMinMax) ||
        !neededNn.forall(vNn)) return None
    // the exact-distinct family: EVERY set may roll past the stored ndv
    // (the gid-keyed output is never one-view-row-per-group), so all
    // three shapes answer from the (group, value) helpers, mirrored
    // through their own Expand below
    val canonTuple: Map[Set[String], Seq[String]] =
      MaterializedView.distinctsIn(props).map(t => t.toSet -> t).toMap
    def canonOf(cs: Seq[String]): Option[Seq[String]] =
      canonTuple.get(cs.toSet).filter(_.size == cs.distinct.size)
    val vNdvSingle: Set[String] =
      canonTuple.values.filter(_.size == 1).map(_.head).toSet
    val neededNdv = outs.collect { case d: NdvOut =>
      canonOf(d.srcCols).getOrElse(return None) }
    val neededAvgD = outs.collect { case d: AvgDistinctOut => d.srcCol }
    val neededSumD = outs.collect { case d: SumDistinctOut => d.srcCol } ++
      neededAvgD
    if (!neededSumD.forall(vNdvSingle)) return None
    val helperCols: Seq[Seq[String]] =
      (neededSumD.map(Seq(_)) ++ neededNdv).distinct
    val ndvHelpers: Map[Seq[String], LogicalPlan] =
      if (helperCols.isEmpty) Map.empty
      else {
        val built = helperCols.flatMap { t =>
          val hp = MaterializedView.distinctHelperPath(mvPath, t)
          versionFor(hp, src.srcV).flatMap { hhv =>
            scala.util.Try(VersionedTable.read(spark, hp, Some(hhv))
              .queryExecution.analyzed).toOption
          }.map(t -> _)
        }
        if (built.size != helperCols.size) return None
        built.toMap
      }
    val viewPlan = VersionedTable.read(spark, mvPath, Some(hv))
      .queryExecution.analyzed
    val attr: Map[String, Attribute] = viewPlan.output.map(a => a.name -> a).toMap
    val items = groupItemsOf(props, attr).getOrElse(return None)
    def aliasFor(norm: Expression): Option[String] = items
      .find(_._2.canonicalized.semanticEquals(norm.canonicalized)).map(_._1)
    val groupAliases = traverse(groupNorms.map(aliasFor)).getOrElse(return None)
    val plainGroup: Set[String] = (items.map(_._1).toSet --
      MaterializedView.groupExprsIn(props).keySet)
    // predicate cover + residual — identical discipline to the flat path
    val vConds = viewConds(props).getOrElse(return None)
    var residual = queryConds
    vConds.foreach { vc =>
      val i = residual.indexWhere(_.canonicalized.semanticEquals(vc.canonicalized))
      if (i < 0) return None
      residual = residual.patch(i, Nil, 1)
    }
    def nullRejecting(e: Expression): Boolean = e match {
      case _: AttributeReference | _: Literal => true
      case x => x.nullIntolerant && x.children.forall(nullRejecting)
    }
    val nullRejected: Set[String] = vConds.filter(nullRejecting)
      .flatMap(_.collect { case a: AttributeReference => a.name }).toSet
    residual = residual.filterNot {
      case IsNotNull(a: AttributeReference) =>
        nullRejected(a.name) || joinKeyNames(a.name)
      case _ => false
    }
    val residualCols = residual.flatMap(_.collect {
      case a: AttributeReference => a.name })
    if (!residualCols.forall(plainGroup)) return None
    def longAttr(nm: String): Option[Attribute] =
      attr.get(nm).filter(_.dataType == LongType)
    val cnt = longAttr(MaterializedView.CountCol).getOrElse(return None)
    // type checks: group positions must carry exactly the view column's
    // type; aggregate slots check like the flat path
    val posAlias: Map[Int, String] = groupPos.zip(groupAliases).toMap
    if (!groupPos.forall(p => attr.get(posAlias(p))
        .exists(_.dataType == expOut(p).dataType))) return None
    val ok = outs.forall {
      case SumOut(_, _, c, dt) =>
        attr.get(MaterializedView.sumColName(c)).exists(_.dataType == dt)
      case CountColOut(_, _, c) =>
        longAttr(MaterializedView.nnColName(c)).isDefined
      case MinOut(_, _, c, dt) =>
        attr.get(MaterializedView.minColName(c)).exists(_.dataType == dt)
      case MaxOut(_, _, c, dt) =>
        attr.get(MaterializedView.maxColName(c)).exists(_.dataType == dt)
      case AvgOut(_, _, c, srcDt, _) =>
        attr.get(MaterializedView.sumColName(c))
          .exists(_.dataType == expectedSumType(srcDt)) &&
          longAttr(MaterializedView.nnColName(c)).isDefined
      case _: CountOut => true
      // helper-answered: types derive from the source column (the
      // helper's value col IS it); presence checked above
      case _: NdvOut | _: SumDistinctOut | _: AvgDistinctOut => true
      case _: GroupOut => return None // group slots arrive as PosOut here
    }
    if (!ok) return None
    if (!residual.forall(_.collect { case a: AttributeReference => a }
        .forall(a => attr.get(a.name).exists(_.dataType == a.dataType))))
      return None
    val residualOnView = residual.map(_.transform {
      case a: AttributeReference => attr(a.name)
    })
    val scan: LogicalPlan =
      if (residualOnView.isEmpty) viewPlan
      else Filter(residualOnView.reduce(And), viewPlan)
    // the new Expand mirrors the original: view columns pass through
    // under their own ids, each group position projects the view group
    // column or NULL per set, the gid literal rides verbatim
    val varyAttr: Map[Int, Attribute] = groupPos.map { p =>
      p -> AttributeReference(posAlias(p), expOut(p).dataType,
        nullable = true)()
    }.toMap
    val gidAttr = AttributeReference(expOut(gidIdx).name,
      expOut(gidIdx).dataType, nullable = false)()
    val nullPatterns: Map[Int, Seq[Boolean]] =
      groupPos.map(p => p -> nullAt(p)).toMap
    val newProjections: Seq[Seq[Expression]] = gidVals.zipWithIndex.map {
      case (gl, pi) =>
        scan.output.map(a => a: Expression) ++
          groupPos.map { p =>
            if (nullPatterns(p)(pi))
              Literal(null, expOut(p).dataType): Expression
            else attr(posAlias(p))
          } :+ (gl: Expression)
    }
    val newExpand = org.apache.spark.sql.catalyst.plans.logical.Expand(
      newProjections,
      scan.output ++ groupPos.map(varyAttr) :+ gidAttr, scan)
    def reSum(a: Attribute): Expression = new Sum(a).toAggregateExpression()
    def toAgg(o: Out): NamedExpression = o match {
      case CountOut(id, nm) => Alias(reSum(cnt), nm)(exprId = id)
      case SumOut(id, nm, c, dt) =>
        val re = reSum(attr(MaterializedView.sumColName(c)))
        Alias(if (re.dataType == dt) re else Cast(re, dt), nm)(exprId = id)
      case CountColOut(id, nm, c) =>
        Alias(reSum(attr(MaterializedView.nnColName(c))), nm)(exprId = id)
      case MinOut(id, nm, c, _) =>
        Alias(Min(attr(MaterializedView.minColName(c)))
          .toAggregateExpression(), nm)(exprId = id)
      case MaxOut(id, nm, c, _) =>
        Alias(Max(attr(MaterializedView.maxColName(c)))
          .toAggregateExpression(), nm)(exprId = id)
      case AvgOut(id, nm, c, srcDt, dt) =>
        val re = reSum(attr(MaterializedView.sumColName(c)))
        val nnc = reSum(attr(MaterializedView.nnColName(c)))
        val e = srcDt match {
          case _: DecimalType =>
            val sumDT = expectedSumType(srcDt)
            val total = if (re.dataType == sumDT) re else Cast(re, sumDT)
            Cast(Divide(total, Cast(nnc, DecimalType(20, 0)),
              EvalMode.LEGACY), dt)
          case _ =>
            Divide(Cast(re, DoubleType), Cast(nnc, DoubleType),
              EvalMode.LEGACY)
        }
        Alias(e, nm)(exprId = id)
      case _ => throw new IllegalStateException("unreachable set slot")
    }
    def isDistinctOut(o: Out): Boolean = o match {
      case _: NdvOut | _: SumDistinctOut | _: AvgDistinctOut => true
      case _ => false
    }
    val newAggExprs: Seq[NamedExpression] = souts.collect {
      case PosOut2(id, nm, p) =>
        if (p == gidIdx) Alias(gidAttr, nm)(exprId = id)
        else Alias(varyAttr(p), nm)(exprId = id)
      case GidFnOut(id, nm, e) =>
        Alias(e.transform {
          case a: AttributeReference if a.exprId == expOut(gidIdx).exprId =>
            gidAttr
        }, nm)(exprId = id)
      case AggOut2(o) if !isDistinctOut(o) => toAgg(o)
    }
    val newGroups: Seq[Expression] = gKeys.map(p =>
      if (p == gidIdx) gidAttr else varyAttr(p))
    if (helperCols.isEmpty)
      return Some(Aggregate(newGroups, newAggExprs, newExpand))

    // per-set distinct aggregates from the helpers: the BASE set rewrite
    // grows hidden copies of its (set keys, gid) for the join; each
    // helper mirrors the SAME Expand (same null patterns, same gid
    // literals) over its own rows, re-aggregates per (set keys, gid) —
    // within a stored group the helper has each value once, and the
    // DISTINCT dedups values shared across rolled-up groups — and
    // LEFT-joins back. Keys compare NULL-SAFELY: a subtotal row's
    // NULLed-out key must match the helper's equally-NULLed one, and a
    // genuine NULL group value must keep matching its helper group.
    val hiddenKeys: Seq[NamedExpression] =
      groupPos.map(p => Alias(varyAttr(p), s"__graft_k_$p")()) :+
        Alias(gidAttr, "__graft_gid")()
    var joined: LogicalPlan =
      Aggregate(newGroups, newAggExprs ++ hiddenKeys, newExpand)
    val keyAttrOfPos: Map[Int, Attribute] =
      groupPos.zip(hiddenKeys.init.map(_.toAttribute)).toMap
    val gidKeyAttr: Attribute = hiddenKeys.last.toAttribute
    val needD: Set[Seq[String]] =
      neededNdv.toSet ++ neededAvgD.map(Seq(_))
    val needSd: Set[String] = neededSumD.toSet
    var dAttrOf = Map.empty[Seq[String], Attribute]
    var sdAttrOf = Map.empty[String, Attribute]
    helperCols.foreach { t =>
      val hPlan = ndvHelpers(t)
      val hAttr: Map[String, Attribute] =
        hPlan.output.map(a => a.name -> a).toMap
      // residuals re-apply on the helper (plain group columns, same
      // names/types) — without them a filtered-out group's values would
      // leak into the subtotals; set keys must exist with the exact type
      val resOk = residual.forall(_.collect { case a: AttributeReference => a }
        .forall(a => hAttr.get(a.name).exists(_.dataType == a.dataType)))
      val keysOk = groupPos.forall(p => hAttr.get(posAlias(p))
        .exists(_.dataType == expOut(p).dataType)) && t.forall(hAttr.contains)
      if (!resOk || !keysOk) return None
      val hScan: LogicalPlan =
        if (residual.isEmpty) hPlan
        else Filter(residual.map(_.transform {
          case a: AttributeReference => hAttr(a.name)
        }).reduce(And), hPlan)
      val hVary: Map[Int, Attribute] = groupPos.map(p =>
        p -> AttributeReference(posAlias(p), expOut(p).dataType,
          nullable = true)()).toMap
      val hGid = AttributeReference(expOut(gidIdx).name,
        expOut(gidIdx).dataType, nullable = false)()
      val hProjections: Seq[Seq[Expression]] = gidVals.zipWithIndex.map {
        case (gl, pi) =>
          hScan.output.map(a => a: Expression) ++
            groupPos.map { p =>
              if (nullPatterns(p)(pi))
                Literal(null, expOut(p).dataType): Expression
              else hAttr(posAlias(p))
            } :+ (gl: Expression)
      }
      val hExpand = org.apache.spark.sql.catalyst.plans.logical.Expand(
        hProjections, hScan.output ++ groupPos.map(hVary) :+ hGid, hScan)
      val hKeys: Seq[Attribute] = groupPos.map(hVary) :+ hGid
      val nm = t.mkString("_")
      val dAlias =
        if (!needD(t)) None
        else Some(Alias(Count(t.map(hAttr(_)))
          .toAggregateExpression(isDistinct = true), s"__graft_d_$nm")())
      val sdAlias =
        if (t.size != 1 || !needSd(t.head)) None
        else Some(Alias(new Sum(hAttr(t.head))
          .toAggregateExpression(isDistinct = true), s"__graft_sd_$nm")())
      val hAgg = Aggregate(hKeys,
        (hKeys: Seq[NamedExpression]) ++ dAlias.toSeq ++ sdAlias.toSeq,
        hExpand)
      dAlias.foreach(a => dAttrOf += t -> a.toAttribute)
      sdAlias.foreach(a => sdAttrOf += t.head -> a.toAttribute)
      val cond = (groupPos.map(p =>
        EqualNullSafe(keyAttrOfPos(p), hVary(p)): Expression) :+
        (EqualTo(gidKeyAttr, hGid): Expression)).reduce(And)
      joined = Join(joined, hAgg, LeftOuter, Some(cond), JoinHint.NONE)
    }
    // post-LeftOuter nullability (see the flat path's note): every helper
    // here crosses a join — resolve its slots from joined.output so
    // Coalesce(d, 0) keeps its 0 fallback under NullPropagation
    val liveOut = joined.output.map(a => a.exprId -> a).toMap
    def live(a: Attribute): Attribute = liveOut.getOrElse(a.exprId, a)
    val finalProj: Seq[NamedExpression] = souts.map {
      case AggOut2(NdvOut(id, n, cs)) =>
        // a base group the helper never saw has no non-null values: 0
        Alias(Coalesce(Seq(live(dAttrOf(canonOf(cs).get)), Literal(0L))),
          n)(exprId = id)
      case AggOut2(SumDistinctOut(id, n, c, dt)) =>
        // SQL SUM totality: the missing-join-row null IS the answer
        val sd = live(sdAttrOf(c))
        val e: Expression = if (sd.dataType == dt) sd else Cast(sd, dt)
        Alias(e, n)(exprId = id)
      case AggOut2(AvgDistinctOut(id, n, c, srcDt, dt)) =>
        val sd: Expression = live(sdAttrOf(c))
        val d: Expression = live(dAttrOf(Seq(c)))
        val e = srcDt match {
          case sdt: DecimalType =>
            val sumDT = expectedSumType(sdt)
            val total = if (sd.dataType == sumDT) sd else Cast(sd, sumDT)
            Cast(Divide(total, Cast(d, DecimalType(20, 0)),
              EvalMode.LEGACY), dt)
          case _ =>
            Divide(Cast(sd, DoubleType), Cast(d, DoubleType),
              EvalMode.LEGACY)
        }
        Alias(e, n)(exprId = id)
      case s =>
        val id = s match {
          case PosOut2(i, _, _) => i
          case GidFnOut(i, _, _) => i
          case AggOut2(o) => idOf(o)
        }
        joined.output.find(_.exprId == id).getOrElse(return None)
    }
    Some(Project(finalProj, joined))
  }
}
