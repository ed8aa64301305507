package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim

import graft.sources.ForeignKeys

/** PK/FK join elimination from validated, pin-anchored declarations
  * ([[graft.sources.ForeignKeys]]) — the RELY-constraint optimizer lever,
  * with the integrity claim actually checked:
  *
  * {{{ SELECT f.grp, COUNT(*), SUM(f.v)
  *     FROM fact f JOIN dim d ON f.fk = d.pk GROUP BY f.grp }}}
  *
  * reads no dim column, and the declaration proved (at exactly these two
  * snapshots) that the dim key is unique and every fact key is non-null
  * and matched — so `fact ⋈ dim` restricted to fact columns IS the fact,
  * and the dim scan plus the join (a shuffle, or at best a broadcast of
  * the dim) drop from the plan entirely. At 100 TB the fact side of that
  * join is the dominant cost a BI layer pays for star-schema hygiene.
  *
  * Fires only when ALL of:
  *  - the node above the join (Project or Aggregate, optionally with a
  *    Filter in between) references ONLY the fact side's output;
  *  - the join is INNER, its condition is PURE key equalities, and the
  *    (fact column, dim column) name pairs equal a declared key set
  *    exactly;
  *  - the dim side is attribute-only projections over a graft snapshot —
  *    no dim-side filter (a filtered dim changes which fact rows survive)
  *    and no renames;
  *  - both relations sit at EXACTLY the declaration's validated pins —
  *    any commit on either table disarms silently (re-declare to re-pin).
  *
  * The fact side substitutes unchanged (join output preserves child
  * attribute identity, so upstream references keep binding). Fact-side
  * filters are fine — they only shrink the fact rows, and every surviving
  * row still matched exactly once.
  *
  * LEFT joins eliminate on a weaker license: a declared UNIQUE pin on the
  * RIGHT side ([[ForeignKeys.declareUnique]]) whose columns are all bound
  * by the join condition — unmatched left rows survive a left join
  * anyway, so no referential check is needed, the LEFT side can be any
  * plan, and right-side filters are harmless (a lost match is an unread
  * null). Disable with `spark.graft.fk.elimination.enabled=false`.
  */
case class GraftJoinElimination(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.fk.elimination.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case p @ Project(items, j: Join) =>
        eliminate(j, refs(items)).map(Project(items, _)).getOrElse(p)
      case p @ Project(items, f @ Filter(cond, j: Join)) =>
        eliminate(j, refs(items) ++ cond.references)
          .map(c => Project(items, Filter(cond, c))).getOrElse(p)
      case a @ Aggregate(g, aggs, j: Join, h) =>
        eliminate(j, refs(g ++ aggs)).map(Aggregate(g, aggs, _, h))
          .getOrElse(a)
      case a @ Aggregate(g, aggs, f @ Filter(cond, j: Join), h) =>
        eliminate(j, refs(g ++ aggs) ++ cond.references)
          .map(c => Aggregate(g, aggs, Filter(cond, c), h)).getOrElse(a)
    }
  }

  private def refs(es: Seq[Expression]): AttributeSet =
    AttributeSet(es.flatMap(_.references))

  private def eliminate(j: Join, used: AttributeSet): Option[LogicalPlan] =
    j match {
      case Join(l, r, Inner, Some(cond), _) =>
        tryDrop(l, r, cond, used).orElse(tryDrop(r, l, cond, used))
      // LEFT join: unmatched left rows survive anyway, so a declared
      // UNIQUE pin on the right side alone (multiplicity ≤ 1) suffices —
      // no referential check, no restriction on the LEFT side at all, and
      // right-side filters are fine (they only turn matches into the null
      // rows nobody reads). The classic BI-tool shape: LEFT JOIN exactly
      // so the lookup can be dropped when unused.
      case Join(l, r, LeftOuter, Some(cond), _) =>
        tryDropLeft(l, r, cond, used)
      case _ => None
    }

  /** Walk the right side of a LEFT join down to a graft relation carrying
    * UNIQUE declarations — attribute-only projects (names must survive)
    * and any filters (a filtered unique key is still unique). */
  private def uniqueRelOf(plan: LogicalPlan)
      : Option[(Long, Seq[ForeignKeys.UniqueDecl])] =
    GraftBatchShim.fkInfoOf(plan) match {
      case Some((_, v, raw)) =>
        Some((v, raw.flatMap(ForeignKeys.parseUnique)))
      case None => plan match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          uniqueRelOf(child)
        case Filter(_, child) => uniqueRelOf(child)
        case _ => None
      }
    }

  private def tryDropLeft(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, used: AttributeSet): Option[LogicalPlan] = {
    if (!used.subsetOf(left.outputSet)) return None
    val (rightV, uniques) = uniqueRelOf(right).getOrElse(return None)
    if (uniques.isEmpty) return None
    // the BOUND right-side column names: equated to something free of
    // right-side references (a left column, a literal, an expression over
    // the left), so the column is FIXED per left row — `r.a = r.b` binds
    // nothing. Non-equality conjuncts only reduce matches, which a left
    // join turns into unread nulls — ignored.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x => Seq(x)
    }
    def boundName(a: Expression, other: Expression): Option[String] =
      a match {
        case at: AttributeReference
            if right.outputSet.contains(at) &&
              other.references.intersect(right.outputSet).isEmpty =>
          Some(at.name)
        case _ => None
      }
    val equated: Set[String] = conjuncts(cond).flatMap {
      case EqualTo(a, b) => boundName(a, b).orElse(boundName(b, a))
      case EqualNullSafe(a, b) => boundName(a, b).orElse(boundName(b, a))
      case _ => None
    }.toSet
    val hit = uniques.exists(u =>
      u.pin == rightV && u.cols.toSet.subsetOf(equated))
    if (hit) Some(left) else None
  }

  /** Attribute-only walk of the DIM side down to a graft relation: every
    * kept column keeps its name (no aliases — a rename would detach the
    * name pairing the declaration is stated in) and nothing filters. */
  private def dimRelOf(plan: LogicalPlan): Option[(String, Long)] =
    GraftBatchShim.graftSnapshotOf(plan)
      .map { case (root, v) => (root.toUri.getPath, v) }
      .orElse(plan match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          dimRelOf(child)
        case _ => None
      })

  /** The FACT side: (projects/filters over) a graft relation carrying FK
    * declarations. Returns (pinned version, decls, name of each fact-side
    * output attribute at the RELATION level). Fact-side projections must
    * be attribute-only for the key columns to keep their declared names;
    * filters are allowed (they only shrink the fact). */
  private def factRelOf(plan: LogicalPlan)
      : Option[(String, Long, Seq[ForeignKeys.Decl])] =
    GraftBatchShim.fkInfoOf(plan) match {
      case Some((root, v, raw)) =>
        Some((root.toUri.getPath, v, raw.flatMap(ForeignKeys.parse)))
      case None => plan match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          factRelOf(child)
        case Filter(_, child) => factRelOf(child)
        case _ => None
      }
    }

  private def tryDrop(factSide: LogicalPlan, dimSide: LogicalPlan,
      cond: Expression, used: AttributeSet): Option[LogicalPlan] = {
    if (!used.subsetOf(factSide.outputSet)) return None
    val (_, factV, decls) = factRelOf(factSide).getOrElse(return None)
    val (dimPath, dimV) = dimRelOf(dimSide).getOrElse(return None)
    // the join condition as (fact name, dim name) pairs — attributes only,
    // resolved by side membership (names are relation-level: both walks
    // refused renames)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x => Seq(x)
    }
    val pairs = conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (factSide.outputSet.contains(a) && dimSide.outputSet.contains(b))
          Some((a.name, b.name))
        else if (factSide.outputSet.contains(b) &&
          dimSide.outputSet.contains(a)) Some((b.name, a.name))
        else None
      case _ => None
    }
    if (pairs.exists(_.isEmpty)) return None
    val pairSet = pairs.flatten.toSet
    val hit = decls.exists { d =>
      d.fkCols.zip(d.pkCols).toSet == pairSet &&
        new org.apache.hadoop.fs.Path(d.dimPath).toUri.getPath == dimPath &&
        d.factPin == factV && d.dimPin == dimV
    }
    if (hit) Some(factSide) else None
  }
}

/** DISTINCT elimination from a pinned UNIQUE key: `SELECT DISTINCT`
  * (which the optimizer has already rewritten to an Aggregate whose
  * output is exactly its grouping attributes) over columns that COVER a
  * declared unique key is an identity — the rows are already distinct —
  * so the whole aggregate, and the shuffle it would run, drop from the
  * plan. Filters below only remove rows (uniqueness survives) and
  * attribute-only projections keep the relation-level names the
  * declaration is stated in. The pin contract is
  * [[graft.sources.ForeignKeys.declareUnique]]'s: the relation must sit
  * at exactly the validated version. At 100 TB a de-dup pass over an
  * already-keyed table is the difference between a full shuffle and a
  * straight scan. Shares the kill switch with join elimination
  * (`spark.graft.fk.elimination.enabled`). */
case class GraftDistinctElimination(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.fk.elimination.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(groups, aggs, child, _)
          // the SELECT DISTINCT shape: every output IS a grouping attr
          if aggs.nonEmpty && aggs.forall {
            case a: AttributeReference => groups.exists(_.semanticEquals(a))
            case _ => false
          } && groups.forall(_.isInstanceOf[AttributeReference]) =>
        // covering-key soundness for a group SUPERSET of the unique key:
        // rows are unique on the key, so groups are one row each and the
        // aggregate is an identity on however many columns it outputs
        val names = groups.map(_.asInstanceOf[AttributeReference].name).toSet
        if (!uniqueCovered(child, names)) agg
        else if (aggs.map(_.exprId) == child.output.map(_.exprId)) child
        else Project(aggs.map(_.asInstanceOf[AttributeReference]), child)
      // dropDuplicates(subset) — the training-pipeline dedup verb: the
      // optimizer rewrites Deduplicate to Aggregate(keys, keys ∪
      // First(other) under fresh alias ids, child). One-row groups make
      // every First(a) = a, so a covering unique pin turns the node into
      // a Project rebinding each alias to its First's own input attribute
      // (ignoreNulls is irrelevant on a one-row group).
      case agg @ Aggregate(groups, aggs, child, _)
          if groups.nonEmpty &&
            groups.forall(_.isInstanceOf[AttributeReference]) &&
            aggs.forall {
              case a: AttributeReference =>
                groups.exists(_.semanticEquals(a))
              case Alias(AggregateExpression(
                  org.apache.spark.sql.catalyst.expressions.aggregate
                    .First(_: AttributeReference, _), _, false, None, _), _) =>
                true
              case _ => false
            } && aggs.exists(_.isInstanceOf[Alias]) =>
        val names = groups.map(_.asInstanceOf[AttributeReference].name).toSet
        if (!uniqueCovered(child, names)) agg
        else Project(aggs.map {
          case a: AttributeReference => a
          case al @ Alias(AggregateExpression(
              org.apache.spark.sql.catalyst.expressions.aggregate
                .First(fa: AttributeReference, _), _, _, _, _), n) =>
            Alias(fa, n)(exprId = al.exprId)
        }, child)
      // keep-latest window dedup (`row_number() over (partition by key
      // order by ts) = 1` — the silver-transform idiom): partitions of a
      // covering unique key hold EXACTLY ONE row, so every ranking
      // function is the literal 1 — the Window (a full shuffle + sort)
      // becomes a Project, and Spark's own constant folding then kills
      // the `= 1` filter above it in the same fixpoint.
      case w @ org.apache.spark.sql.catalyst.plans.logical.Window(
          winExprs, partSpec, _, child, _)
          if winExprs.nonEmpty && partSpec.nonEmpty &&
            partSpec.forall(_.isInstanceOf[AttributeReference]) &&
            winExprs.forall {
              case Alias(WindowExpression(
                _: RowNumber | _: Rank | _: DenseRank, _), _) => true
              case _ => false
            } =>
        val names = partSpec.map(_.asInstanceOf[AttributeReference].name).toSet
        if (!uniqueCovered(child, names)) w
        else Project(child.output ++ winExprs.map {
          case al @ Alias(we: WindowExpression, n) =>
            Alias(Literal.create(1, we.dataType), n)(exprId = al.exprId)
        }, child)
    }
  }

  /** Does some UNIQUE pin on the underlying graft relation — still at its
    * validated version — have all its columns among `names`? */
  private def uniqueCovered(plan: LogicalPlan, names: Set[String]): Boolean =
    GraftBatchShim.fkInfoOf(plan) match {
      case Some((_, v, raw)) =>
        raw.flatMap(ForeignKeys.parseUnique).exists(u =>
          u.pin == v && u.cols.forall(names))
      case None => plan match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          uniqueCovered(child, names)
        case Filter(_, child) => uniqueCovered(child, names)
        case _ => false
      }
    }
}
