package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
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
  *  - the dim side is attribute-only projections over a graft snapshot
  *    (no renames), optionally filtered ON THE EQUATED KEY COLUMNS ONLY —
  *    such a filter transposes exactly to the fact's own key (`σ_p(pk)
  *    (dim)` joined one-to-one is `σ_p(fk)(fact)`), while a filter on any
  *    other dim column changes which fact rows survive and declines;
  *  - both relations sit at EXACTLY the declaration's validated pins —
  *    any commit on either table disarms silently (re-declare to re-pin).
  *
  * The fact side substitutes unchanged (join output preserves child
  * attribute identity, so upstream references keep binding). Fact-side
  * filters are fine — they only shrink the fact rows, and every surviving
  * row still matched exactly once.
  *
  * READING THE DIM KEY does not block the drop: on every surviving row
  * `dim.pk = fact.fk` by the join condition itself, so a query whose only
  * dim-side references are the equated key columns (the common
  * SELECT-includes-the-join-key BI shape) rewrites them to the fact's own
  * key via an aliasing Project that keeps the dim attributes' ids — and
  * the dim still drops. Any OTHER dim column read declines.
  *
  * LEFT joins eliminate two ways. Under a full FK pin a LEFT join IS an
  * inner join (every fact row matched exactly once), so the whole inner
  * machinery applies — including reading the dim key through
  * substitution; dim-side filters decline there (a lost match NULLS the
  * row instead of dropping it; only the inferred IsNotNull on an equated
  * key column — which excludes nothing matchable — is tolerated).
  * Failing that, a declared UNIQUE pin on the RIGHT side
  * ([[ForeignKeys.declareUnique]]) whose columns are all bound by the
  * join condition suffices when nothing reads the dim — unmatched left
  * rows survive a left join anyway, so no referential check is needed,
  * the LEFT side can be any plan, and right-side filters are harmless (a
  * lost match is an unread null; no key substitution on this license: an
  * unmatched left row carries NULL dim columns where the left expression
  * is non-null).
  *
  * RIGHT joins are the exact MIRROR (`dim RIGHT JOIN fact` — the spelling
  * BI tools emit when the fact is written second): both licenses apply
  * with the sides swapped — the preserved side is the RIGHT one.
  *
  * SELF-JOINS eliminate on a UNIQUE pin alone: `t a JOIN t b ON a.k =
  * b.k` where both sides are (projections over) the SAME pinned snapshot
  * and the equated columns cover a validated unique key matches every row
  * to exactly itself — the join collapses to ONE scan with the other
  * side's columns re-aliased in place (the classic view-flattening
  * artifact, a whole shuffle-or-broadcast for zero information). Plain
  * `=` conjuncts contribute an IS NOT NULL guard (a null never equals
  * itself; `<=>` needs none — the pin allows at most one all-null key).
  *
  * SEMI/ANTI joins on the declared keys eliminate too: `WHERE fk IN
  * (SELECT pk FROM dim)` is an IDENTITY under the pin (every fact row
  * matched), and `NOT EXISTS` is EMPTY; dim-side key filters transpose
  * to the fact key for both (anti keeps the null-tolerant complement,
  * `NOT coalesce(p(fk), false)`). The SQL spellings are additionally
  * eliminated in their SUBQUERY-EXPRESSION form (InSubquery/Exists inside
  * a Filter, correlation read from OuterReference conjuncts or the
  * pulled-up joinCond) — Spark only rewrites those to joins in the late
  * RewriteSubquery batch, after this rule's fixpoint.
  * Disable with `spark.graft.fk.elimination.enabled=false`.
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
      // self-join collapse and semi/anti elimination are OUTPUT-PRESERVING
      // (the join's output IS the left side), so no parent-shape license
      case j: Join => trySelfJoin(j).orElse(trySemiAnti(j)).getOrElse(j)
      // IN/EXISTS still in their SUBQUERY-EXPRESSION form: Spark only
      // rewrites them to semi/anti joins in the late RewriteSubquery batch
      // (after this rule's), so the SQL spellings are eliminated here at
      // the expression level — the subquery becomes a literal or a
      // transposed fact-key predicate, and Spark's own constant folding /
      // filter pruning finishes the job
      case f @ Filter(cond, child) =>
        rewriteSubqueryPredicates(cond, child)
          .map(Filter(_, child)).getOrElse(f)
    }
  }

  private def refs(es: Seq[Expression]): AttributeSet =
    AttributeSet(es.flatMap(_.references))

  private def eliminate(j: Join, used: AttributeSet): Option[LogicalPlan] =
    j match {
      case Join(l, r, Inner, Some(cond), _) =>
        tryDrop(l, r, cond, used).orElse(tryDrop(r, l, cond, used))
      // LEFT join, two licenses:
      //  - a full FK pin makes it an INNER join (every fact row matched,
      //    exactly once) — the whole inner machinery applies, including
      //    reading the dim key through substitution; dim-side filters
      //    must NOT transpose here (a lost match nulls the row instead
      //    of dropping it), so they decline;
      //  - failing that, a declared UNIQUE pin on the right side alone
      //    (multiplicity ≤ 1) suffices when nothing reads the dim —
      //    unmatched left rows survive anyway, the LEFT side can be any
      //    plan, and right-side filters are fine (they only turn matches
      //    into the null rows nobody reads). The classic BI-tool shape:
      //    LEFT JOIN exactly so the lookup can be dropped when unused.
      case Join(l, r, LeftOuter, Some(cond), _) =>
        tryDrop(l, r, cond, used, allowDimConds = false)
          .orElse(tryDropOuter(l, r, cond, used))
      // RIGHT join — the mirror (the spelling BI tools emit when the
      // fact is written second): same two licenses, sides swapped
      case Join(l, r, RightOuter, Some(cond), _) =>
        tryDrop(r, l, cond, used, allowDimConds = false)
          .orElse(tryDropOuter(r, l, cond, used))
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

  /** The unique-pin license for OUTER joins, orientation-agnostic: the
    * PRESERVED side (`keep` — the left of a LeftOuter, the right of a
    * RightOuter) survives unmatched anyway, so a declared UNIQUE pin on
    * the other side alone (multiplicity ≤ 1) licenses the drop when
    * nothing reads it. */
  private def tryDropOuter(keep: LogicalPlan, drop: LogicalPlan,
      cond: Expression, used: AttributeSet): Option[LogicalPlan] = {
    if (!used.subsetOf(keep.outputSet)) return None
    val (dropV, uniques) = uniqueRelOf(drop).getOrElse(return None)
    if (uniques.isEmpty) return None
    // the BOUND dropped-side column names: equated to something free of
    // dropped-side references (a preserved column, a literal, an
    // expression over the preserved side), so the column is FIXED per
    // preserved row — `r.a = r.b` binds nothing. Non-equality conjuncts
    // only reduce matches, which the outer join turns into unread nulls —
    // ignored.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x => Seq(x)
    }
    def boundName(a: Expression, other: Expression): Option[String] =
      a match {
        case at: AttributeReference
            if drop.outputSet.contains(at) &&
              other.references.intersect(drop.outputSet).isEmpty =>
          Some(at.name)
        case _ => None
      }
    val equated: Set[String] = conjuncts(cond).flatMap {
      case EqualTo(a, b) => boundName(a, b).orElse(boundName(b, a))
      case EqualNullSafe(a, b) => boundName(a, b).orElse(boundName(b, a))
      case _ => None
    }.toSet
    val hit = uniques.exists(u =>
      u.pin == dropV && u.cols.toSet.subsetOf(equated))
    if (hit) Some(keep) else None
  }

  /** Attribute-only walk of the DIM side down to a graft relation: every
    * kept column keeps its name (no aliases — a rename would detach the
    * name pairing the declaration is stated in). Filters are COLLECTED,
    * not refused — the caller drops the dim only if each conjunct
    * references nothing but the equated key columns (where it is exactly
    * a fact-side filter on the fact key, by the pin's one-to-one match);
    * anything else declines there. */
  private def dimRelOf(plan: LogicalPlan)
      : Option[(String, Long, Seq[Expression])] =
    GraftBatchShim.graftSnapshotOf(plan)
      .map { case (root, v) => (root.toUri.getPath, v, Nil) }
      .orElse(plan match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          dimRelOf(child)
        case Filter(cond, child) if cond.deterministic =>
          dimRelOf(child).map { case (p, v, cs) => (p, v, cs :+ cond) }
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
      cond: Expression, used: AttributeSet,
      allowDimConds: Boolean = true): Option[LogicalPlan] = {
    // fast refusal: the only dim attributes the rewrite can supply are the
    // condition's own — anything else read from the dim blocks the drop
    if (!used.subsetOf(factSide.outputSet ++ cond.references)) return None
    val (_, factV, decls) = factRelOf(factSide).getOrElse(return None)
    val (dimPath, dimV, dimConds) = dimRelOf(dimSide).getOrElse(return None)
    // the join condition as (fact attr, dim attr) pairs — attributes only,
    // resolved by side membership (names are relation-level: both walks
    // refused renames)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x => Seq(x)
    }
    val pairs: Seq[Option[(AttributeReference, AttributeReference)]] =
      conjuncts(cond).map {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          if (factSide.outputSet.contains(a) && dimSide.outputSet.contains(b))
            Some((a, b))
          else if (factSide.outputSet.contains(b) &&
            dimSide.outputSet.contains(a)) Some((b, a))
          else None
        case _ => None
      }
    if (pairs.exists(_.isEmpty)) return None
    val attrPairs = pairs.flatten
    val pairSet = attrPairs.map { case (f, d) => (f.name, d.name) }.toSet
    val hit = decls.exists { d =>
      d.fkCols.zip(d.pkCols).toSet == pairSet &&
        new org.apache.hadoop.fs.Path(d.dimPath).toUri.getPath == dimPath &&
        d.factPin == factV && d.dimPin == dimV
    }
    if (!hit) return None
    // on every surviving row the equated columns are EQUAL and every fact
    // row survives (all matched, by the pin) — so dim attributes rewrite
    // to their fact twins, both in dim-side FILTERS (σ_p(pk)(dim) joined
    // one-to-one is σ_p(fk)(fact)) and in upstream READS of the key
    val factFor: Map[ExprId, AttributeReference] =
      attrPairs.map { case (f, d) => d.exprId -> f }.toMap
    // LEFT-join callers: a filtered dim breaks the every-row-matched
    // argument (a lost match NULLS the row instead of dropping it) — but
    // the optimizer-inferred IsNotNull on an equated KEY column only
    // excludes dim rows that could never match (null never equals), so
    // it drops rather than declines
    val effectiveDimConds =
      if (allowDimConds) dimConds
      else {
        val benign = dimConds.forall {
          case IsNotNull(a: AttributeReference) => factFor.contains(a.exprId)
          case _ => false
        }
        if (!benign) return None
        Nil
      }
    def onFact(e: Expression): Option[Expression] =
      if (e.references.forall(a => factFor.contains(a.exprId)))
        Some(e.transform { case a: AttributeReference => factFor(a.exprId) })
      else None
    val rewrittenDimConds =
      effectiveDimConds.map(onFact(_).getOrElse(return None))
    val base: LogicalPlan =
      if (rewrittenDimConds.isEmpty) factSide
      else Filter(rewrittenDimConds.reduce[Expression](And), factSide)
    if (used.subsetOf(factSide.outputSet)) return Some(base)
    val extra = (used -- factSide.outputSet).toSeq
    if (!extra.forall(a => factFor.contains(a.exprId))) return None
    Some(Project(factSide.output ++
      extra.map(a => Alias(factFor(a.exprId), a.name)(exprId = a.exprId)),
      base))
  }

  // ---------------------------------------------------------------------
  // Semi/anti-join elimination on a pinned FOREIGN KEY
  // ---------------------------------------------------------------------

  /** `fact WHERE fk IN (SELECT pk FROM dim)` — a LeftSemi join on a
    * validated FK pin — is an IDENTITY: every fact row matches (exactly
    * once, though semi doesn't even need that), so the subquery, its scan
    * and its join drop and the fact passes through. The dual LeftAnti
    * (`NOT EXISTS`) keeps exactly the unmatched rows: NONE, so the whole
    * subtree collapses to an empty relation. Dim-side filters on the
    * equated key columns transpose to the fact key like the inner-join
    * case (`semi σ_p(pk)(dim)` keeps exactly `σ_p(fk)(fact)`; anti keeps
    * its complement-with-null, `NOT coalesce(p(fk), false)`); any other
    * dim filter declines. */
  private def trySemiAnti(j: Join): Option[LogicalPlan] = j match {
    case Join(l, r, jt, Some(cond), _)
        if jt == LeftSemi || jt == LeftAnti =>
      val (_, factV, decls) = factRelOf(l).getOrElse(return None)
      val (dimPath, dimV, dimConds) = dimRelOf(r).getOrElse(return None)
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(a, b) => conjuncts(a) ++ conjuncts(b)
        case x => Seq(x)
      }
      val attrPairs = conjuncts(cond).map {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          if (l.outputSet.contains(a) && r.outputSet.contains(b))
            Some((a, b))
          else if (l.outputSet.contains(b) && r.outputSet.contains(a))
            Some((b, a))
          else None
        case _ => None
      }.map(_.getOrElse(return None))
      val pairSet = attrPairs.map { case (f, d) => (f.name, d.name) }.toSet
      val hit = decls.exists { d =>
        d.fkCols.zip(d.pkCols).toSet == pairSet &&
          new org.apache.hadoop.fs.Path(d.dimPath).toUri.getPath == dimPath &&
          d.factPin == factV && d.dimPin == dimV
      }
      if (!hit) return None
      val factFor: Map[ExprId, AttributeReference] =
        attrPairs.map { case (f, d) => d.exprId -> f }.toMap
      val onFact = dimConds.map { e =>
        if (e.references.forall(a => factFor.contains(a.exprId)))
          e.transform { case a: AttributeReference => factFor(a.exprId) }
        else return None
      }
      if (jt == LeftSemi) {
        Some(if (onFact.isEmpty) l
          else Filter(onFact.reduce[Expression](And), l))
      } else {
        Some(if (onFact.isEmpty)
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation(l.output)
        else Filter(Not(Coalesce(Seq(onFact.reduce[Expression](And),
          Literal.FalseLiteral))), l))
      }
    case _ => None
  }

  // ---------------------------------------------------------------------
  // IN / EXISTS subquery-expression elimination on a pinned FOREIGN KEY
  // ---------------------------------------------------------------------

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  /** Rewrite IN/EXISTS (and their negations) over a pinned FK inside a
    * Filter's condition. Truth tables under the pin (every fact key
    * non-null and matched exactly once; dim key unique):
    *  - `fk IN (SELECT pk FROM dim)` ≡ TRUE; over a key-filtered dim,
    *    ≡ `coalesce(p(fk), false)` (the only candidate element is the
    *    row's own match);
    *  - `fk NOT IN (...)` over the UNFILTERED dim ≡ FALSE (the match is
    *    always present — a null pk elsewhere only turns FALSE into
    *    sometimes-NULL, which filters identically); a FILTERED dim
    *    declines (an unknowable null element would flip ¬p rows to NULL);
    *  - `EXISTS (... WHERE d.pk = f.fk [AND p])` ≡ TRUE, or
    *    `coalesce(p(fk), false)`; `NOT EXISTS` is its negation.
    * None when nothing rewrote. */
  private def rewriteSubqueryPredicates(cond: Expression,
      child: LogicalPlan): Option[Expression] = {
    if (!cond.exists(e => e.isInstanceOf[InSubquery] || e.isInstanceOf[Exists]))
      return None
    val (_, factV, decls) = factRelOf(child).getOrElse(return None)
    if (decls.isEmpty) return None

    /** TRUE / coalesce(p(fk), false) for a membership probe of `values`
      * against the subquery plan, when the pin vouches for it. */
    def membership(values: Seq[Expression], sub: LogicalPlan,
        corrPairs: Seq[(AttributeReference, AttributeReference)],
        localConds: Seq[Expression], dimPath: String, dimV: Long)
        : Option[Expression] = {
      val valuePairs = values.zip(sub.output).map {
        case (a: AttributeReference, out) if child.outputSet.contains(a) =>
          (a, out)
        case _ => return None
      }
      val all = valuePairs.map { case (f, d) => (f, d) } ++ corrPairs
      if (all.isEmpty) return None
      val pairSet = all.map { case (f, d) => (f.name, d.name) }.toSet
      val hit = decls.exists { d =>
        d.fkCols.zip(d.pkCols).toSet == pairSet &&
          new org.apache.hadoop.fs.Path(d.dimPath).toUri.getPath == dimPath &&
          d.factPin == factV && d.dimPin == dimV
      }
      if (!hit) return None
      val factFor: Map[ExprId, AttributeReference] =
        all.map { case (f, d) => d.exprId -> f }.toMap
      val onFact = localConds.map { e =>
        if (e.references.forall(a => factFor.contains(a.exprId)))
          e.transform { case a: AttributeReference => factFor(a.exprId) }
        else return None
      }
      Some(if (onFact.isEmpty) Literal.TrueLiteral
        else Coalesce(Seq(onFact.reduce[Expression](And),
          Literal.FalseLiteral)))
    }

    /** The IN shape: the subquery's output IS the probed key tuple. */
    def inElim(in: InSubquery, negated: Boolean): Option[Expression] = {
      if (in.query.joinCond.nonEmpty) return None // correlated IN: decline
      val sub = in.query.plan
      if (sub.output.size != in.values.size) return None
      val (dimPath, dimV, conds) = dimRelOf(sub).getOrElse(return None)
      if (negated && conds.nonEmpty) return None // null-element hazard
      membership(in.values, sub, Nil, conds, dimPath, dimV)
        .map(e => if (negated) Not(e) else e)
    }

    /** The EXISTS shape: correlation predicates live INSIDE the subquery
      * as `outer(fk) = pk` conjuncts; projections may compute anything
      * (their output is never read). */
    def existsWalk(plan: LogicalPlan)
        : Option[(String, Long, Seq[Expression], AttributeSet)] =
      GraftBatchShim.graftSnapshotOf(plan) match {
        case Some((root, v)) =>
          Some((root.toUri.getPath, v, Nil, plan.outputSet))
        case None => plan match {
          case Project(_, ch) => existsWalk(ch)
          case Filter(c, ch) if c.deterministic =>
            existsWalk(ch).map { case (p, v, cs, out) =>
              (p, v, cs ++ splitConj(c), out) }
          case _ => None
        }
      }

    def existsElim(ex: Exists, negated: Boolean): Option[Expression] = {
      val (dimPath, dimV, conds, dimOut) =
        existsWalk(ex.plan).getOrElse(return None)
      // correlation predicates appear in TWO places depending on where in
      // the fixpoint we run: still inside the plan as OuterReference
      // conjuncts (pre-PullupCorrelatedPredicates), or pulled into
      // ex.joinCond as plain attr = attr equalities (post-pullup)
      val (corr, local) = conds.partition(_.exists(
        _.isInstanceOf[OuterReference]))
      def strip(e: Expression): Expression = e match {
        case OuterReference(a) => a
        case other => other
      }
      val corrPairs = (corr ++ ex.joinCond.flatMap(splitConj)).map {
        case EqualTo(x, y) => (strip(x), strip(y)) match {
          case (a: AttributeReference, b: AttributeReference)
              if child.outputSet.contains(a) && dimOut.contains(b) => (a, b)
          case (b: AttributeReference, a: AttributeReference)
              if child.outputSet.contains(a) && dimOut.contains(b) => (a, b)
          case _ => return None
        }
        case _ => return None
      }
      if (local.exists(_.exists(_.isInstanceOf[OuterReference]))) return None
      membership(Nil, ex.plan, corrPairs, local, dimPath, dimV)
        .map(e => if (negated) Not(e) else e)
    }

    var changed = false
    val out = splitConj(cond).map { c =>
      val r = c match {
        case in: InSubquery => inElim(in, negated = false)
        case Not(in: InSubquery) => inElim(in, negated = true)
        case ex: Exists => existsElim(ex, negated = false)
        case Not(ex: Exists) => existsElim(ex, negated = true)
        case _ => None
      }
      r match {
        case Some(e) => changed = true; e
        case None => c
      }
    }
    if (changed) Some(out.reduce[Expression](And)) else None
  }

  // ---------------------------------------------------------------------
  // Self-join elimination
  // ---------------------------------------------------------------------

  /** `t a JOIN t b ON a.k = b.k` over one pinned snapshot whose unique key
    * the equalities cover: every row matches exactly itself, so the join
    * IS the scan with the dropped side's columns re-aliased. The KEPT side
    * may carry filters (its survivors still self-match against the
    * unfiltered other side); the DROPPED side must be attribute-only —
    * a filter there would have to be re-bound, so it declines (the rule
    * tries both orientations, covering one-sided filters either way). */
  private def trySelfJoin(j: Join): Option[LogicalPlan] = j match {
    case Join(l, r, Inner, Some(cond), _) =>
      selfCollapse(l, r, cond, keepLeft = true)
        .orElse(selfCollapse(r, l, cond, keepLeft = false))
    case _ => None
  }

  /** The graft relation NODE under attribute-only projects (and filters,
    * when allowed) — the node itself, so the caller can read its full
    * output and its pin/props. */
  private def relNodeOf(plan: LogicalPlan,
      allowFilter: Boolean): Option[LogicalPlan] =
    if (GraftBatchShim.graftSnapshotOf(plan).isDefined) Some(plan)
    else plan match {
      case Project(items, child)
          if items.forall(_.isInstanceOf[AttributeReference]) =>
        relNodeOf(child, allowFilter)
      case Filter(_, child) if allowFilter => relNodeOf(child, allowFilter)
      case _ => None
    }

  /** Rebuild an attribute-only-Project/Filter stack over a graft relation
    * so `extra` relation attributes ride through every Project — the kept
    * side must now also supply the dropped side's columns. */
  private def widened(plan: LogicalPlan, extra: Seq[Attribute]): LogicalPlan =
    plan match {
      case Project(items, child)
          if items.forall(_.isInstanceOf[AttributeReference]) =>
        val have = AttributeSet(items)
        Project(items ++ extra.filterNot(have.contains),
          widened(child, extra))
      case Filter(cond, child) => Filter(cond, widened(child, extra))
      case rel => rel
    }

  private def selfCollapse(keep: LogicalPlan, drop: LogicalPlan,
      cond: Expression, keepLeft: Boolean): Option[LogicalPlan] = {
    val keepRel = relNodeOf(keep, allowFilter = true).getOrElse(return None)
    val dropRel = relNodeOf(drop, allowFilter = false).getOrElse(return None)
    val (keepPath, keepV) =
      GraftBatchShim.graftSnapshotOf(keepRel).getOrElse(return None)
    val (dropPath, dropV) =
      GraftBatchShim.graftSnapshotOf(dropRel).getOrElse(return None)
    if (keepPath.toUri.getPath != dropPath.toUri.getPath || keepV != dropV)
      return None
    val uniques = GraftBatchShim.fkInfoOf(keepRel) match {
      case Some((_, v, raw)) if v == keepV =>
        raw.flatMap(ForeignKeys.parseUnique).filter(_.pin == keepV)
      case _ => return None
    }
    if (uniques.isEmpty) return None
    // every conjunct must equate THE SAME relation column across the two
    // sides (attribute-only walks: names are relation-level); `=` needs an
    // IS NOT NULL guard on the kept attr (null never self-matches), `<=>`
    // does not. Any other conjunct shape declines — `a.v > b.v` is
    // v > v only where v is non-null, and nothing here proves that.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x => Seq(x)
    }
    def sameCol(a: Expression, b: Expression)
        : Option[(AttributeReference, String)] = (a, b) match {
      case (x: AttributeReference, y: AttributeReference)
          if x.name == y.name =>
        if (keep.outputSet.contains(x) && drop.outputSet.contains(y))
          Some((x, x.name))
        else if (keep.outputSet.contains(y) && drop.outputSet.contains(x))
          Some((y, y.name))
        else None
      case _ => None
    }
    val eqs: Seq[(AttributeReference, String, Boolean)] =
      conjuncts(cond).map {
        case EqualTo(a, b) => sameCol(a, b).map(p => (p._1, p._2, false))
        case EqualNullSafe(a, b) => sameCol(a, b).map(p => (p._1, p._2, true))
        case _ => None
      }.map(_.getOrElse(return None))
    val equatedNames = eqs.map(_._2).toSet
    if (!uniques.exists(_.cols.toSet.subsetOf(equatedNames))) return None
    // rebind the dropped side's output to the kept side's RELATION
    // attributes (same names — both walks are attribute-only) under the
    // dropped attributes' own ids, widening the kept stack to carry them
    val keepByName: Map[String, Attribute] =
      keepRel.output.map(a => a.name -> a).toMap
    if (!drop.output.forall(a => keepByName.contains(a.name))) return None
    val extra = drop.output.map(a => keepByName(a.name))
      .filterNot(keep.outputSet.contains).distinct
    val rebinds = drop.output.map(a =>
      Alias(keepByName(a.name), a.name)(exprId = a.exprId))
    val notNulls = eqs.collect { case (a, _, false) => IsNotNull(a) }
    val base = widened(keep, extra)
    val guarded =
      if (notNulls.isEmpty) base
      else Filter(notNulls.reduce[Expression](And), base)
    Some(Project(
      if (keepLeft) keep.output ++ rebinds else rebinds ++ keep.output,
      guarded))
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
  * straight scan.
  *
  * The same one-row-per-key fact powers three more rewrites here:
  * `dropDuplicates(subset)` and keep-latest window dedup become Projects
  * (below), COUNT(DISTINCT key...) de-DISTINCTs to a plain COUNT (the
  * planner skips Expand + double aggregation — one shuffle instead of
  * two), and GROUP BY a covering key collapses the WHOLE aggregate to a
  * Project of per-row scalars (COUNT(*)→1, SUM(v)→v widened, MIN/MAX/
  * FIRST/LAST→v, AVG→v cast — DISTINCT args are a no-op on one row;
  * FILTER clauses and TRY modes decline). Shares the kill switch with
  * join elimination (`spark.graft.fk.elimination.enabled`). */
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
      // The two remaining unique-pin aggregate rewrites, in one case so
      // neither shadows the other in the partial function:
      //  - COUNT(DISTINCT k, ...) whose argument tuple covers a pinned
      //    unique key de-DISTINCTs (the tuples are already distinct on
      //    every row where they are all non-null — exactly the rows either
      //    form counts), skipping the planner's Expand + double
      //    aggregation: one shuffle instead of two at scale;
      //  - GROUP BY a covering unique key makes every group EXACTLY ONE
      //    ROW, so each aggregate is a per-row scalar (COUNT(*)→1,
      //    SUM(v)→v widened, MIN/MAX/FIRST/LAST→v, AVG→v cast, COUNT(cols)
      //    →all-non-null indicator, DISTINCT a no-op) and the whole
      //    aggregate — its shuffle included — becomes a Project. The
      //    classic view-flattening artifact: `SELECT key, SUM(v) FROM t
      //    GROUP BY key` over a keyed table.
      case agg @ Aggregate(groups, aggs, child, h)
          // cheap pre-gates before any walk or allocation: a DISTINCT
          // aggregate somewhere, or plain-attribute groups that COULD
          // cover a pin — everything else exits in O(expr nodes)
          if aggs.exists(_.exists {
            case ae: AggregateExpression => ae.isDistinct
            case _ => false
          }) || (groups.nonEmpty &&
            groups.forall(_.isInstanceOf[AttributeReference])) =>
        var changed = false
        val newAggs = aggs.map(_.transform {
          case ae @ AggregateExpression(
              org.apache.spark.sql.catalyst.expressions.aggregate
                .Count(args), _, true, None, _)
              if args.nonEmpty &&
                args.forall(_.isInstanceOf[AttributeReference]) &&
                uniqueCovered(child, args.map(
                  _.asInstanceOf[AttributeReference].name).toSet) =>
            changed = true
            ae.copy(isDistinct = false)
        }.asInstanceOf[NamedExpression])
        val collapsed =
          if (groups.nonEmpty &&
            groups.forall(_.isInstanceOf[AttributeReference]) &&
            uniqueCovered(child, groups.map(
              _.asInstanceOf[AttributeReference].name).toSet))
            traverse(newAggs.map {
              case a: AttributeReference => Some(a)
              case al @ Alias(e, n) =>
                collapseOneRow(e).map(Alias(_, n)(exprId = al.exprId))
              case _ => None
            }).map(Project(_, child))
          else None
        collapsed.getOrElse(
          if (changed) Aggregate(groups, newAggs, child, h) else agg)
    }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** An aggregate-bearing output expression evaluated over a ONE-ROW
    * group: every AggregateExpression inside reduces to a row-local
    * scalar (DISTINCT is a no-op on one row); None for any function/shape
    * where that identity is not airtight (FILTER clauses, TRY modes,
    * exotic functions). */
  private def collapseOneRow(e: Expression): Option[Expression] = e match {
    case AggregateExpression(f, _, _, None, _) =>
      import org.apache.spark.sql.catalyst.expressions.aggregate._
      f match {
        case Count(Seq(l: Literal)) if l.value != null => Some(Literal(1L))
        case Count(args) if args.nonEmpty =>
          // COUNT over columns counts the row iff every arg is non-null
          Some(If(args.map(IsNotNull).reduce[Expression](And),
            Literal(1L), Literal(0L)))
        case s @ Sum(c, em) if em.evalMode != EvalMode.TRY =>
          // single-value "sum" is the value widened to the SUM type —
          // a widening cast can neither overflow nor round
          Some(if (c.dataType == s.dataType) c else Cast(c, s.dataType))
        case Min(c) => Some(c)
        case Max(c) => Some(c)
        case a @ Average(c, em) if em != EvalMode.TRY =>
          // value/1 at the AVG output type; the cast widens scale only
          Some(Cast(c, a.dataType))
        case First(c, _) => Some(c)
        case Last(c, _) => Some(c)
        case _ => None
      }
    case _: AggregateExpression => None
    case other =>
      val kids = other.children.map(collapseOneRow)
      if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
      else None
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
