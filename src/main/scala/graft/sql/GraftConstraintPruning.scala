package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftBatchShim

/** CONSTRAINT-IMPLIED FILTER PRUNING — a query conjunct the table's
  * validated CHECK constraints already guarantee evaluates TRUE on every
  * stored row is a tautology over the scan: drop it instead of paying its
  * per-row evaluation across 100 TB (and unblocking downstream rewrites
  * that refuse non-trivial residuals). The warehouse `WHERE amount > 0`
  * that merely restates the table contract costs nothing.
  *
  * SOUNDNESS. CHECK uses ANSI semantics: a row passes when the predicate
  * is TRUE **or NULL** (VersionedTable.withChecks), so `CHECK (v > 0)`
  * admits NULL v — dropping an equal query conjunct outright would
  * wrongly keep those rows (the filter's three-valued semantics drop
  * them). A conjunct C is dropped only when ALL of:
  *  - C is semantically EQUAL to (name-canonicalized, constant-folded
  *    `semanticEquals`) — or IMPLIED BY, for single-column comparisons
  *    over literals (`CHECK (v >= 10)` implies `v >= 5`, `v > 4`,
  *    `v != 3`, `v IN (...)` ⊇ cases; the interval matrix in
  *    [[implies]]) — a CONJUNCT of a validated constraint K (a passing
  *    row has the whole CHECK TRUE-or-NULL, and `FALSE AND NULL = FALSE`
  *    makes every conjunct individually TRUE-or-NULL too);
  *  - that constraint conjunct is NULL-REJECTING: a chain of
  *    null-intolerant operators over attributes/literals AND — because
  *    null-intolerance only promises null-in ⇒ null-out, while legacy
  *    (non-ANSI) Divide/Remainder/Cast return NULL on NON-null inputs
  *    (divide-by-zero, failed cast) — Catalyst's own `nullable` must be
  *    false once its attribute references are rebuilt non-nullable. On
  *    rows where its references are non-null it then CANNOT evaluate
  *    NULL, so pass means TRUE;
  *  - every column the constraint conjunct references is guaranteed
  *    non-null by a REMAINING `IsNotNull` conjunct of the same filter
  *    (Catalyst's InferFiltersFromConstraints plants exactly these
  *    beside any null-intolerant comparison, and this rule never drops
  *    them).
  * Within the surviving rows the references are non-null, the constraint
  * conjunct is non-null, the write-time validation proved it not-false,
  * hence TRUE — and TRUE implies C.
  *
  * The constraint predicates resolve against the RELATION the filter
  * actually reads (its pinned commit's props — time travel sees the
  * constraints in force at its version), analyzed once and memoized per
  * (SQL, relation schema). Runs AFTER GraftMvRewrite in the injection
  * order, so a view's WHERE-matching conjuncts are still present when
  * the rewrite inspects the query. Disable with
  * `spark.graft.constraintPruning.enabled=false`. */
case class GraftConstraintPruning(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean = spark.sessionState.conf
    .getConfString("spark.graft.constraintPruning.enabled", "true").toBoolean

  /** Stable synthetic ids per column name — both sides of the match draw
    * from here, so equal names share an id and different names never do. */
  private val nameIds =
    new java.util.concurrent.ConcurrentHashMap[String, ExprId]()
  private def idFor(n: String): ExprId =
    nameIds.computeIfAbsent(n, _ => NamedExpression.newExprId)

  /** Analyzed-constraint memo: (predicate SQL, relation schema) → the
    * name-canonical, null-rejecting CONJUNCTS (empty = unresolvable or
    * none usable — cached so a bad constraint costs one analysis, not
    * one per query). */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(String, org.apache.spark.sql.types.StructType, Boolean),
      Seq[Expression]]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case f @ Filter(cond, child) =>
        pruned(cond, child) match {
          case None => f
          case Some(None) => child
          case Some(Some(nc)) => f.copy(condition = nc)
        }
    }
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  /** Null-REJECTING shape: cannot evaluate NULL when its attribute inputs
    * are non-null. A chain of null-intolerant operators over attrs and
    * literals is NECESSARY but not sufficient — null-intolerance only
    * promises null-in ⇒ null-out, and legacy-mode Divide/Remainder/Cast
    * are null-intolerant yet produce NULL from NON-null inputs (divide by
    * zero, failed cast). So additionally rebuild the attribute references
    * as non-nullable and require Catalyst's own `nullable` to be false —
    * the nullability contract ("nullable=false means no NULL output") is
    * exactly the guarantee needed, and legacy Divide/Cast keep
    * nullable=true even over non-nullable children. */
  private def nullRejecting(e: Expression): Boolean = {
    def intolerantChain(x: Expression): Boolean = x match {
      case _: AttributeReference | _: Literal => true
      // In/InSet are not flagged nullIntolerant (a NULL list element can
      // turn a non-match into NULL) — but over NON-null literals they
      // are: null probe → NULL, non-null probe → TRUE/FALSE
      case In(v, list) => intolerantChain(v) && list.forall {
        case Literal(l, _) => l != null
        case _ => false
      }
      case InSet(v, hset) => intolerantChain(v) && !hset.contains(null)
      case y => y.nullIntolerant && y.children.forall(intolerantChain)
    }
    intolerantChain(e) && scala.util.Try {
      !e.transform {
        case a: AttributeReference => a.withNullability(false)
      }.nullable
    }.getOrElse(false)
  }

  /** Name-canonical form: attribute references become synthetic per-name
    * attrs, foldable subtrees fold (the query side arrives folded, the
    * constraint side only analyzed). None when a reference escapes the
    * name map or the expression is non-deterministic/subquery-carrying. */
  private def canon(e: Expression,
      names: Map[ExprId, String]): Option[Expression] = {
    if (!e.deterministic || e.exists(_.isInstanceOf[PlanExpression[_]]))
      return None
    var ok = true
    val t = e.transform {
      case a: AttributeReference => names.get(a.exprId) match {
        case Some(n) => AttributeReference(n, a.dataType, a.nullable)(
          exprId = idFor(n))
        case None => ok = false; a
      }
    }
    if (!ok) return None
    // a foldable subtree can still THROW at eval (ANSI leaves failing
    // folds for runtime) — a throw during optimization must read as
    // no-match, never abort the query
    scala.util.Try(t.transformDown {
      case x if x.foldable && !x.isInstanceOf[Literal] =>
        Literal.create(x.eval(), x.dataType)
    }).toOption
  }

  /** A single-column comparison over non-null literals, the shape the
    * interval-implication matrix reasons about: `op` is one of ge/gt/le/
    * lt/eq/ne/in, `vs` the literal value(s) in the internal domain. */
  private case class Atom(col: String,
      dt: org.apache.spark.sql.types.DataType, op: String, vs: Seq[Any])

  private def atomOf(e: Expression): Option[Atom] = {
    def lit(l: Expression): Option[(Any, org.apache.spark.sql.types.DataType)] =
      l match {
        case Literal(v, dt) if v != null => Some((v, dt))
        case _ => None
      }
    def cmp(a: Expression, l: Expression, op: String): Option[Atom] =
      (a, lit(l)) match {
        case (ar: AttributeReference, Some((v, dt))) if dt == ar.dataType =>
          Some(Atom(ar.name, dt, op, Seq(v)))
        case _ => None
      }
    def flip(op: String) = op match {
      case "ge" => "le"; case "gt" => "lt"
      case "le" => "ge"; case "lt" => "gt"; case x => x
    }
    e match {
      case GreaterThanOrEqual(a, l) => cmp(a, l, "ge").orElse(cmp(l, a, flip("ge")))
      case GreaterThan(a, l) => cmp(a, l, "gt").orElse(cmp(l, a, flip("gt")))
      case LessThanOrEqual(a, l) => cmp(a, l, "le").orElse(cmp(l, a, flip("le")))
      case LessThan(a, l) => cmp(a, l, "lt").orElse(cmp(l, a, flip("lt")))
      case EqualTo(a, l) => cmp(a, l, "eq").orElse(cmp(l, a, "eq"))
      case Not(EqualTo(a, l)) => cmp(a, l, "ne").orElse(cmp(l, a, "ne"))
      case In(ar: AttributeReference, list) if list.nonEmpty =>
        val vs = list.flatMap(lit).filter(_._2 == ar.dataType)
        if (vs.size == list.size) Some(Atom(ar.name, ar.dataType, "in", vs.map(_._1)))
        else None
      case InSet(ar: AttributeReference, hset)
          if hset.nonEmpty && !hset.contains(null) =>
        Some(Atom(ar.name, ar.dataType, "in", hset.toSeq))
      case _ => None
    }
  }

  /** K ⇒ C for same-column comparisons over literals: K's admitted value
    * set is contained in C's. Generic-ordering only (no successor
    * arithmetic — `v > 4` does not imply `v >= 5` even for ints); any
    * uncomparable type or shape mismatch reads as "no". */
  private def implies(k: Expression, c: Expression): Boolean = (for {
    ka <- atomOf(k); ca <- atomOf(c)
    if ka.col == ca.col && ka.dt == ca.dt
  } yield scala.util.Try {
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(ka.dt)
    def kv = ka.vs.head
    def cv = ca.vs.head
    def kmin = ka.vs.min(ord)
    def kmax = ka.vs.max(ord)
    def inC(x: Any) = ca.vs.exists(ord.equiv(_, x))
    (ka.op, ca.op) match {
      // K bounds below: admitted values sit at/above kv
      case ("ge", "ge") => ord.gteq(kv, cv)
      case ("ge", "gt") => ord.gt(kv, cv)
      case ("ge", "ne") => ord.lt(cv, kv)
      case ("gt", "ge") => ord.gteq(kv, cv)
      case ("gt", "gt") => ord.gteq(kv, cv)
      case ("gt", "ne") => ord.lteq(cv, kv)
      // K bounds above
      case ("le", "le") => ord.lteq(kv, cv)
      case ("le", "lt") => ord.lt(kv, cv)
      case ("le", "ne") => ord.gt(cv, kv)
      case ("lt", "le") => ord.lteq(kv, cv)
      case ("lt", "lt") => ord.lteq(kv, cv)
      case ("lt", "ne") => ord.gteq(cv, kv)
      // K pins a point
      case ("eq", "ge") => ord.gteq(kv, cv)
      case ("eq", "gt") => ord.gt(kv, cv)
      case ("eq", "le") => ord.lteq(kv, cv)
      case ("eq", "lt") => ord.lt(kv, cv)
      case ("eq", "eq") => ord.equiv(kv, cv)
      case ("eq", "ne") => !ord.equiv(kv, cv)
      case ("eq", "in") => inC(kv)
      // K admits a finite set
      case ("in", "ge") => ord.gteq(kmin, cv)
      case ("in", "gt") => ord.gt(kmin, cv)
      case ("in", "le") => ord.lteq(kmax, cv)
      case ("in", "lt") => ord.lt(kmax, cv)
      case ("in", "ne") => !ka.vs.exists(ord.equiv(_, cv))
      case ("in", "eq") => ka.vs.forall(ord.equiv(_, cv))
      case ("in", "in") => ka.vs.forall(inC)
      // K excludes a point: implies only its own exclusion
      case ("ne", "ne") => ord.equiv(kv, cv)
      case _ => false
    }
  }.getOrElse(false)).getOrElse(false)

  /** Walk attribute-only projections down to a constraint-carrying graft
    * relation: (constraints, exprId → relation column, relation node). */
  private def relOf(plan: LogicalPlan): Option[(Map[String, String],
      Map[ExprId, String], LogicalPlan)] =
    GraftBatchShim.graftConstraintsOf(plan) match {
      case Some((cons, leaf)) =>
        Some((cons, plan.output.map(a => a.exprId -> a.name).toMap, leaf))
      case None => plan match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          relOf(child).map { case (cons, names, leaf) =>
            val out = items.map(_.asInstanceOf[AttributeReference].exprId).toSet
            (cons, names.filter(kv => out(kv._1)), leaf)
          }
        case _ => None
      }
    }

  /** The constraint's predicate, ANALYZED against the relation,
    * name-canonicalized and SPLIT into its null-rejecting conjuncts (a
    * passing row has the whole CHECK TRUE-or-NULL; `FALSE AND NULL =
    * FALSE` makes each conjunct individually TRUE-or-NULL, so each
    * licenses drops on its own) — the analyzer runs once per (SQL,
    * schema). */
  private def constraintCanon(sql: String, leaf: LogicalPlan)
      : Seq[Expression] =
    // the ANSI flag keys the memo: analysis bakes failOnError into
    // Divide/Cast, which flips their nullability — and with it the
    // null-rejection license — between modes
    memo.getOrElseUpdate((sql, leaf.schema,
        spark.sessionState.conf.ansiEnabled), scala.util.Try {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val analyzed = spark.sessionState.analyzer
        .execute(Filter(parsed, leaf)) match {
        case Filter(c, _) => c
        case _ => return Nil
      }
      val names = leaf.output.map(a => a.exprId -> a.name).toMap
      canon(analyzed, names).toSeq
        .flatMap(splitConj).filter(nullRejecting)
    }.getOrElse(Nil))

  /** None = unchanged; Some(None) = every conjunct dropped; Some(cond). */
  private def pruned(cond: Expression, child: LogicalPlan)
      : Option[Option[Expression]] = {
    val (cons, names, leaf) = relOf(child).getOrElse(return None)
    val conjs = splitConj(cond)
    if (conjs.size < 2) {
      // a lone conjunct has no IsNotNull companion to license the drop —
      // except when it references nothing nullable... decline (the
      // relation schema is forced nullable); zero cost either way
      return None
    }
    // columns the filter's own IsNotNull conjuncts guarantee (these are
    // never dropped — they are the license)
    val nn: Set[String] = conjs.collect {
      case IsNotNull(a: AttributeReference) if names.contains(a.exprId) =>
        names(a.exprId)
    }.toSet
    if (nn.isEmpty) return None
    lazy val canonCons: Seq[Expression] =
      cons.values.toSeq.flatMap(constraintCanon(_, leaf))
    var dropped = false
    val kept = conjs.filter {
      case IsNotNull(_) => true
      case c =>
        val drop = canon(c, names).exists { qc =>
          qc.references.forall(r => nn.contains(r.name)) &&
            canonCons.exists(k =>
              k.canonicalized.semanticEquals(qc.canonicalized) ||
                implies(k, qc))
        }
        if (drop) dropped = true
        !drop
    }
    if (!dropped) None
    else if (kept.isEmpty) Some(None) // cannot happen (IsNotNull kept)
    else Some(Some(kept.reduce(And)))
  }
}
