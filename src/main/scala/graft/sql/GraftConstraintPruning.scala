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
  *  - C matches a constraint K EXACTLY (name-canonicalized, constant-
  *    folded `semanticEquals` — the same matching discipline as the MV
  *    rewrite's predicate cover; implication beyond equality declines);
  *  - K is NULL-REJECTING (a chain of null-intolerant operators over
  *    attributes/literals), so on rows where its references are non-null
  *    it cannot evaluate NULL — pass then means TRUE;
  *  - every column K references is guaranteed non-null by a REMAINING
  *    `IsNotNull` conjunct of the same filter (Catalyst's
  *    InferFiltersFromConstraints plants exactly these beside any
  *    null-intolerant comparison, and this rule never drops them).
  * Within the surviving rows the references are non-null, K is non-null,
  * the write-time validation proved it not-false, hence TRUE — and C ≡ K.
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
    * name-canonical expression (None = unresolvable/unusable — cached so
    * a bad constraint costs one analysis, not one per query). */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(String, org.apache.spark.sql.types.StructType), Option[Expression]]

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
    * are non-null (null-intolerant operators over attrs/literals). */
  private def nullRejecting(e: Expression): Boolean = e match {
    case _: AttributeReference | _: Literal => true
    case x => x.nullIntolerant && x.children.forall(nullRejecting)
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
    Some(t.transformDown {
      case x if x.foldable && !x.isInstanceOf[Literal] =>
        Literal.create(x.eval(), x.dataType)
    })
  }

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

  /** The constraint's predicate, ANALYZED against the relation and
    * name-canonicalized — the analyzer runs once per (SQL, schema). */
  private def constraintCanon(sql: String, leaf: LogicalPlan)
      : Option[Expression] =
    memo.getOrElseUpdate((sql, leaf.schema), scala.util.Try {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val analyzed = spark.sessionState.analyzer
        .execute(Filter(parsed, leaf)) match {
        case Filter(c, _) => c
        case _ => return None
      }
      val names = leaf.output.map(a => a.exprId -> a.name).toMap
      canon(analyzed, names).filter(nullRejecting)
    }.toOption.flatten)

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
              k.canonicalized.semanticEquals(qc.canonicalized))
        }
        if (drop) dropped = true
        !drop
    }
    if (!dropped) None
    else if (kept.isEmpty) Some(None) // cannot happen (IsNotNull kept)
    else Some(Some(kept.reduce(And)))
  }
}
