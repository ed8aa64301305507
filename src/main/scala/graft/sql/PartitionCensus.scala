package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.graft.GraftBatchShim

/** The PARTITION-CENSUS walk, shared by every rule that answers (or
  * prunes) from per-partition manifest facts: descend from a plan node to
  * a census-carrying graft relation through attribute-only (or
  * partition-derived) Projects and partition-column-only Filters, keeping
  * the attribute maps and the filter conjuncts PRE-BOUND to census tuple
  * indices. Consumers: [[GraftMetadataCount]] (census aggregates),
  * [[GraftTopKPruning]] (partition-filtered top-k and derived window
  * group thresholds). */
private[sql] object PartitionCensus {

  /** Everything the census rewrites need, resolved through the walk:
    * the per-partition entries (typed values, live rows, member files),
    * the attribute maps for partition and data columns, the
    * partition-only filter conjuncts PRE-BOUND to census tuple indices,
    * and the relation LEAF itself (the injection point for rules that
    * add predicates rather than answer outright). */
  private[sql] case class CensusInfo(
      census: Seq[(org.apache.spark.sql.catalyst.InternalRow, Long, Seq[String])],
      idxOf: Map[ExprId, Int],
      dataColOf: Map[ExprId, String],
      partSchema: org.apache.spark.sql.types.StructType,
      fileMinMaxOf: (String, String) => Option[Option[(Any, Any)]],
      conds: Seq[Expression],
      /** DERIVED partition values: a computed Project column whose every
        * input is a partition column (`year(event_date) AS yr` — the shape
        * Catalyst pulls grouping expressions into), pre-BOUND to census
        * tuple indices. Constant within a partition by construction, so
        * grouping/min-maxing by it is answerable per census entry. */
      derivedOf: Map[ExprId, Expression],
      leaf: LogicalPlan)

  /** Census walk: attribute-only projections and partition-column-only
    * filters over a census-carrying graft relation; tracks BOTH maps
    * (partition field index and data-column relation name) and binds
    * filter conjuncts at their own level (a Project above may
    * legitimately prune a filter-only column). */
  private[sql] def censusOf(plan: LogicalPlan): Option[CensusInfo] =
    censusOf(plan, _ => false).map(_._1)

  /** The TOLERANT walk: conjuncts that fail partition binding but satisfy
    * `tolerate` are collected (with the walk's info) instead of refusing
    * the whole filter — the mixed-filter top-k's entry point (`WHERE day
    * >= d AND ts >= t`: the day conjunct binds, the ts conjunct is the
    * caller's to reason about). Any other unbindable conjunct still
    * refuses. */
  private[sql] def censusOf(plan: LogicalPlan,
      tolerate: Expression => Boolean): Option[(CensusInfo, Seq[Expression])] =
    GraftBatchShim.graftPartitionCensusOf(plan) match {
      case Some((partSchema, census, fmm)) =>
        val partNames = partSchema.fieldNames
        val idxOf = plan.output.flatMap { a =>
          val i = partNames.indexOf(a.name)
          if (i >= 0) Some(a.exprId -> i) else None
        }.toMap
        val dataColOf = plan.output.flatMap { a =>
          if (partNames.contains(a.name)) None
          else Some(a.exprId -> a.name)
        }.toMap
        Some((CensusInfo(census, idxOf, dataColOf, partSchema, fmm, Nil,
          Map.empty, plan), Nil))
      case None => plan match {
        case Project(items, c) => censusOf(c, tolerate).map {
          case (info, tol) =>
            def remap[A](base: Map[ExprId, A]): Map[ExprId, A] =
              items.flatMap {
                case a: AttributeReference =>
                  base.get(a.exprId).map(a.exprId -> _)
                case al @ Alias(a: AttributeReference, _) =>
                  base.get(a.exprId).map(al.exprId -> _)
                case _ => None // handled below when partition-derivable
              }.toMap
            // a COMPUTED column whose every input is a partition (or
            // already-derived) value binds to the census tuple — the
            // `year(event_date) AS yr` grouping shape; anything touching a
            // data column stays unmapped and its consumers decline
            val derived = items.flatMap {
              case al @ Alias(e, _)
                  if !e.isInstanceOf[AttributeReference] &&
                    e.references.nonEmpty =>
                bindPart(e, info).map(al.exprId -> _)
              case _ => None
            }.toMap
            (info.copy(idxOf = remap(info.idxOf),
              dataColOf = remap(info.dataColOf),
              derivedOf = remap(info.derivedOf) ++ derived), tol)
        }
        case Filter(cond, c)
            if cond.deterministic &&
              !cond.exists(_.isInstanceOf[PlanExpression[_]]) =>
          censusOf(c, tolerate).flatMap { case (info, tol) =>
            def split(e: Expression): Seq[Expression] = e match {
              case And(l, r) => split(l) ++ split(r)
              case x => Seq(x)
            }
            val parts = traverseOpt(split(cond).map { x =>
              bindPart(x, info) match {
                case Some(b) => Some(scala.util.Left(b))
                case None if tolerate(x) => Some(scala.util.Right(x))
                case None => None
              }
            })
            parts.map { ps =>
              (info.copy(conds = info.conds ++
                ps.collect { case scala.util.Left(b) => b }),
                tol ++ ps.collect { case scala.util.Right(x) => x })
            }
          }
        case _ => None
      }
    }

  /** Bind a partition-derivable expression to the census tuple: every
    * referenced attribute must be a partition column (→ BoundReference at
    * its census index) or an already-derived value (→ its own binding);
    * non-deterministic, subquery-carrying, or data-column-touching
    * expressions refuse. The one binder shared by derived Project columns,
    * partition filters, derived group keys, and derived MIN/MAX. */
  private[sql] def bindPart(e: Expression, info: CensusInfo): Option[Expression] =
    if (e.deterministic && !e.exists(_.isInstanceOf[PlanExpression[_]]) &&
        e.references.forall(a => info.idxOf.contains(a.exprId) ||
          info.derivedOf.contains(a.exprId)))
      Some(e.transform {
        case a: AttributeReference if info.derivedOf.contains(a.exprId) =>
          info.derivedOf(a.exprId)
        case a: AttributeReference =>
          BoundReference(info.idxOf(a.exprId), a.dataType, nullable = true)
      })
    else None

  /** The census entries surviving the walk's bound partition filters —
    * the exact file population the consumer may reason over. */
  private[sql] def liveEntries(info: CensusInfo)
      : Seq[(org.apache.spark.sql.catalyst.InternalRow, Long, Seq[String])] = {
    val preds = info.conds.map(Predicate.createInterpreted)
    info.census.filter { case (row, n, _) =>
      n > 0L && preds.forall(_.eval(row)) // null-valued predicate filters
    }
  }

  private[sql] def traverseOpt[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}
