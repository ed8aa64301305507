package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native backward as-of join — the whole-operator extension stack:
  * custom `LogicalPlan` node → `SparkStrategy` → `SparkPlan` with a
  * streaming per-partition merge.
  *
  * Semantics (identical to operators/AsOfJoin.backward, which composes
  * built-ins): for each left row, attach the payload of the most recent
  * right row with the same key and rightTime <= leftTime; null payload when
  * none exists.
  *
  * Physical shape: both children are hash-clustered on the join key and
  * sorted by (key, time) — declared via requiredChildDistribution/Ordering
  * so EnsureRequirements plans exactly one co-partitioned exchange+sort per
  * side — then a single forward merge pass per partition: O(n log n) in the
  * sort, O(n) merge, O(1) state (one buffered right row). No candidate-pair
  * materialization, so it scales to arbitrarily dense right sides where the
  * window-based formulation must materialize the union.
  *
  * The logical node carries column NAMES, not Attributes: analyzer rules
  * (DeduplicateRelations in particular, on self-joins) rewrite child
  * exprIds without visiting a custom node's non-standard fields, so
  * attributes are resolved from the children lazily (output) and at
  * planning time (strategy), after every rewrite has happened.
  */
object NativeAsOfJoin {

  // --------------------------------------------------------------------------
  // logical node (name-based; see note above)
  // --------------------------------------------------------------------------
  final case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]) extends BinaryNode {

    def rightAttr(name: String): Attribute =
      right.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"right column $name not found"))
    def leftAttr(name: String): Attribute =
      left.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"left column $name not found"))

    override def output: Seq[Attribute] =
      left.output ++ rightPayload.map(rightAttr(_).withNullability(true))

    /** Name-based fields mean the default (expression-derived) references
      * are empty, which would let ColumnPruning strip the join keys/time
      * out of the children. Declare them explicitly. */
    override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      if (!childrenResolved) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
      else org.apache.spark.sql.catalyst.expressions.AttributeSet(
        keys.map(leftAttr) ++ keys.map(rightAttr) ++
          Seq(leftAttr(leftTime), rightAttr(rightTime)) ++ rightPayload.map(rightAttr))

    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  // --------------------------------------------------------------------------
  // physical operator
  // --------------------------------------------------------------------------
  final case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTime: Attribute,
      rightTime: Attribute,
      rightPayload: Seq[Attribute],
      output: Seq[Attribute]) extends BinaryExecNode {

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeyIdx = leftKeys.map(a => lOut.indexWhere(_.exprId == a.exprId))
      val rKeyIdx = rightKeys.map(a => rOut.indexWhere(_.exprId == a.exprId))
      val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
      val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
      require((lKeyIdx :+ lTimeIdx).forall(_ >= 0) && (rKeyIdx :+ rTimeIdx).forall(_ >= 0),
        "as-of join columns missing from child output")
      val keyTypes = leftKeys.map(_.dataType)
      val timeType = leftTime.dataType
      val payloadAttrs = rightPayload
      val nPayload = payloadAttrs.length

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val keyOrds = keyTypes.map(t => PhysicalDataType.ordering(t)
          .asInstanceOf[Ordering[Any]])
        val timeOrd = PhysicalDataType.ordering(timeType).asInstanceOf[Ordering[Any]]
        val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
        val nullPayload = new GenericInternalRow(nPayload)
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(output, lOut ++ payloadAttrs)

        def cmpKeys(l: InternalRow, r: InternalRow): Int = {
          var i = 0
          while (i < lKeyIdx.length) {
            val lv = l.get(lKeyIdx(i), keyTypes(i))
            val rv = r.get(rKeyIdx(i), keyTypes(i))
            val c =
              if (lv == null && rv == null) 0
              else if (lv == null) -1
              else if (rv == null) 1
              else keyOrds(i).compare(lv, rv)
            if (c != 0) return c
            i += 1
          }
          0
        }
        def cmpTime(l: InternalRow, r: InternalRow): Int = {
          val lv = l.get(lTimeIdx, timeType)
          val rv = r.get(rTimeIdx, timeType)
          if (lv == null && rv == null) 0
          else if (lv == null) -1
          else if (rv == null) 1
          else timeOrd.compare(lv, rv)
        }
        // SQL join semantics: nulls never match. A right row with a null key
        // or null time can never be anyone's "most recent match" — skip it
        // during the merge (null keys/times sort first under Ascending, so
        // skipping preserves the merge order). Left rows with a null key fall
        // out naturally: no surviving right row can compare equal to them.
        def rInvalid(r: InternalRow): Boolean = {
          var i = 0
          while (i < rKeyIdx.length) {
            if (r.isNullAt(rKeyIdx(i))) return true
            i += 1
          }
          r.isNullAt(rTimeIdx)
        }

        new Iterator[InternalRow] {
          private var rBuffered: InternalRow =
            if (rIter.hasNext) rIter.next().copy() else null
          private var lastMatch: InternalRow = null          // latest payload
          private var lastMatchKeySource: InternalRow = null // its key holder

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            var advancing = true
            while (advancing && rBuffered != null) {
              if (rInvalid(rBuffered)) {
                rBuffered = if (rIter.hasNext) rIter.next().copy() else null
              } else {
                val kc = cmpKeys(l, rBuffered)
                if (kc > 0 || (kc == 0 && cmpTime(l, rBuffered) >= 0)) {
                  if (kc == 0) {
                    lastMatch = payloadProj(rBuffered).copy()
                    lastMatchKeySource = rBuffered
                  }
                  rBuffered = if (rIter.hasNext) rIter.next().copy() else null
                } else advancing = false
              }
            }
            val payload =
              if (lastMatchKeySource != null && cmpKeys(l, lastMatchKeySource) == 0)
                lastMatch
              else nullPayload
            outProj(joined(l, payload))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  // --------------------------------------------------------------------------
  // strategy + registration
  // --------------------------------------------------------------------------
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: AsOfJoinPlan =>
        AsOfJoinExec(planLater(p.left), planLater(p.right),
          p.keys.map(p.leftAttr), p.keys.map(p.rightAttr),
          p.leftAttr(p.leftTime), p.rightAttr(p.rightTime),
          p.rightPayload.map(p.rightAttr), p.output) :: Nil
      case _ => Nil
    }
  }

  /** Idempotently register the planner strategy + pushdown rule on an
    * existing session. */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations = opts :+ PushFilterThroughAsOfJoin
  }

  // --------------------------------------------------------------------------
  // user-facing API
  // --------------------------------------------------------------------------
  /** @param rightPayload right column → output alias (other right columns
    *                     are dropped). */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = left.sparkSession
    register(spark)
    // pre-project the right side: keys + renamed time + aliased payload only
    val rightSel = right.select(
      (keys.map(col) :+ col(rightTime).as("__asof_rt")) ++
        rightPayload.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
    val node = AsOfJoinPlan(
      Bridge.analyzedPlan(left), Bridge.analyzedPlan(rightSel),
      keys, leftTime, "__asof_rt", rightPayload.values.toSeq)
    Bridge.ofRows(spark, node)
  }
}

/** Builder-time registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)...` */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => NativeAsOfJoin.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
  }
}
