package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Whole-stage-codegen dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),...)`)
  * allocates an intermediate array and evaluates an interpreted lambda per
  * element — ~two orders of magnitude slower in the all-pairs similarity hot
  * path. This expression generates a tight primitive loop (no allocation, no
  * boxing) inside whole-stage codegen, with an identical sequential
  * accumulation order, so results are bit-equal to the HOF version and to the
  * DuckDB oracle's list_sum(list_transform(...)).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // a null ELEMENT makes the product undefined → the whole result is null,
  // matching the HOF formulation (aggregate over zip_with propagates null)
  override def nullable: Boolean = super.nullable || mayHaveNullElements

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType) match {
      case Seq(ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"ArrayDotProduct requires two array<double> inputs, got ${other.mkString(", ")}")
    }

  private def mayHaveNullElements: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // the per-element null branch is emitted only when the input types
      // admit null elements, so vector columns cast with containsNull=false
      // keep the tight branch-free loop
      val nullCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  def apply(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
