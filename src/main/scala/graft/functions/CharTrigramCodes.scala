package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Whole-stage-codegen character-trigram extraction as packed int codes:
  * for input bytes b[0..n-1], element i is
  * `(b[i]<<16) | (b[i+1]<<8) | b[i+2]` over the UTF-8 bytes — an INJECTIVE
  * encoding of the trigram, so grouping/joining on the code is exactly
  * grouping/joining on the trigram string, without materializing one
  * UTF8String per position.
  *
  * The reference-LM scoring path (q_lm_typicality) explodes ~30 trigrams
  * per 100 characters of corpus; the `transform(sequence(...), i ->
  * substring(text, i, 3))` formulation allocates a fresh UTF8String per
  * trigram (~150M allocations at sf0.1) and hash-joins on string keys.
  * This expression emits a tight primitive loop producing an
  * UnsafeArrayData of ints; the downstream model join becomes an int-keyed
  * broadcast hash join. Byte trigrams equal character trigrams for ASCII
  * text (the gate corpus); for multi-byte UTF-8 the window is byte-aligned
  * — callers that need char alignment on non-ASCII text keep the substring
  * formulation.
  *
  * Strings shorter than 3 bytes yield an empty array (exploding drops the
  * document, the same contract as the oracle's `length(text) >= 3`).
  */
case class CharTrigramCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CharTrigramCodes requires a string input, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = math.max(0, b.length - 2)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((b(i) & 0xFF) << 16) | ((b(i + 1) & 0xFF) << 8) | (b(i + 2) & 0xFF)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |byte[] $b = $a.getBytes();
         |int $n = java.lang.Math.max(0, $b.length - 2);
         |int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (($b[$i] & 0xFF) << 16) | (($b[$i + 1] & 0xFF) << 8)
         |    | ($b[$i + 2] & 0xFF);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharTrigramCodes =
    copy(child = newChild)
}

object CharTrigramCodes {
  def apply(c: Column): Column = Bridge.column(CharTrigramCodes(Bridge.expression(c)))
}
