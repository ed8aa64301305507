package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen character-trigram extraction as packed long codes:
  * for input CODE POINTS cp[0..n-1], element i is
  * `(cp[i]<<42) | (cp[i+1]<<21) | cp[i+2]` — each code point is ≤ 0x10FFFF
  * (21 bits), so the packing is INJECTIVE and fits a positive signed long.
  * Grouping/joining on the code is exactly grouping/joining on the
  * character-trigram string — for ALL text, not just ASCII — without
  * materializing one UTF8String per position. The first-two-characters
  * prefix of a trigram is `code >>> 21` (drop the last code point), the
  * packed form of `substring(tri, 1, 2)`.
  *
  * Code-point (not byte) windows match SQL character semantics: DuckDB's
  * `substr`/`length` count Unicode code points, so an oracle formulated as
  * `substr(text, i, 3)` agrees with this expression on any corpus,
  * including multi-byte UTF-8 (the byte-window formulation this replaced
  * silently diverged off-ASCII). The reference-LM scoring path
  * (q_lm_typicality) explodes ~30 trigrams per 100 characters of corpus;
  * the `transform(sequence(...), i -> substring(text, i, 3))` formulation
  * allocates a fresh UTF8String per trigram (~150M allocations at sf0.1)
  * and hash-joins on string keys. This expression emits a primitive
  * UnsafeArrayData of longs; the downstream model join becomes a
  * long-keyed broadcast hash join.
  *
  * Strings with fewer than 3 code points yield an empty array (exploding
  * drops the document, the same contract as the oracle's
  * `length(text) >= 3`).
  */
case class CharTrigramCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CharTrigramCodes requires a string input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    CharTrigramCodes.packTrigrams(v.asInstanceOf[UTF8String])

  // one static call per row; the decode/pack loop JITs inside the helper,
  // so the expression stays inside the whole-stage-codegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharTrigramCodes.packTrigrams($a);")

  override protected def withNewChildInternal(newChild: Expression): CharTrigramCodes =
    copy(child = newChild)
}

object CharTrigramCodes {
  def apply(c: Column): Column = Bridge.column(CharTrigramCodes(Bridge.expression(c)))

  /** Decode UTF-8 once into code points, then emit one packed long per
    * 3-code-point window. Single O(bytes) pass, two primitive arrays, no
    * per-trigram object allocation. Malformed sequences (impossible for
    * Spark-produced strings, which are valid UTF-8 by contract) decode
    * defensively as one code point per byte rather than throwing.
    */
  def packTrigrams(s: UTF8String): UnsafeArrayData = {
    val b = s.getBytes
    val cps = new Array[Int](b.length) // upper bound: 1 cp per byte
    var i = 0
    var k = 0
    while (i < b.length) {
      val lead = b(i) & 0xFF
      var cp = lead
      var len = 1
      if (lead >= 0xC0 && lead < 0xE0) { len = 2; cp = lead & 0x1F }
      else if (lead >= 0xE0 && lead < 0xF0) { len = 3; cp = lead & 0x0F }
      else if (lead >= 0xF0 && lead < 0xF8) { len = 4; cp = lead & 0x07 }
      if (i + len > b.length) { cp = lead; len = 1 } // truncated tail: defensive
      var j = 1
      while (j < len) {
        cp = (cp << 6) | (b(i + j) & 0x3F)
        j += 1
      }
      cps(k) = cp
      k += 1
      i += len
    }
    val n = math.max(0, k - 2)
    val out = new Array[Long](n)
    var t = 0
    while (t < n) {
      out(t) = (cps(t).toLong << 42) | (cps(t + 1).toLong << 21) | cps(t + 2).toLong
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
