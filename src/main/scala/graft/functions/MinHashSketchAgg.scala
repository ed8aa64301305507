package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable MinHash sketch as a custom `TypedImperativeAggregate` — the
  * engine-grade form of a sketch aggregate (mutable buffer, partial/final
  * merge, serialized between stages), per SURVEY.md §7.3's "mergeable
  * distinct sketches" extension point.
  *
  * The sketch is `numHashes` salted-md5 minima over the aggregated strings;
  * two sketches merge by element-wise minimum, so partial aggregation,
  * AQE re-planning, and incremental/resumable computation all compose —
  * exactly the property a 100 TB dedup pipeline needs to avoid re-reading
  * history (store the per-partition sketch column, merge on read).
  *
  * eval() returns the signature as a '|'-joined string, identical to the
  * expression formulation min(md5(concat(x, '#i'))) — the DuckDB oracle
  * reproduces it verbatim.
  */
case class MinHashSketchAgg(
    child: Expression,
    numHashes: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def createAggregationBuffer(): Array[String] =
    Array.fill[String](numHashes)(null)

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var i = 0
      while (i < numHashes) {
        val h = md5hex(s + "#" + i)
        if (buf(i) == null || h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[String], b2: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (b1(i) == null || (b2(i) != null && b2(i) < b1(i))) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[String]): Any =
    if (buf.forall(_ == null)) null
    else UTF8String.fromString(buf.mkString("|"))

  override def serialize(buf: Array[String]): Array[Byte] =
    buf.map(v => if (v == null) "" else v).mkString(",").getBytes(StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, StandardCharsets.UTF_8)
      .split(",", -1).map(v => if (v.isEmpty) null else v)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)
}

object MinHashSketchAgg {
  /** Column-API form: `minhash_sketch(col, k)`. */
  def apply(c: Column, numHashes: Int): Column =
    Bridge.column(
      MinHashSketchAgg(Bridge.expression(c), numHashes).toAggregateExpression())
}
