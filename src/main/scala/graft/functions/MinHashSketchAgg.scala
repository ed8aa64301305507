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


  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => ("#" + i).getBytes(StandardCharsets.UTF_8))

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      // md5(s ++ salt) fed incrementally: one UTF-8 encode per row, no
      // per-hash string concatenation
      val sBytes = v.toString.getBytes(StandardCharsets.UTF_8)
      val md = MinHashSketchAgg.digests.get()
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(sBytes)
        md.update(salts(i))
        val h = MinHashSketchAgg.toHex(md.digest())
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

  private[functions] val HexChars = "0123456789abcdef".toCharArray

  private[functions] def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** MessageDigest.getInstance per row dominated the aggregate's cost;
    * MessageDigest is not thread-safe, so one instance per task thread. */
  private[functions] val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The exact hash the KMV sketches store for a value's canonical string
    * — exposed so plan-time consumers (the dictionary-complete equality
    * pruner in [[graft.sources.DataSkipping]]) can probe membership with
    * the producer's own recipe. */
  private[graft] def md5Hex(s: String): String = {
    val md = digests.get()
    md.reset()
    md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    toHex(md.digest())
  }

  /** The VALUE-BASED canonical string the KMV sketches hash. Plain
    * toString is value-based for every atomic internal type EXCEPT
    * binary — Array[Byte].toString is the instance identity, which would
    * make sketches on binary columns per-row noise (useless NDV) and,
    * worse, let the dictionary pruner wrongly skip a file that holds the
    * probed bytes. Base64 makes binary values compare by content. */
  private[graft] def canonical(v: Any): String = v match {
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case x => x.toString
  }
}
