package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) approximate-distinct sketch as a mergeable
  * `TypedImperativeAggregate` — the deterministic counterpart to HLL++
  * (SURVEY.md §7.3 "mergeable distinct sketches"). Where
  * `approx_count_distinct`'s HLL registers are engine-specific and therefore
  * oracle-hostile, a KMV estimate is a pure function of the k smallest md5
  * hashes of the values — DuckDB replicates it verbatim with a ROW_NUMBER
  * window over distinct hashes, so the estimate (not just the row count)
  * hash-checks against the oracle.
  *
  * Estimator: with fewer than k distinct hashes the sketch IS the exact
  * distinct set (estimate = size); at k it is the classic
  * `floor((k-1) / U(k))` with U(k) = kth-smallest hash normalized by 2^52
  * (13 hex digits — exactly representable in a double, so both engines
  * divide the same two exact integers and agree bit-for-bit).
  *
  * Scale: the buffer is a bounded TreeSet (≤ k hex strings); merge is a
  * bounded set-union keeping the k smallest — partial aggregation, AQE
  * re-planning, and store-the-sketch-per-partition all compose, the same
  * properties that make HLL the 100 TB tool for this job.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  override def update(
      buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val md = MinHashSketchAgg.digests.get()
      md.reset()
      md.update(MinHashSketchAgg.canonical(v).getBytes(StandardCharsets.UTF_8))
      val h = MinHashSketchAgg.toHex(md.digest())
      // skip values that can't enter a full sketch — keeps the hot path
      // allocation-free once the stream saturates k
      if (buf.size < k || h < buf.last()) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(
      b1: java.util.TreeSet[String],
      b2: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b1.size < k || h < b1.last()) {
        b1.add(h)
        if (b1.size > k) b1.pollLast()
      }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[String]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // kth-smallest hash as the top 52 bits (13 hex digits): exact in a
      // double, so floor((k-1)*2^52 / v) is bit-identical across engines
      val v = java.lang.Long.parseLong(buf.last().substring(0, 13), 16) max 1L
      math.floor((k - 1).toDouble * KmvSketchAgg.Normalizer / v).toLong
    }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new StringBuilder(buf.size * 33)
    val it = buf.iterator()
    while (it.hasNext) { sb.append(it.next()); if (it.hasNext) sb.append(',') }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val out = new java.util.TreeSet[String]()
    val s = new String(bytes, StandardCharsets.UTF_8)
    if (s.nonEmpty) s.split(",").foreach(out.add)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  /** 2^52 — the hash-space size of 13 hex digits. */
  val Normalizer: Double = 4503599627370496.0

  /** Column-API form: `kmv_distinct(col, k)`. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(c), k).toAggregateExpression())

  /** The [[KmvSketchAgg]] estimator applied to an already-merged sketch
    * (the k smallest hex hashes, sorted ascending) — what plan-time
    * consumers run after unioning per-file sketches from the manifest. */
  def estimate(sketch: Seq[String], k: Int): Long =
    if (sketch.size < k) sketch.size.toLong
    else {
      val v = java.lang.Long.parseLong(
        sketch(k - 1).substring(0, 13), 16) max 1L
      math.floor((k - 1).toDouble * Normalizer / v).toLong
    }

  /** Union per-sketch hash sets keeping the k smallest — the mergeable-
    * sketch property that lets per-FILE sketches in the manifest answer
    * table-level (or pruned-subset-level) NDV at plan time. */
  def merge(sketches: Iterable[Seq[String]], k: Int): Seq[String] = {
    val set = new java.util.TreeSet[String]()
    sketches.foreach(_.foreach { h =>
      if (set.size < k || h < set.last()) {
        set.add(h)
        if (set.size > k) set.pollLast()
      }
    })
    import scala.jdk.CollectionConverters._
    set.iterator().asScala.toSeq
  }
}

/** The sketch ITSELF (k smallest md5 hex hashes, sorted ascending) as an
  * aggregate value — the write-side producer for manifest-persisted NDV
  * sketches ([[KmvSketchAgg]] is the same buffer evaluated to an estimate;
  * this returns the mergeable representation so per-file sketches can be
  * unioned at plan time). */
case class KmvHashesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  private val impl = KmvSketchAgg(child, k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    impl.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[String],
      input: InternalRow): java.util.TreeSet[String] = impl.update(buf, input)
  override def merge(b1: java.util.TreeSet[String],
      b2: java.util.TreeSet[String]): java.util.TreeSet[String] =
    impl.merge(b1, b2)

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val arr = new Array[org.apache.spark.unsafe.types.UTF8String](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] =
    impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] =
    impl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvHashesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvHashesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvHashesAgg =
    copy(child = newChildren.head)
}

object KmvHashesAgg {
  /** Column-API form: the sorted k-smallest-hash sketch of `c`. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(KmvHashesAgg(Bridge.expression(c), k).toAggregateExpression())
}
