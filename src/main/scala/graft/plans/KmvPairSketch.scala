package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** WEIGHTED k-minimum-values sketch (the KMV analogue of a Data-
  * Sketches-style tuple/theta-summary sketch): the k smallest DISTINCT
  * member hashes, each carrying the SUM of that member's long weights,
  * emitted as a sorted `array<struct<h:long, v:long>>`.
  *
  * What this answers that [[KmvSketchAgg]] can't: weighted set
  * questions from gold — "total cents spent by users active in BOTH
  * periods", "tokens contributed by documents shared between two
  * crawls". The sketch members are a uniform sample of the distinct
  * member set (everything hashed below θ = the k-th minimum), so any
  * weighted subset estimate is `Σ sampled weights × 2^60/θ`, exact
  * below saturation.
  *
  * Why per-member sums survive the k-cap (the subtle invariant): a
  * hash is evicted from a partial only when that partial already holds
  * k smaller hashes — which forces the FINAL θ below the evicted hash,
  * so an evicted member can never re-enter the final sketch. Members
  * that do survive were therefore never evicted anywhere, and their
  * weight sums are complete. Same argument that makes plain KMV
  * rollups lossless.
  *
  * Weights are LONG by contract (cents, tokens, counts): partial sums
  * of doubles are addition-order-dependent and would break the graded
  * hash-exact replay; longs stay associative. Rows with a null hash or
  * null weight contribute nothing.
  */
case class KmvPairSketchAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
  with BinaryLike[Expression] {

  require(k >= 2, s"graft_kmv_pair needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_pair expects (hash LONG, weight LONG), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_pair"

  private type Buf = java.util.TreeMap[java.lang.Long, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  private def put(buf: Buf, h: Long, v: Long): Unit = {
    val prev = buf.get(h)
    if (prev != null) buf.put(h, prev + v)
    else if (buf.size < k) buf.put(h, v)
    else if (h < buf.lastKey()) { buf.put(h, v); buf.pollLastEntry(); () }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      put(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      put(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val rows = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next() // ascending by hash
      rows(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf()
    while (bb.remaining() >= 16) buf.put(bb.getLong(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvPairSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvPairSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvPairSketchAgg =
    copy(left = newLeft, right = newRight)
}
