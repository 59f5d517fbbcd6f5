package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-capped min-heap over (score, id). The
  * smallest retained (score, id) sits at the root and is evicted first;
  * ties on score break toward SMALLER id winning (so eviction prefers the
  * larger id), matching `ORDER BY score DESC, id ASC LIMIT k`.
  */
final class TopKBuffer(val k: Int) {
  // min-heap ordered by (score asc, id desc) — root = weakest element
  val heap = new java.util.PriorityQueue[(Double, Long)](k.max(1),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.add((score, id))
    else {
      val root = heap.peek()
      if (java.lang.Double.compare(score, root._1) > 0 ||
          (score == root._1 && id < root._2)) {
        heap.poll(); heap.add((score, id))
      }
    }
  }

  /** Elements ordered by score desc, id asc. */
  def sorted: Array[(Double, Long)] =
    heap.toArray(new Array[(Double, Long)](heap.size))
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

/** `topk(score, id, k)`: aggregate keeping only the k highest-scoring
  * (score, id) pairs, returned as array<struct<score,id>> sorted desc.
  *
  * Why a TypedImperativeAggregate instead of window row_number() ≤ k: the
  * window plan SORTS and SHUFFLES every candidate row; this aggregate's
  * partial buffers cap at k entries per key per partition, so the shuffle
  * carries ≤ k·partitions rows per key regardless of candidate count — the
  * difference between shuffling |corpus|·|queries| scored pairs and
  * shuffling k·partitions·|queries| at 100 TB.
  */
case class TopKAgg(scoreExpr: Expression, idExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  require(k > 0, s"topk k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.heap.size * 16)
    bb.putInt(buf.k).putInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s).putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var j = 0
    while (j < n) { buf.add(bb.getDouble(), bb.getLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKColumns {
  /** `topk(score, id, k)` as an aggregate Column. */
  def topk(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKAgg(
      ExpressionUtils.expression(score),
      ExpressionUtils.expression(id), k).toAggregateExpression())
}
