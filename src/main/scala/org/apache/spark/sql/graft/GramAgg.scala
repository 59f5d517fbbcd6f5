package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** `centeredGram(vec, mean)`: the upper-triangle centered Gram (scatter)
  * matrix Σ (x−μ)(x−μ)ᵀ over an `array<float>` column, as ONE
  * d(d+1)/2-double aggregation buffer — the covariance-accumulation shape
  * of MLlib's RowMatrix.computeCovariance (a public, standard design):
  * each partition folds its rows into a single dim²-sized buffer map-side,
  * the shuffle carries one buffer per partition, and only the d×d model
  * reaches the driver. This is the 100 TB way to train a PCA — the
  * alternative (explode to (i, j, xᵢxⱼ) rows and groupBy) multiplies the
  * corpus by d² before the exchange.
  *
  * Determinism contract (the graft snapping discipline, SURVEY §4): each
  * element is first floored onto the 2⁻²⁰ dyadic grid, and each centered
  * product is floored onto the same grid before accumulating. Every
  * buffer entry is therefore a sum of multiples of 2⁻²⁰ with |term| ≤ 4 —
  * exactly representable in a double up to ~2³¹ rows — so partial sums
  * merge EXACTLY regardless of partition order and the trained model is
  * bit-reproducible (which is what lets the driver's oracle inline it as
  * literals). The snapping bias per element is < 2⁻²⁰ ≈ 1e-6 — far below
  * any covariance structure worth a principal component.
  *
  * The mean is passed as a constructor constant (a bounded model step
  * computed in a prior pass), not an expression — two-pass mean-then-
  * scatter keeps both passes' sums exact on the grid.
  */
case class CenteredGramAgg(child: Expression, mean: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  private val d = mean.length
  require(d > 0, "mean must be non-empty")
  @transient private lazy val mu = mean.toArray

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private val Grid = 1048576.0 // 2^20

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](d * (d + 1) / 2)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val a = child.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr.numElements() == d,
      s"expected dim $d, got ${arr.numElements()}")
    val c = new Array[Double](d)
    var i = 0
    while (i < d) {
      c(i) = math.floor(arr.getFloat(i) * Grid) / Grid - mu(i)
      i += 1
    }
    var idx = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        buf(idx) += math.floor(c(i) * c(j) * Grid) / Grid
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 } // exact: dyadics
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CenteredGramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CenteredGramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CenteredGramAgg =
    copy(child = newChildren(0))
}

/** `crossGram(a, b, mean)`: the full (non-symmetric) cross-Gram matrix
  * G = Σ (a−μ)·bᵀ over two `array<float>` columns, as ONE d²-double
  * buffer — the Procrustes statistic of non-parametric OPQ training
  * (Ge et al. 2013: `a` is the centered original vector, `b` its
  * PQ reconstruction in the rotated space; the SVD of G gives the next
  * rotation). Same buffer/merge/determinism design as
  * [[CenteredGramAgg]]: every term is floored onto the 2⁻²⁰ dyadic grid
  * before accumulating, so partials merge exactly in any partition order
  * and the trained rotation is bit-reproducible.
  */
case class CrossGramAgg(left: Expression, right: Expression,
    mean: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  private val d = mean.length
  require(d > 0, "mean must be non-empty")
  @transient private lazy val mu = mean.toArray

  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private val Grid = 1048576.0 // 2^20

  // buffer = d*d gram cells + ONE trailing row counter, so the same
  // n < 2^29 determinism bound Pca.train enforces (exact dyadic merge
  // needs every partial sum below 2^53) is checked HERE too — a future
  // standalone crossGram call past the bound must fail loudly instead of
  // going silently partition-order-dependent (round-11 ADVICE).
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](d * d + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return buf
    buf(d * d) += 1.0 // exact: integer counts are dyadic
    val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ba = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(aa.numElements() == d && ba.numElements() == d,
      s"expected dim $d, got ${aa.numElements()} x ${ba.numElements()}")
    val c = new Array[Double](d)
    val r = new Array[Double](d)
    var i = 0
    while (i < d) {
      c(i) = math.floor(aa.getFloat(i) * Grid) / Grid - mu(i)
      r(i) = ba.getFloat(i).toDouble // float32 is already grid-exact enough
      i += 1
    }
    i = 0
    while (i < d) {
      var j = 0
      val base = i * d
      while (j < d) {
        buf(base + j) += math.floor(c(i) * r(j) * Grid) / Grid
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 } // exact: dyadics
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val n = buf(d * d).toLong
    require(n < (1L << 29),
      s"crossGram determinism bound exceeded: n=$n >= 2^29 rows — train on " +
        "a sample or use a Long-unit gram buffer")
    new GenericArrayData(java.util.Arrays.copyOf(buf, d * d))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CrossGramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CrossGramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CrossGramAgg =
    copy(left = newChildren(0), right = newChildren(1))
}

object GramColumns {
  /** `centeredGram(vec, mean)` as an aggregate Column (upper triangle,
    * row-major, d(d+1)/2 doubles).
    */
  def centeredGram(vec: Column, mean: Seq[Double]): Column =
    ExpressionUtils.column(CenteredGramAgg(
      ExpressionUtils.expression(vec), mean).toAggregateExpression())

  /** `crossGram(a, b, mean)` as an aggregate Column (full d×d, row-major
    * on the centered-`a` index).
    */
  def crossGram(a: Column, b: Column, mean: Seq[Double]): Column =
    ExpressionUtils.column(CrossGramAgg(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      mean).toAggregateExpression())
}
