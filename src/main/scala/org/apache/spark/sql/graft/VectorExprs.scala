package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math. Lives under
  * org.apache.spark.sql because Expression↔Column bridging
  * (classic.ExpressionUtils) and AbstractDataType are private[sql];
  * user-facing wrappers are re-exported from graft.functions.vectors.
  *
  * Why not a Scala UDF: a UDF forces deserialization of the float array into
  * a Scala collection per row and breaks whole-stage codegen. These
  * expressions read the unsafe ArrayData in place and emit a tight Java loop
  * via doGenCode, so a brute-force scan over 10^9 vectors stays in one
  * codegen stage. Accumulation is double-precision regardless of the float
  * storage — deterministic per row (no reduction across rows).
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // dimension mismatch (malformed embedding) yields NULL, not a truncated
  // plausible-but-wrong similarity — corrupt data must fail loudly
  override def nullable: Boolean = true
}

/** Cosine similarity of two float vectors (0.0 if either has zero norm,
  * NULL on dimension mismatch).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xi = (double) $a.getFloat($i);
         |    double yi = (double) $b.getFloat($i);
         |    $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
         |  }
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float vectors (NULL on dimension mismatch). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Static kernels for int8 embedding quantization — 4x smaller storage/IO
  * for a 100 TB embedding store, with per-vector symmetric scaling
  * (scale = max|x|/127; error per element ≤ scale/2).
  */
object VectorKernels {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0f
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127f
    val q = new Array[Byte](n)
    if (scale > 0f) {
      i = 0
      while (i < n) {
        q(i) = math.round(arr.getFloat(i) / scale).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, q))
  }

  def dequantize(row: InternalRow): ArrayData = {
    val scale = row.getFloat(0)
    val q = row.getBinary(1)
    val out = new Array[Any](q.length)
    var i = 0
    while (i < q.length) { out(i) = q(i) * scale; i += 1 }
    new GenericArrayData(out)
  }
}

/** `vec_quantize(emb)`: per-vector symmetric int8 quantization →
  * struct<scale float, q binary> (dim + 4 bytes vs 4·dim — the storage
  * format for an embedding column at 100 TB; round-trip error per element
  * is ≤ scale/2, cosine error O(1/127)).
  */
case class VecQuantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("q", BinaryType, nullable = false)))

  override def nullSafeEval(a: Any): Any =
    VectorKernels.quantize(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.VectorKernels.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): VecQuantize =
    copy(child = newChild)
}

/** `vec_dequantize(qstruct)`: int8 → float array (inverse of vec_quantize
  * up to the ≤ scale/2 per-element rounding).
  */
case class VecDequantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("q", BinaryType, nullable = false))))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    VectorKernels.dequantize(
      a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.VectorKernels.dequantize($c)")

  override protected def withNewChildInternal(newChild: Expression): VecDequantize =
    copy(child = newChild)
}

object VectorColumns {
  /** `cosine_sim(a, b)` as a Column (codegen'd, double-accumulated). */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** `dot(a, b)` as a Column. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** `vec_quantize(emb)` as a Column. */
  def quantize(emb: Column): Column =
    ExpressionUtils.column(VecQuantize(ExpressionUtils.expression(emb)))

  /** `vec_dequantize(q)` as a Column. */
  def dequantize(q: Column): Column =
    ExpressionUtils.column(VecDequantize(ExpressionUtils.expression(q)))
}
