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

/** Euclidean (L2) distance of two float vectors (NULL on dimension
  * mismatch) — the metric product quantization approximates.
  */
case class EuclideanDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EuclideanDistance =
    copy(left = newLeft, right = newRight)
}

/** Model-array holder with STRUCTURAL equality. The expressions below are
  * case classes; a raw `Array[Float]` field compares by reference, so two
  * semantically identical expressions built from equal-but-distinct arrays
  * would never be `semanticEquals` — canonicalization, common-subexpression
  * elimination, and exchange reuse across a self-join would silently miss.
  * The array is owned by the model-training code and never mutated after
  * construction.
  */
final class FloatModel(val data: Array[Float]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case f: FloatModel => java.util.Arrays.equals(data, f.data)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(data)
  override def toString: String = s"FloatModel(len=${data.length})"
}

/** Double-array analog of [[FloatModel]] (quantile cut boundaries etc.). */
final class DoubleModel(val data: Array[Double]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case d: DoubleModel => java.util.Arrays.equals(data, d.data)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(data)
  override def toString: String = s"DoubleModel(len=${data.length})"
}

object BucketKernels {
  /** Number of cuts strictly less than v over the SORTED cut array — the
    * bucket index of an order-preserving range partitioning. Binary search:
    * a chained `when(v > c1).. when(v > cN)` formulation is O(cuts) per row
    * and bloats codegen at large bucket counts; this is O(log cuts) in one
    * tight loop.
    */
  def bucketOf(v: Double, cuts: Array[Double]): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v > cuts(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** `bucket_of(x)`: index of x among the inlined sorted cut boundaries —
  * range-bucket assignment for two-phase global windows (Packing). Cuts are
  * carried as a codegen reference object, not literals.
  */
case class BucketBySortedCuts(child: Expression, cuts: DoubleModel)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any =
    BucketKernels.bucketOf(a.asInstanceOf[Double], cuts.data)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketcuts", cuts.data, "double[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.BucketKernels.bucketOf($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BucketBySortedCuts = copy(child = newChild)
}

/** Static kernels for product quantization: M subspaces × ksub centroids,
  * each vector stored as M byte codes (e.g. 64-dim float = 256 bytes →
  * 8 bytes at M=8: 32x compression). Codebooks are flattened m-major
  * ([m][k][subdim]) float arrays — tiny driver-held models inlined into
  * the expressions as reference objects.
  */
object PqKernels {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Fail loudly on model/vector shape mismatch: computing the subspace
    * width from the ROW's length would quantize a corrupt wrong-dimension
    * vector against misaligned codebook slices and emit plausible garbage
    * codes (or read past the codebook) with no error.
    */
  private def checkShape(n: Int, cb: Array[Float], m: Int, ksub: Int): Unit = {
    require(n > 0 && n % m == 0 && cb.length == ksub * n,
      s"PQ shape mismatch: vector dim $n vs codebook for dim ${cb.length / ksub} " +
        s"(m=$m, ksub=$ksub) — corrupt embedding or wrong model")
  }

  /** Nearest sub-centroid per subspace → one code byte each. */
  def encode(arr: ArrayData, cb: Array[Float], m: Int, ksub: Int): Array[Byte] = {
    val dim = arr.numElements()
    checkShape(dim, cb, m, ksub)
    val sub = dim / m
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < ksub) {
        var acc = 0.0
        var d = 0
        val base = (mi * ksub + k) * sub
        while (d < sub) {
          val diff = arr.getFloat(mi * sub + d).toDouble - cb(base + d)
          acc += diff * diff
          d += 1
        }
        if (acc < bestD) { bestD = acc; best = k }
        k += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Per-query lookup table: squared L2 from the query's subvector to
    * every sub-centroid — M·ksub floats, computed once per query row.
    */
  def lut(arr: ArrayData, cb: Array[Float], m: Int, ksub: Int): ArrayData = {
    val dim = arr.numElements()
    checkShape(dim, cb, m, ksub)
    val sub = dim / m
    val out = new Array[Any](m * ksub)
    var mi = 0
    while (mi < m) {
      var k = 0
      while (k < ksub) {
        var acc = 0.0
        var d = 0
        val base = (mi * ksub + k) * sub
        while (d < sub) {
          val diff = arr.getFloat(mi * sub + d).toDouble - cb(base + d)
          acc += diff * diff
          d += 1
        }
        out(mi * ksub + k) = acc.toFloat
        k += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Codebook reconstruction: codes → the concatenated sub-centroids.
    * The training-loop inverse of [[encode]] (Procrustes needs the
    * reconstruction each iteration); at serving time ADC makes decoding
    * unnecessary.
    */
  def decode(codes: Array[Byte], cb: Array[Float], m: Int,
      ksub: Int): ArrayData = {
    require(codes.length == m && cb.length % (ksub * m) == 0,
      s"PQ decode mismatch: ${codes.length}-byte codes vs m=$m, " +
        s"codebook ${cb.length} (ksub=$ksub)")
    val sub = cb.length / (ksub * m)
    val out = new Array[Any](m * sub)
    var mi = 0
    while (mi < m) {
      val base = (mi * ksub + (codes(mi) & 0xff)) * sub
      var d = 0
      while (d < sub) {
        out(mi * sub + d) = cb(base + d)
        d += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** OPQ rotation kernel: out[j] = float32 of the snapped-grid inner
    * product Σ_i floor((x_i − mean_j?i) · R_{j,i} · 2²⁰)/2²⁰. Each term is
    * a dyadic multiple of 2⁻²⁰ with |term| ≤ 2, so the 64-term sum is
    * EXACT in any association — the Pca.projectionCols discipline, which
    * is what lets the rotated vectors (and everything PQ computes from
    * them) replay bit-for-bit in the DuckDB oracle. `rot` is row-major
    * [outDim][inDim] — RECTANGULAR matrices are allowed (outDim =
    * rot.length / inDim), so the same kernel serves the square OPQ
    * rotation and the k×d PCA projection-to-serving-dims;
    * orthonormality of the rows is the trainer's contract, not checked
    * here.
    */
  def opqRotate(arr: ArrayData, mean: Array[Double],
      rot: Array[Double]): ArrayData = {
    val d = arr.numElements()
    require(mean.length == d && rot.length % d == 0 && rot.length > 0,
      s"OPQ shape mismatch: vector dim $d vs mean ${mean.length} / " +
        s"rot ${rot.length} — corrupt embedding or wrong model")
    val outDim = rot.length / d
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      val base = j * d
      var i = 0
      while (i < d) {
        acc += math.floor((arr.getFloat(i).toDouble - mean(i)) *
          rot(base + i) * 1048576.0) / 1048576.0
        i += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance computation: Σ_m lut[m·ksub + code[m]] ≈ squared
    * L2(query, vector) — M lookups, no float math per corpus row.
    */
  def adc(codes: Array[Byte], lutArr: ArrayData, ksub: Int): Double = {
    // a LUT from a mismatched model would read out of bounds — and
    // UnsafeArrayData.getFloat does NOT bounds-check, so this would be
    // silent garbage, not an exception
    require(lutArr.numElements() == codes.length * ksub,
      s"PQ ADC mismatch: ${codes.length}-byte codes vs " +
        s"${lutArr.numElements()}-entry LUT (ksub=$ksub) — codes and LUT " +
        "come from different models")
    var acc = 0.0
    var mi = 0
    while (mi < codes.length) {
      acc += lutArr.getFloat(mi * ksub + (codes(mi) & 0xff))
      mi += 1
    }
    acc
  }
}

/** Static kernel + expression for IVF cell assignment: argmax-cosine over
  * a centroid matrix carried as a codegen reference object — inlining
  * nCells×dim float literals into the projection (the `array(struct(...))`
  * argmax formulation) bloats generated code and re-materializes the
  * centroids per call site.
  */
object IvfKernels {
  /** Index of the max-cosine centroid; `cents` is row-major [cell][dim]. */
  def argmaxCosine(arr: ArrayData, cents: Array[Float], nCells: Int): Int = {
    val dim = arr.numElements()
    require(dim > 0 && cents.length == nCells * dim,
      s"IVF shape mismatch: vector dim $dim vs centroid matrix for dim " +
        s"${if (nCells > 0) cents.length / nCells else 0} (nCells=$nCells)")
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < nCells) {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      val base = c * dim
      while (i < dim) {
        val x = arr.getFloat(i).toDouble
        val y = cents(base + i).toDouble
        dot += x * y; nx += x * x; ny += y * y
        i += 1
      }
      val s = if (nx == 0.0 || ny == 0.0) 0.0
        else dot / (math.sqrt(nx) * math.sqrt(ny))
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  /** Residual against a GIVEN cell's centroid: emb − cents[cell], in
    * FLOAT32 (float − float per element — both the DuckDB oracle's
    * FLOAT[] subtraction and Spark's zip_with on float columns compute
    * the identical IEEE float32 value, which is what keeps the residual
    * PQ path exactly replayable). The serving path feeds this the
    * already-computed cell column so the nCells×dim argmax runs ONCE per
    * row, not once per consumer.
    */
  def residualAt(arr: ArrayData, cell: Int, cents: Array[Float]): ArrayData = {
    val dim = arr.numElements()
    require(cell >= 0 && (cell + 1) * dim <= cents.length,
      s"IVF residual: cell $cell out of range for a ${cents.length / math.max(dim, 1)}-cell model")
    val out = new Array[Float](dim)
    val base = cell * dim
    var i = 0
    while (i < dim) {
      out(i) = arr.getFloat(i) - cents(base + i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Residual against the argmax-cosine centroid (standalone form — runs
    * its own argmax; prefer [[residualAt]] with a shared cell column when
    * the plan also needs the cell id). */
  def residual(arr: ArrayData, cents: Array[Float], nCells: Int): ArrayData =
    residualAt(arr, argmaxCosine(arr, cents, nCells), cents)
}

/** `ivf_residual(emb)`: emb − centroid[argmax cell] — the vector the
  * residual-PQ index quantizes (IVFADC with residual encoding, Jégou et
  * al. 2011 §IV.A: quantizing the residual instead of the raw vector
  * centers the PQ codebook's domain on the cell, cutting quantization
  * error).
  */
case class IvfResidual(child: Expression, cents: FloatModel, nCells: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(nCells >= 1, s"ivf_residual needs nCells >= 1, got $nCells")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    IvfKernels.residual(a.asInstanceOf[ArrayData], cents.data, nCells)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfcents", cents.data, "float[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.IvfKernels.residual($c, $ref, $nCells)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfResidual =
    copy(child = newChild)
}

/** `ivf_residual_at(emb, cell)`: emb − centroid[cell] for an
  * already-computed cell column — the serving-path form (one argmax per
  * row, shared between the stored cell id and the encoded residual).
  */
case class IvfResidualAt(left: Expression, right: Expression,
    cents: FloatModel)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(a: Any, c: Any): Any =
    IvfKernels.residualAt(a.asInstanceOf[ArrayData], c.asInstanceOf[Int],
      cents.data)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfcents", cents.data, "float[]")
    defineCodeGen(ctx, ev, (a, c) =>
      s"org.apache.spark.sql.graft.IvfKernels.residualAt($a, $c, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IvfResidualAt =
    copy(left = newLeft, right = newRight)
}

/** `ivf_cell(emb)`: argmax-cosine cell id against the inlined centroids. */
case class IvfCell(child: Expression, cents: FloatModel, nCells: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(nCells >= 1, s"ivf_cell needs nCells >= 1, got $nCells")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any =
    IvfKernels.argmaxCosine(a.asInstanceOf[ArrayData], cents.data, nCells)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfcents", cents.data, "float[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.IvfKernels.argmaxCosine($c, $ref, $nCells)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

/** `pq_encode(emb)`: M byte codes per vector (codebooks inlined). */
case class PqEncode(child: Expression, cb: FloatModel, m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(m >= 1 && ksub >= 2 && ksub <= 256,
    s"pq_encode needs m >= 1 and 2 <= ksub <= 256 (byte codes), got m=$m ksub=$ksub")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any): Any =
    PqKernels.encode(a.asInstanceOf[ArrayData], cb.data, m, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb.data, "float[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.PqKernels.encode($c, $cbRef, $m, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_decode(codes)`: codebook reconstruction of an M-byte code — the
  * OPQ training loop's inverse of [[PqEncode]].
  */
case class PqDecode(child: Expression, cb: FloatModel, m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    PqKernels.decode(a.asInstanceOf[Array[Byte]], cb.data, m, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb.data, "float[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.PqKernels.decode($c, $cbRef, $m, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}

/** `opq_rotate(emb)`: snapped-grid orthogonal rotation of a float vector
  * (parametric OPQ, Ge et al. 2013) — mean and rotation ride as codegen
  * reference objects, so the generated code is one static call over the
  * unsafe array, same discipline as [[PqEncode]].
  */
case class OpqRotate(child: Expression, mean: DoubleModel, rot: DoubleModel)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    PqKernels.opqRotate(a.asInstanceOf[ArrayData], mean.data, rot.data)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("opqMean", mean.data, "double[]")
    val rotRef = ctx.addReferenceObj("opqRot", rot.data, "double[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.PqKernels.opqRotate($c, $meanRef, $rotRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): OpqRotate =
    copy(child = newChild)
}

/** `pq_lut(q_emb)`: the query's M·ksub squared-distance lookup table. */
case class PqLut(child: Expression, cb: FloatModel, m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(m >= 1 && ksub >= 2 && ksub <= 256,
    s"pq_lut needs m >= 1 and 2 <= ksub <= 256, got m=$m ksub=$ksub")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    PqKernels.lut(a.asInstanceOf[ArrayData], cb.data, m, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb.data, "float[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.PqKernels.lut($c, $cbRef, $m, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `pq_adc(codes, lut)`: approximate squared L2 via M table lookups. */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adc(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData], ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.PqKernels.adc($a, $b, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
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
      val v = arr.getFloat(i)
      // NaN fails every comparison and Math.round(NaN)=0, so a corrupt
      // embedding would silently quantize to a plausible near-zero vector;
      // fail loudly instead, like checkShape does for dimension mismatches
      require(!java.lang.Float.isNaN(v) && !java.lang.Float.isInfinite(v),
        s"vec_quantize: non-finite element $v at index $i — corrupt embedding")
      val a = math.abs(v)
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

  /** `l2_dist(a, b)` as a Column. */
  def l2Dist(a: Column, b: Column): Column =
    ExpressionUtils.column(EuclideanDistance(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def pqEncode(emb: Column, cb: Array[Float], m: Int, ksub: Int): Column =
    ExpressionUtils.column(PqEncode(
      ExpressionUtils.expression(emb), new FloatModel(cb), m, ksub))

  def pqDecode(codes: Column, cb: Array[Float], m: Int, ksub: Int): Column =
    ExpressionUtils.column(PqDecode(
      ExpressionUtils.expression(codes), new FloatModel(cb), m, ksub))

  def opqRotate(emb: Column, mean: Array[Double], rot: Array[Double]): Column =
    ExpressionUtils.column(OpqRotate(
      ExpressionUtils.expression(emb), new DoubleModel(mean), new DoubleModel(rot)))

  def pqLut(emb: Column, cb: Array[Float], m: Int, ksub: Int): Column =
    ExpressionUtils.column(PqLut(
      ExpressionUtils.expression(emb), new FloatModel(cb), m, ksub))

  def pqAdc(codes: Column, lut: Column, ksub: Int): Column =
    ExpressionUtils.column(PqAdc(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(lut), ksub))

  def ivfCell(emb: Column, cents: Array[Float], nCells: Int): Column =
    ExpressionUtils.column(IvfCell(
      ExpressionUtils.expression(emb), new FloatModel(cents), nCells))

  def ivfResidual(emb: Column, cents: Array[Float], nCells: Int): Column =
    ExpressionUtils.column(IvfResidual(
      ExpressionUtils.expression(emb), new FloatModel(cents), nCells))

  def ivfResidualAt(emb: Column, cell: Column, cents: Array[Float]): Column =
    ExpressionUtils.column(IvfResidualAt(
      ExpressionUtils.expression(emb), ExpressionUtils.expression(cell),
      new FloatModel(cents)))

  /** `bucket_of(x)` as a Column: binary-search range-bucket id over sorted
    * cut boundaries.
    */
  def bucketOf(x: Column, cuts: Array[Double]): Column =
    ExpressionUtils.column(BucketBySortedCuts(
      ExpressionUtils.expression(x), new DoubleModel(cuts)))
}
