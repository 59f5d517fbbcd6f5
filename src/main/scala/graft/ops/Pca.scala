package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA for embedding columns — the dimensionality-reduction
  * pass of a training-data pipeline (compress a stored embedding column,
  * decorrelate features before clustering, 2-D corpus maps). Reference
  * scope analog: none (the reference has no vector ops at all) — this is
  * part of the beyond-reference LLM-pipeline surface, same family as the
  * IVF/PQ stack.
  *
  * Scale shape (the MLlib RowMatrix discipline, re-expressed on graft's
  * determinism contract):
  *  1. mean pass — one aggregate of d exact snapped per-dim sums;
  *  2. scatter pass — ONE d(d+1)/2-double aggregation buffer per
  *     partition ([[org.apache.spark.sql.graft.CenteredGramAgg]]): the
  *     corpus never explodes, the shuffle carries one buffer per
  *     partition, only the d×d matrix reaches the driver;
  *  3. eigendecomposition — cyclic Jacobi on the d×d symmetric matrix,
  *     a BOUNDED driver-side model step (d², not data-sized), bit-
  *     deterministic because its input is exact (the snapped sums) and
  *     its sweep order is fixed;
  *  4. projection — a pure codegen scan: per component, a 64-term
  *     left-associated multiply-add expression over the raw columns. No
  *     shuffle, no UDF; the SAME expression renders as SQL with the
  *     model inlined as literals, which is what makes the trained
  *     projection DRIVER-CHECKABLE (the q_ann_ivf trained-model oracle
  *     pattern).
  *
  * Eigenvector sign is normalized (the component with the largest |value|
  * — first index on ties — is made positive), so the model is unique, not
  * just unique-up-to-sign.
  */
object Pca {

  /** Trained model: per-dim mean, eigenvalues (desc), and the top-k
    * principal axes (rows, each of length dim).
    */
  case class PcaModel(dim: Int, n: Long, mean: Array[Double],
      eigvals: Array[Double], comps: Array[Array[Double]])

  private val Grid = 1048576.0 // 2^20 — the CenteredGramAgg grid

  private def snapCol(c: Column): Column = floor(c * lit(Grid)) / lit(Grid)

  /** Train a k-component model over an `array<float>` column. Two
    * aggregate jobs + one bounded eigen step; deterministic (see object
    * scaladoc).
    */
  def train(embs: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val sums = embs.agg(
      count(lit(1)).as("n"),
      (0 until dim).map(i =>
        sum(snapCol(col(vecCol).getItem(i).cast("double"))).as(s"s$i")): _*)
      .head()
    val n = sums.getLong(0)
    require(n > 1, s"need >1 rows to train a PCA, got $n")
    // Determinism contract enforcement (round-10 ADVICE): CenteredGramAgg's
    // exact-merge guarantee holds while every partial sum of 2^-20-grid
    // dyadics stays below 2^53 in magnitude — |term| ≤ 16 per row (|c_i|,
    // |c_j| ≤ 4 for unit-ish embeddings) gives n·16·2^20 < 2^53 ⇔
    // n < 2^29. Beyond that the gram sums can become partition-order
    // dependent and the trained model (and its literal-inlined oracle)
    // nondeterministic — fail LOUDLY here instead. Past this bound, train
    // on a uniform sample (a 2^29-row sample estimates a covariance far
    // beyond float precision anyway) or switch the buffer to Long grid
    // units.
    require(n < (1L << 29),
      s"PCA gram determinism bound exceeded: n=$n >= 2^29 rows — train on " +
        "a sample or use a Long-unit gram buffer")
    val mean = Array.tabulate(dim)(i => sums.getDouble(i + 1) / n)
    val upper = embs.agg(org.apache.spark.sql.graft.GramColumns
        .centeredGram(col(vecCol), mean.toSeq).as("g"))
      .head().getSeq[Double](0).toArray
    // unpack the upper triangle into the full symmetric covariance C/n
    val a = Array.ofDim[Double](dim, dim)
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      val v = upper(idx) / n
      a(i)(j) = v; a(j)(i) = v
      idx += 1
    }
    val (vals, vecs) = jacobiEigen(a)
    val order = (0 until dim).sortBy(i => (-vals(i), i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => vecs(r)(c))
      // sign normalization: largest-|component| (first on ties) positive
      var best = 0
      for (r <- 1 until dim) if (math.abs(v(r)) > math.abs(v(best))) best = r
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    PcaModel(dim, n, mean, order.map(vals).toArray, comps)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (in-place on
    * a copy). Fixed sweep order (p < q row-major) and a fixed
    * convergence threshold make it deterministic for identical input.
    * Returns (eigenvalues, eigenvector matrix V with eigenvectors as
    * COLUMNS). Standard textbook algorithm (Golub & Van Loan §8.5).
    */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-22 && sweep < 64) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (apq != 0.0) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val raw = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val t = if (raw == 0.0) 1.0 else raw // theta == 0 → tan = 1 (45°)
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          var r = 0
          while (r < d) {
            val arp = a(r)(p); val arq = a(r)(q)
            a(r)(p) = c * arp - s * arq
            a(r)(q) = s * arp + c * arq
            r += 1
          }
          r = 0
          while (r < d) {
            val apr = a(p)(r); val aqr = a(q)(r)
            a(p)(r) = c * apr - s * aqr
            a(q)(r) = s * apr + c * aqr
            val vrp = v(r)(p); val vrq = v(r)(q)
            v(r)(p) = c * vrp - s * vrq
            v(r)(q) = s * vrp + c * vrq
            r += 1
          }
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Projection columns pc1..pck for `vecCol` under `model`: each term
    * (CAST(vᵢ AS DOUBLE) − μᵢ)·Pⱼᵢ is floored onto the 2⁻²⁰ dyadic grid
    * BEFORE the sum, making the 64-term reduction ORDER-INDEPENDENT —
    * every term is a multiple of 2⁻²⁰ with |term| ≤ 2, so the sum is
    * exact in any association (the pageRank/q_lm_score snapping
    * discipline). Measured necessity: DuckDB reassociates long `+`
    * chains (a strict left-assoc replay diverged from it by ~100 ulps
    * under cancellation), so "same written order" is NOT a portable
    * contract across engines — an exact-grid sum is. The snapping bias
    * is < 2⁻²⁰·dim ≈ 6e-5 absolute on O(0.1) components — far below any
    * semantic use of a projection. Pure codegen scan, no shuffle.
    */
  def projectionCols(vecCol: Column, model: PcaModel): Seq[Column] =
    model.comps.zipWithIndex.map { case (p, j) =>
      (0 until model.dim).foldLeft(lit(0.0)) { (acc, i) =>
        acc + snapCol(
          (vecCol.getItem(i).cast("double") - lit(model.mean(i))) *
            lit(p(i)))
      }.as(s"pc${j + 1}")
    }.toSeq
}
