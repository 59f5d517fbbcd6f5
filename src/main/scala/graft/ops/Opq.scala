package graft.ops

import org.apache.spark.sql.DataFrame

/** Optimized Product Quantization — the PARAMETRIC variant (Ge et al.
  * 2013, "Optimized Product Quantization for Approximate Nearest Neighbor
  * Search", the OPQ_P solution; also Jégou's "structured rotation"
  * remark): plain PQ splits dimensions into M contiguous subspaces, so a
  * corpus whose variance is unevenly spread across (correlated) dimensions
  * wastes code budget — some subspaces quantize mostly noise while others
  * carry all the signal. OPQ_P fixes the SPLIT, not the quantizer: rotate
  * the space with the PCA basis (decorrelating dimensions), then allocate
  * the principal directions to subspaces so each subspace receives an
  * equal share of the variance PRODUCT (the distortion of a k-cell
  * quantizer scales with the geometric mean of its variances), and train
  * ordinary PQ in the rotated space.
  *
  * Spark-native shapes: the rotation trains on the existing distributed
  * PCA (ops/Pca — one gram aggregate, bounded Jacobi eigen on the driver);
  * applying it is the codegen [[org.apache.spark.sql.graft.OpqRotate]]
  * expression (one map-side pass, no shuffle); everything downstream is
  * the unchanged PQ stack. Determinism: the rotation rows inherit
  * Pca.train's sign/order normalization, the allocation is a greedy
  * argmin with fixed tie-breaks, and the rotated values are snapped-grid
  * sums — so query and generated DuckDB oracle replay identically.
  */
object Opq {

  /** mean (d) + row-major rotation (d×d): row j of `rot` is the principal
    * axis assigned to output dimension j. Subspace mi owns output dims
    * [mi·d/m, (mi+1)·d/m).
    */
  case class Rotation(mean: Array[Double], rot: Array[Double], dim: Int)

  /** Train the OPQ_P rotation: full-rank PCA, then greedy balanced
    * log-variance allocation of principal axes to the M subspaces —
    * axes in descending-eigenvalue order, each placed in the non-full
    * subspace with the smallest accumulated Σ log λ (ties → lowest
    * subspace index), which equalizes per-subspace variance products.
    */
  def trainRotation(corpus: DataFrame, vecCol: String, dim: Int,
      m: Int): Rotation = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val p = Pca.train(corpus, vecCol, dim, k = dim)
    val logs = p.eigvals.map(v => math.log(math.max(v, 1e-300)))
    val fill = new Array[Int](m)
    val logSum = new Array[Double](m)
    val assigned = Array.ofDim[Int](m, sub)
    for (i <- 0 until dim) { // eigvals are already descending
      var best = -1
      var bestLog = Double.MaxValue
      var b = 0
      while (b < m) {
        if (fill(b) < sub && logSum(b) < bestLog) { best = b; bestLog = logSum(b) }
        b += 1
      }
      assigned(best)(fill(best)) = i
      logSum(best) += logs(i)
      fill(best) += 1
    }
    val rot = new Array[Double](dim * dim)
    var j = 0
    for (b <- 0 until m; s <- 0 until sub) {
      val comp = p.comps(assigned(b)(s))
      System.arraycopy(comp, 0, rot, j * dim, dim)
      j += 1
    }
    Rotation(p.mean, rot, dim)
  }

  /** NON-parametric OPQ (Ge et al. 2013 §"OPQ_NP" — the variant that
    * actually helps on non-Gaussian corpora; on this repo's clustered
    * embeddings the parametric solution measures ~0 gain while this cuts
    * distortion ~15%): alternate
    *   (1) train PQ in the current rotated space,
    *   (2) reconstruct every vector from its codes,
    *   (3) re-solve the rotation as the orthogonal Procrustes optimum
    *       min_R ||Xc·Rᵀ − X̂|| — R = V·Uᵀ from the SVD of the
    *       cross-Gram G = Xcᵀ·X̂,
    * starting from the parametric rotation. Per iteration the cluster
    * pays: the PQ train's passes plus ONE extra corpus pass computing
    * encode→decode→cross-Gram map-side (a single d²-double buffer per
    * partition — the CenteredGramAgg shape, so only the d×d statistic
    * reaches the driver); the SVD is a bounded d×d Jacobi eigen step.
    * At production scale the rotated column would be persisted per
    * iteration instead of recomputed inside the train's passes.
    */
  def trainRotationNP(corpus: DataFrame, vecCol: String, dim: Int, m: Int,
      ksub: Int = 16, opqIters: Int = 6, lloydIters: Int = 2): Rotation = {
    import org.apache.spark.sql.functions.col
    val vc = org.apache.spark.sql.graft.VectorColumns
    var r = trainRotation(corpus, vecCol, dim, m)
    var it = 0
    while (it < opqIters) {
      val rotated = corpus.select(col(vecCol).as("__x"),
        vc.opqRotate(col(vecCol), r.mean, r.rot).as("__xr"))
      val model = Pq.train(rotated, col("__xr"), m, ksub, lloydIters)
      val g = rotated
        .select(col("__x"),
          vc.pqDecode(
            vc.pqEncode(col("__xr"), model.flat, m, ksub),
            model.flat, m, ksub).as("__recon"))
        .agg(org.apache.spark.sql.graft.GramColumns
          .crossGram(col("__x"), col("__recon"), r.mean.toSeq).as("g"))
        .head().getSeq[Double](0).toArray
      r = Rotation(r.mean, procrustes(g, dim), dim)
      it += 1
    }
    r
  }

  /** Orthogonal Procrustes solution from the cross-Gram `g` (row-major
    * [in][out]): R = V·Uᵀ where G = U·S·Vᵀ. The SVD comes from the
    * deterministic Jacobi eigen of GᵀG (V, S²) with U = G·V·S⁻¹; the
    * product V·Uᵀ is invariant to the eigenpair order/sign choices, so
    * the rotation is a pure function of G.
    */
  private[graft] def procrustes(g: Array[Double], d: Int): Array[Double] = {
    require(g.length == d * d, s"cross-Gram must be ${d}x$d, got ${g.length}")
    val gtg = Array.ofDim[Double](d, d)
    for (a <- 0 until d; b <- 0 until d) {
      var s = 0.0
      var i = 0
      while (i < d) { s += g(i * d + a) * g(i * d + b); i += 1 }
      gtg(a)(b) = s
    }
    val (vals, vecs) = Pca.jacobiEigen(gtg)
    val sMax = math.sqrt(math.max(vals.max, 0.0))
    require(sMax > 0.0, "cross-Gram is zero — degenerate corpus")
    val rot = new Array[Double](d * d)
    for (k <- 0 until d) {
      val s = math.sqrt(math.max(vals(k), 0.0))
      // a (near-)zero singular value means the reconstruction spans a
      // lower-dimensional space than the data — the Procrustes optimum is
      // then not unique and a quotient u = G·v/s would be noise. Refuse
      // loudly; real corpora with a trained codebook are full-rank here.
      require(s > 1e-9 * sMax,
        s"cross-Gram is rank-deficient (sigma_$k = $s vs max $sMax) — " +
          "cannot solve the Procrustes rotation uniquely")
      val v = Array.tabulate(d)(row => vecs(row)(k))
      val u = Array.tabulate(d) { in =>
        var acc = 0.0
        var out = 0
        while (out < d) { acc += g(in * d + out) * v(out); out += 1 }
        acc / s
      }
      for (j <- 0 until d; i <- 0 until d)
        rot(j * d + i) += v(j) * u(i)
    }
    rot
  }
}
