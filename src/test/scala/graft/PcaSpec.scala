package graft

import org.apache.spark.sql.functions._

import graft.ops.Pca

class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  test("jacobi eigen recovers analytic eigenpairs of a symmetric matrix") {
    // [[2,1],[1,2]] → eigenvalues 3 and 1, eigenvectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = (0 until 2).sortBy(i => -vals(i))
    assert(math.abs(vals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(vals(order(1)) - 1.0) < 1e-12)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12, "(1,1) direction")
  }

  test("trained axes are orthonormal and variance-ordered; train is deterministic") {
    // synthetic 8-dim corpus with a dominant direction along dim 0
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val base = Array.fill(8)((rnd.nextDouble() - 0.5).toFloat * 0.1f)
      base(0) = (rnd.nextDouble() - 0.5).toFloat * 4.0f
      (i.toLong, base.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val m1 = Pca.train(df, "embedding", dim = 8, k = 3)
    val m2 = Pca.train(df, "embedding", dim = 8, k = 3)
    assert(m1.mean.toSeq === m2.mean.toSeq, "deterministic mean")
    assert(m1.comps.map(_.toSeq).toSeq === m2.comps.map(_.toSeq).toSeq,
      "deterministic axes")
    assert(m1.eigvals(0) > m1.eigvals(1) && m1.eigvals(1) >= m1.eigvals(2),
      "variance-ordered")
    // dominant direction ≈ e0
    assert(math.abs(m1.comps(0)(0)) > 0.99,
      s"pc1 must align with the dominant dim, got ${m1.comps(0).toSeq}")
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until 8).map(i => m1.comps(a)(i) * m1.comps(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"orthonormality ($a,$b): $dot")
    }
  }

  test("projection columns decorrelate: pc1 variance dominates, cross-covariance ~0") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      // correlated pair (x, 0.5x + noise) embedded in 4 dims
      val x = (rnd.nextDouble() - 0.5) * 2.0
      (i.toLong, Seq(x.toFloat, (0.5 * x).toFloat +
        (rnd.nextDouble() - 0.5).toFloat * 0.05f,
        (rnd.nextDouble() - 0.5).toFloat * 0.05f, 0.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.train(df, "embedding", dim = 4, k = 2)
    val proj = df.select(Pca.projectionCols(col("embedding"), m): _*)
      .agg(var_samp(col("pc1")), var_samp(col("pc2")),
        covar_samp(col("pc1"), col("pc2")))
      .head()
    assert(proj.getDouble(0) > 10 * proj.getDouble(1),
      s"pc1 var ${proj.getDouble(0)} must dominate pc2 ${proj.getDouble(1)}")
    assert(math.abs(proj.getDouble(2)) < 1e-3,
      s"projected components must decorrelate, covar=${proj.getDouble(2)}")
  }

  test("PCA-compressed IVF (64->16) holds recall-vs-exact near the full-dim IVF at 4x compression") {
    import graft.functions.vectors._
    import graft.ops.Similarity
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val n = corpus.count()
    val queries = corpus.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    // ground truth: exact cosine top-5 — BOTH indexes are approximate,
    // so index-vs-index agreement conflates projection loss with
    // ordinary IVF probe loss; recall-vs-exact separates them
    val exact = Similarity.knnBruteForceTopK(corpus, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.trainCentroids(corpus,
      nCells = Similarity.cellsFor(n), iters = 2)
    val full = Similarity.ivfFlatKnnWith(corpus, queries, cents, 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallFull = (exact intersect full).size.toDouble / exact.size

    val p = Pca.train(corpus, "emb", dim = 64, k = 16)
    val varShare = p.eigvals.sum /
      Pca.train(corpus, "emb", dim = 64, k = 64).eigvals.sum
    val reduced = corpus.select(col("id"),
      org.apache.spark.sql.graft.VectorColumns
        .opqRotate(col("emb"), p.mean, p.comps.flatten).as("emb"))
    assert(reduced.select(size(col("emb"))).head.getInt(0) === 16)
    val centsR = Similarity.trainCentroids(reduced,
      nCells = Similarity.cellsFor(n), iters = 2)
    val qR = reduced.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    // reduced-space-only serve ranks poorly on this near-isotropic corpus
    // (top-16 axes ≈ 38% variance) — which is WHY the registered path is
    // two-stage: 16-dim shortlist, full-dim rerank
    val redOnly = Similarity.ivfFlatKnnWith(reduced, qR, centsR, 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallOnly = (exact intersect redOnly).size.toDouble / exact.size
    val short = Similarity.ivfFlatKnnWith(reduced, qR, centsR, 32, 4)
      .select(col("query_id"), col("neighbor_id"))
    val reranked = Similarity.rerankCosine(short, corpus, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect reranked).size.toDouble / exact.size
    info(f"top-16 variance share $varShare%.3f; recall vs exact: " +
      f"full-dim IVF $recallFull%.3f, reduced-only $recallOnly%.3f, " +
      f"reduced+rerank $recall%.3f")
    assert(recall >= recallOnly,
      "the full-dim rerank must not lose candidates the projection found")
    assert(recall >= 0.7 * recallFull,
      s"64->16 two-stage recall $recall fell below 70% of the full-dim " +
        s"IVF's $recallFull — too much neighborhood structure lost for " +
        "the 4x compression to be worth it")
  }
}
