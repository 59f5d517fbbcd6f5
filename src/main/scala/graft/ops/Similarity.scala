package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.vectors._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, mirroring how a 100 TB corpus is actually served:
  *  - [[knnBruteForce]]: exact baseline — broadcast the (small) query set,
  *    one corpus scan, codegen'd cosine, per-query top-k. Linear in corpus
  *    size, embarrassingly parallel, zero index build.
  *  - [[hyperplaneLshPairs]]: the scale path for all-pairs similarity —
  *    random-hyperplane signatures bucket the corpus so only same-bucket
  *    pairs are compared; the candidate count is governed by the banding
  *    parameters, not O(n²).
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    *
    * queries: (query_id, q_emb); corpus: (id, emb). The query side is
    * broadcast, so the corpus never shuffles for the join; the only shuffle
    * is the per-query top-k window, which moves candidate rows keyed by
    * query_id (bounded by |corpus|×|queries| — keep the query set small, or
    * pre-reduce with mapPartitions top-k at larger |queries|).
    */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", cosineSim(col("q_emb"), col("emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"))
  }

  /** Deterministic random hyperplanes: `bands` bands × `bits` bits each.
    * Fixed seed → the signature function is stable across runs/executors.
    */
  def hyperplanes(dim: Int, bands: Int, bits: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bands * bits)(Array.fill(dim)((rnd.nextGaussian()).toFloat))
  }

  /** Candidate near-duplicate pairs via random-hyperplane LSH, verified with
    * exact cosine ≥ `tau`.
    *
    * Plan shape: corpus → project per-plane sign bits (codegen'd dots, one
    * pass) → explode to (band, signature) keys → shuffle once on the band
    * key → equi-join within buckets → exact cosine filter. At 100 TB the
    * explode factor is `bands` (small constant) and bucket sizes are kept
    * bounded by the signature width; AQE's skew-join splitting handles hot
    * buckets.
    */
  def hyperplaneLshPairs(corpus: DataFrame, tau: Double,
      bands: Int = 4, bits: Int = 4): DataFrame = {
    val dim = 64
    val planes = hyperplanes(dim, bands, bits)
    // per-plane sign bit, folded into one int signature per band
    val sigCols = (0 until bands).map { b =>
      val bitCols = (0 until bits).map { i =>
        val plane = array(planes(b * bits + i).map(v => lit(v)): _*)
        when(dot(col("emb"), plane) >= 0, lit(1 << i)).otherwise(lit(0))
      }
      bitCols.reduce(_ + _).as(s"sig_$b")
    }
    val signed = corpus.select(col("id") +: col("emb") +: sigCols: _*)
    val buckets = signed.select(col("id"), col("emb"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), col(s"sig_$b").as("sig"))): _*)).as("bk"))
      .select(col("id"), col("emb"),
        col("bk.band").as("band"), col("bk.sig").as("sig"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineSim(col("a.emb"), col("b.emb")).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact all-pairs near-duplicates (cosine ≥ tau) — the brute baseline the
    * LSH path approximates. Broadcast one side; only viable when one side
    * fits in memory (the oracle-checkable small-scale case).
    */
  def bruteForcePairs(corpus: DataFrame, tau: Double): DataFrame = {
    val a = corpus.select(col("id").as("id_a"), col("emb").as("emb_a"))
    val b = corpus.select(col("id").as("id_b"), col("emb").as("emb_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .filter(cosineSim(col("emb_a"), col("emb_b")) >= tau)
      .select(col("id_a"), col("id_b"))
  }
}
