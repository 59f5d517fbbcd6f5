package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.ops.{Dedup, Similarity}

/** Similarity search + near-dup detection queries (SURVEY.md §2, LLM
  * pipeline block). kNN, the brute-force pair scan AND the hyperplane-LSH
  * path have DuckDB oracles (`list_cosine_similarity`; the LSH one inlines
  * the seeded hyperplanes as literals — SparkEntry.lshOracle); the
  * xxhash64-sketch families (minhash/simhash/winnow) and the
  * trained-model ANN paths (IVF/PQ — float-mean training isn't bit-stable
  * across engines) are rows-only checks, cross-validated against the exact
  * ops in ScalaTest specs.
  */
object SimilarityQueries {

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))

  /** Exact top-5 cosine neighbors for the first 10 vectors, via the
    * bounded-heap topk aggregate (shuffle ≤ k per query per partition).
    */
  def qKnnCosine(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Similarity.knnBruteForceTopK(c, queries, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact all-pairs near-duplicates at cosine ≥ 0.4 (brute baseline). */
  def qEmbedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForcePairs(corpus(spark, dir), tau = 0.4)
      .orderBy(col("id_a"), col("id_b"))

  /** LSH-bucketed near-duplicates at cosine ≥ 0.4 — the 100 TB path.
    * Oracle-checked exactly (the seeded hyperplanes are inlined into the
    * DuckDB SQL); subset-of-exact additionally asserted in SimilaritySpec.
    */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.hyperplaneLshPairs(corpus(spark, dir)) // LshParams defaults
      .orderBy(col("id_a"), col("id_b"))

  /** Near-dup pairs promoted to duplicate CLUSTERS: connected components
    * over the LSH pair graph (min-label propagation — ops/Components).
    * component = min vec_id reachable; `id = component` marks the canonical
    * doc a dedup would keep. Oracle-checked exactly (recursive CTE over the
    * same inlined-hyperplane pair SQL).
    */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val pairs = Similarity.hyperplaneLshPairs(c) // LshParams defaults
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    graft.ops.Components.connectedComponents(c.select(col("id")), pairs)
      .orderBy(col("id"))
  }

  /** IVF-flat approximate top-5 for the first 10 vectors — the serving-path
    * ANN (rows-only; recall vs brute force asserted in SimilaritySpec).
    */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Similarity.ivfFlatKnn(c, queries, k = 5, nCells = 16, nProbe = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  /** PQ-compressed ANN: train per-subspace codebooks, encode the corpus to
    * 8-byte codes (32x compression), ADC-shortlist 64 candidates from the
    * codes alone, exact-L2 rerank only the shortlist (rows-only; recall vs
    * exact L2 asserted in SimilaritySpec).
    */
  def qAnnPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Pq
    val c = corpus(spark, dir)
    val model = Pq.train(c, col("emb"), m = 8, ksub = 16, iters = 2)
    val encoded = Pq.encodeCorpus(c, col("emb"), model).drop("emb")
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Pq.searchPqRerank(encoded, c, queries, model, k = 5, shortlist = 64)
      .orderBy(col("query_id"), col("rank"))
  }

  /** MinHash+LSH candidate near-dup pairs on documents (rows-only). */
  def qMinhashNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, dir),
        col("doc_id"), col("text"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Winnowed-fingerprint near-dup candidates on documents (rows-only). */
  def qWinnowNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairs(Tables.documents(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** SimHash near-dup candidates on documents (rows-only). */
  def qSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir),
        col("doc_id"), col("text"), maxHamming = 16)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Length-blocked word-3gram Jaccard pairs on documents (rows-only). */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, dir),
        col("doc_id"), col("text"), minJaccard = 0.03)
      .select(col("doc_a"), col("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))
}
