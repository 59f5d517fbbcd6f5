package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.VectorColumns

/** Public face of the custom Catalyst vector expressions
  * (org.apache.spark.sql.graft.VectorExprs — placed there because the
  * Expression↔Column bridge is private[sql]).
  */
object vectors {
  /** Codegen'd cosine similarity over two Array[Float] columns. */
  def cosineSim(a: Column, b: Column): Column = VectorColumns.cosineSim(a, b)

  /** Codegen'd dot product over two Array[Float] columns. */
  def dot(a: Column, b: Column): Column = VectorColumns.dot(a, b)

  /** Bounded-heap top-k aggregate: keeps the k highest (score, id) pairs,
    * partial buffers capped at k → the shuffle never carries more than
    * k·partitions rows per group (vs a window sort shuffling every row).
    */
  def topk(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.TopKColumns.topk(score, id, k)

  /** Per-vector symmetric int8 quantization: struct<scale, q binary> —
    * the 4x-smaller storage format for an embedding column at 100 TB.
    */
  def quantize(emb: Column): Column = VectorColumns.quantize(emb)

  /** Inverse of [[quantize]] (up to ≤ scale/2 per-element rounding). */
  def dequantize(q: Column): Column = VectorColumns.dequantize(q)

  /** Codegen'd Euclidean (L2) distance over two Array[Float] columns. */
  def l2Dist(a: Column, b: Column): Column = VectorColumns.l2Dist(a, b)

  /** Binary-search range-bucket id over sorted cut boundaries (carried as a
    * codegen reference object — O(log cuts) per row, no literal inlining).
    */
  def bucketOf(x: Column, cuts: Array[Double]): Column =
    VectorColumns.bucketOf(x, cuts)
}

/** Public face of the codegen'd text-sketch expressions
  * (org.apache.spark.sql.graft.TextExprs).
  */
object text {
  import org.apache.spark.sql.graft.TextColumns

  /** Word n-gram shingles of the normalized (lower, ws-collapsed) text. */
  def wordShingles(c: Column, n: Int): Column = TextColumns.wordShingles(c, n)

  /** Distinct 64-bit hashes of the word n-grams (cheap join/shuffle keys). */
  def wordShingleHashes(c: Column, n: Int): Column = TextColumns.wordShingleHashes(c, n)

  /** Ordered md5-lane hash per word n-gram (position i = window at word i,
    * duplicates kept) — the positioned-window key for exact-substring dedup.
    */
  def wordShingleLanes(c: Column, n: Int): Column = TextColumns.wordShingleLanes(c, n)

  /** Both 64-bit md5 lanes of a string as [lower, upper] — the oracle-
    * replayable hash pair (DuckDB md5_number_lower / md5_number_upper).
    */
  def md5Lanes(c: Column): Column = TextColumns.md5Lanes(c)

  /** Winnowed (MOSS) fingerprint sketch: substring-robust doc fingerprints. */
  def winnow(c: Column, n: Int, w: Int): Column = TextColumns.winnow(c, n, w)

  /** k-long MinHash signature of a shingle array (each shingle hashed once). */
  def minhashSig(shingles: Column, k: Int): Column = TextColumns.minhashSig(shingles, k)

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column = TextColumns.simhash64(tokens)

  /** Fraction of agreeing positions of two signatures (MinHash est. Jaccard). */
  def sigAgreement(a: Column, b: Column): Column = TextColumns.sigAgreement(a, b)

  /** All text signals (lang scores, token/punct counts) in one char pass. */
  def textStats(text: Column): Column = TextColumns.textStats(text)
}
