package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis.normText

/** Near-duplicate detection over text — the three standard sketches, all as
  * declarative plans (SQL higher-order functions; no UDFs, no driver loops).
  *
  * Shared shape, which is what makes these work at 100 TB:
  *   sketch per doc (one scan) → explode to a small constant number of
  *   bucket keys → ONE shuffle on the bucket key → pairs generated only
  *   within buckets. The candidate count is controlled by the banding
  *   parameters, never O(n²). Hot buckets (boilerplate docs) are split by
  *   AQE skew handling; a production pipeline additionally drops buckets
  *   above a size cap, which only loses pairs that exact-dedup would have
  *   caught anyway.
  */
object Dedup {

  /** Word 3-gram shingles of the normalized text (docs shorter than 3 words
    * collapse to a single whole-text shingle).
    */
  def withShingles(df: DataFrame, text: Column): DataFrame =
    df.withColumn("__words", split(normText(text), " "))
      .withColumn("__shingles",
        when(size(col("__words")) >= 3,
          expr("transform(sequence(0, size(__words)-3), i -> " +
            "concat_ws(' ', __words[i], __words[i+1], __words[i+2]))"))
          .otherwise(array(array_join(col("__words"), " "))))

  /** MinHash signature (k hashes via murmur3 seed-mixing) + LSH banding.
    * Returns candidate pairs with the signature-estimated Jaccard.
    */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column,
      k: Int = 32, bands: Int = 8): DataFrame = {
    val rows = k / bands
    val sigs = withShingles(df.select(id.as("doc_id"), text.as("__text")), col("__text"))
      .withColumn("__sig",
        expr(s"transform(sequence(0, ${k - 1}), j -> " +
          "array_min(transform(__shingles, s -> hash(s, j))))"))
      .select(col("doc_id"), col("__sig"))
    val buckets = sigs.select(col("doc_id"), col("__sig"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"struct(b AS band, hash(slice(__sig, b*$rows+1, $rows), b) AS bkey))")).as("bk"))
      .select(col("doc_id"), col("__sig"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(expr("array_intersect(a.__sig, b.__sig)")).cast("double") / k)
          .as("est_jaccard"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** 64-bit SimHash per doc: per-token xxhash64, ±1 vote per bit, sign →
    * bit. Computed entirely with array higher-order functions in one
    * projection.
    */
  def withSimhash(df: DataFrame, text: Column): DataFrame =
    df.withColumn("__tokens", split(normText(text), " "))
      .withColumn("__hashes", expr("transform(__tokens, t -> xxhash64(t))"))
      .withColumn("__bitsum",
        expr("""aggregate(__hashes, array_repeat(CAST(0 AS BIGINT), 64),
          (acc, h) -> zip_with(acc,
            transform(sequence(0, 63),
              i -> CASE WHEN (shiftright(h, i) & 1) = 1
                   THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END),
            (x, y) -> x + y))"""))
      .withColumn("simhash",
        expr("""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
          (acc, i) -> CASE WHEN __bitsum[i] > 0
                      THEN acc | shiftleft(CAST(1 AS BIGINT), i)
                      ELSE acc END)"""))
      .drop("__tokens", "__hashes", "__bitsum")

  /** SimHash near-dup candidates: bucket on 16-bit chunks (two docs within
    * hamming distance ≤ 3·16 of each other share a chunk by pigeonhole for
    * distance < 4 chunks differing); verify with exact bit_count(xor).
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 12): DataFrame = {
    val sh = withSimhash(df.select(id.as("doc_id"), text.as("__text")), col("__text"))
      .select(col("doc_id"), col("simhash"))
    val buckets = sh.select(col("doc_id"), col("simhash"),
        explode(expr("transform(sequence(0, 3), c -> " +
          "struct(c AS chunk, CAST(shiftright(simhash, c*16) & 65535 AS INT) AS ckey))")).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.chunk").as("chunk"), col("bk.ckey").as("ckey"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Exact word-3gram Jaccard for candidate pairs blocked by length bucket
    * (same-bucket only). The blocking key bounds the join fan-out; at scale
    * the bucket width trades recall vs cost.
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      minJaccard: Double, bucketWidth: Int = 100): DataFrame = {
    val sh = withShingles(df.select(id.as("doc_id"), text.as("__text")), col("__text"))
      .select(col("doc_id"),
        array_distinct(col("__shingles")).as("__sh"),
        (length(col("__text")) / bucketWidth).cast("int").as("__bucket"))
    val a = sh.as("a")
    val b = sh.as("b")
    a.join(b, col("a.__bucket") === col("b.__bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(expr("array_intersect(a.__sh, b.__sh)")).cast("double") /
          size(expr("array_union(a.__sh, b.__sh)"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
