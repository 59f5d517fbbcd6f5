package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, as pure Column
  * expressions: everything here stays inside whole-stage codegen (no UDFs),
  * so a 100 TB corpus pays one scan and no serialization boundary.
  *
  * Determinism: token/char counts are integer; ratios are single IEEE
  * divisions of integers — identical on any engine and partitioning.
  */
object TextAnalysis {

  /** Whitespace-collapsed lowercase normal form (dedup canonical text). */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Stable document fingerprint: md5 of the normal form — the same
    * function exists in every SQL engine, so fingerprints are portable.
    */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** All signal accessors below project fields off the single-pass codegen
    * TextStats struct (org.apache.spark.sql.graft.TextExprs). The regex
    * formulations they replaced (kept in `langMarkers` + the oracle SQL,
    * which still uses them) cost one full text scan PER signal; identical
    * `text_stats(c)` calls in one projection are evaluated once per row by
    * whole-stage codegen's subexpression elimination, so a query reading
    * all seven signals pays ONE character pass.
    */
  private def stats(c: Column): Column = graft.functions.text.textStats(c)

  /** Whitespace token count (= size(split(trim(c), '\s+'))). */
  def wsTokenCount(c: Column): Column = stats(c).getField("ws_tokens")

  /** BPE-ish token count: letter runs, digit runs, single punctuation —
    * a cheap proxy for subword tokenizer load (no vocab needed).
    */
  def bpeTokenCount(c: Column): Column = stats(c).getField("bpe_tokens")

  /** Punctuation character count. */
  def punctCount(c: Column): Column = stats(c).getField("n_punct")

  /** Stopword-profile scores per language: count whole-word marker hits.
    * N-gram-free language ID in the same single scan — no shuffle, no
    * extra pass per language.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is)\\b",
    "fr" -> "\\b(le|la|les|de|et|une)\\b",
    "de" -> "\\b(der|die|und|das|ist|ein)\\b",
    "es" -> "\\b(el|los|y|que|como|un)\\b")

  def langScore(c: Column, lang: String): Column = {
    require(langMarkers.toMap.contains(lang), s"unknown lang $lang")
    stats(c).getField(s"s_$lang")
  }

  /** Argmax with fixed priority order en > fr > de > es on ties. */
  def langPredict(c: Column): Column = {
    val s = langMarkers.map { case (l, _) => l -> langScore(c, l) }.toMap
    when(s("en") >= s("fr") && s("en") >= s("de") && s("en") >= s("es"), lit("en"))
      .when(s("fr") >= s("de") && s("fr") >= s("es"), lit("fr"))
      .when(s("de") >= s("es"), lit("de"))
      .otherwise(lit("es"))
  }

  /** Composite quality score in [0,1] from length/punctuation/stopword
    * signals (the usual pre-training heuristics). The formula is a fixed
    * expression tree of integer-derived doubles → bit-deterministic.
    */
  def qualityScore(nWords: Column, punctRatio: Column, stopRatio: Column): Column =
    lit(0.4) * least(lit(1.0), nWords.cast("double") / 200.0) +
      lit(0.3) * (lit(1.0) - least(lit(1.0), punctRatio * 5.0)) +
      lit(0.3) * least(lit(1.0), stopRatio * 4.0)

  /** Top-k keywords per document — inverted-index TF-IDF, scored
    * tf·(N/df). Rational idf instead of the textbook ln(N/df): ln is
    * monotone so the RANKING is identical, and tf·N ÷ df is exact-integer ÷
    * exact-integer — ONE deterministic IEEE division, where ln(x) is
    * libm-dependent in its last ulp across engines (would break an exact
    * correctness gate for zero ranking benefit).
    *
    * Plan shape at 100 TB: token explode is scan-side (codegen word split,
    * no pre-shuffle); (doc,term) counts partial-aggregate before their
    * shuffle; df is a second term-keyed aggregate OVER the tf table (far
    * smaller than the token stream); the join back is term-keyed (no
    * broadcast assumption — vocabulary can be huge); the per-doc top-k runs
    * as partial+final WindowGroupLimit, so the doc-keyed shuffle moves only
    * surviving candidates.
    */
  def tfidfKeywords(docs: DataFrame, id: Column, text: Column,
      k: Int = 5): DataFrame = {
    val terms = docs.select(id.as("doc_id"),
        explode(graft.functions.text.wordShingles(text, 1)).as("term"))
      .filter(col("term") =!= "") // edge-whitespace empty fields carry no signal
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(id.as("doc_id"))
      .agg(count(lit(1)).as("n_docs")) // 1 row — the corpus-size "model"
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(idf, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }
}
