package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the classic corpus filter
  * (CCNet / the KenLM stage of most LLM data pipelines): train a smoothed
  * bigram model on a trusted reference slice, score every candidate
  * document by cross-entropy under it, and keep the low-perplexity side.
  * In-engine here: the "model" is two count tables + one vocab scalar, so
  * training is two aggregations and scoring is two keyed joins — no
  * external LM service at any scale.
  *
  * Model: add-one smoothed bigram probabilities
  *   p(w2|w1) = (c2(w1 w2) + 1) / (c1(w1) + V)
  * with c1 derived from c2 (Σ_w2 c2 — bigram-first occurrences, the
  * consistent MLE denominator) and V = |reference vocabulary|. All counts
  * exact integers; each ln p is floored onto the 2^-16 dyadic grid before
  * the per-doc sum (the SURVEY §4 fixed-point contract), so the
  * cross-entropy is reduction-order-exact and oracle-replayable (same
  * bounded last-ulp ln caveat as ops.Retrieval — see its scaladoc).
  *
  * Scale shape at 100 TB: reference bigram counts are one shuffled
  * aggregation (partial map-side combine); c1/V are small derived aggs;
  * scoring joins the candidate bigram stream against c2 on the bigram key
  * and c1 on the first word — both keyed shuffles that AQE can turn into
  * broadcasts when the reference LM is small; the per-doc reduction is the
  * final doc-keyed aggregation. Nothing touches the driver.
  */
object LanguageModel {

  /** Per-document bigram cross-entropy under the reference-slice LM:
    * (doc_id, n_bigrams, n_unseen, cross_entropy, keep).
    * `isRef` selects the training slice (evaluated on `docs` columns);
    * every document is scored, reference docs included. `tau` is the
    * keep threshold in nats (exp(tau) = perplexity cut).
    */
  def bigramCrossEntropy(docs: DataFrame, id: Column, text: Column,
      isRef: Column, tau: Double): DataFrame = {
    val base = docs.select(id.as("doc_id"), isRef.as("__ref"),
      explode(graft.functions.text.wordShingles(text, 2)).as("g"))
    val c2 = base.filter(col("__ref"))
      .groupBy(col("g")).agg(count(lit(1)).as("c2n"))
    val c1 = c2.groupBy(substring_index(col("g"), " ", 1).as("w1"))
      .agg(sum(col("c2n")).as("c1n"))
    val vocab = docs.filter(isRef)
      .select(explode(graft.functions.text.wordShingles(text, 1)).as("t"))
      .agg(count_distinct(col("t")).as("v")) // 1 row — the model scalar

    // ln p snapped to the 2^-16 grid — the identical expression tree the
    // oracle runs (same casts, same association)
    val lp = floor(log(
      (coalesce(col("c2n"), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col("c1n"), lit(0L)) + col("v")).cast("double"))
      * lit(65536.0)) / lit(65536.0)

    base.select(col("doc_id"), col("g"))
      .join(c2, Seq("g"), "left")
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("c2n"), lp.as("lp"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c2n").isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(col("lp")).as("__slp")) // exact: dyadic summands
      .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
        ((-col("__slp")) / col("n_bigrams")).as("cross_entropy"),
        (((-col("__slp")) / col("n_bigrams")) <= lit(tau)).as("keep"))
  }
}
