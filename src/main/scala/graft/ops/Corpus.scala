package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-construction operators — the steps between "cleaned documents"
  * and "training batches" in a large-scale LLM data pipeline: benchmark
  * decontamination, stratified sampling, source mixing, window chunking,
  * PII scrubbing, repetition-based quality filtering.
  *
  * All are declarative Column plans. Scale shapes:
  *  - decontamination is the one join (inverted index on shingle identity;
  *    the eval side is tiny → broadcast);
  *  - sampling/scrubbing/chunking are pure per-row projections — zero
  *    shuffle, embarrassingly parallel;
  *  - mixing aggregates to one row per source (partial-agg shuffle of a
  *    handful of counters) and broadcasts the 1-row total back;
  *  - repetition stats shuffle only (doc_id, bigram) pairs, keyed by doc.
  */
object Corpus {

  /** Benchmark decontamination (the published-eval-overlap check used for
    * LLM training sets): flag training documents that share any word n-gram
    * with an evaluation set. Join keys are the distinct 64-bit shingle
    * hashes (8-byte shuffle keys; a hash collision at 2^-64 is noise), the
    * eval side is expected to be tiny (benchmarks) → broadcast, so the
    * training corpus streams through map-side at 100 TB.
    *
    * Returns every train row with `n_shared` (distinct contaminating
    * n-grams) and `contaminated`.
    */
  def decontaminate(train: DataFrame, eval_ : DataFrame, id: Column,
      text: Column, n: Int = 8): DataFrame = {
    def grams(df: DataFrame) = df.select(id.as("doc_id"),
        explode(graft.functions.text.wordShingleHashes(text, n)).as("g"))
    val hits = grams(train)
      .join(broadcast(grams(eval_).select(col("g")).distinct()), "g")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("g")).as("n_shared"))
    train.select(id.as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(col("n_shared") > 0, lit(false)).as("contaminated"))
  }

  /** Deterministic stratified sampling: a row is kept iff the first three
    * hex chars of md5(text) fall below its stratum's threshold — a pure
    * per-row predicate (no shuffle, no RNG state, identical on any engine
    * and any partitioning; re-runs select the same rows). `rateKey3` maps a
    * stratum to a 3-hex-digit cutoff: '800' ≈ 50 %, '333' ≈ 20 %.
    */
  def sampleStratified(df: DataFrame, text: Column, rateKey3: Column): DataFrame =
    df.withColumn("samp_key", substring(md5(text), 1, 3))
      .filter(col("samp_key") < rateKey3)

  /** Quality-weighted deterministic sampling: each row kept with
    * probability = its own `weight` (importance sampling — the curation
    * step that keeps more of the high-quality corpus). The uniform draw is
    * the first 8 md5 hex chars of `key`; the weight becomes a fixed-width
    * hex threshold, so keep = one lexicographic string compare — a pure
    * per-row predicate: no shuffle, no RNG state, identical rows kept on
    * any engine/partitioning/re-run. Weights clamp to [0, 1-2⁻³²] (an
    * unclamped 1.0 would scale to 9 hex digits and truncate into a ~6 %
    * threshold).
    */
  def sampleWeighted(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val scaled = greatest(
      least(floor(weight * lit(4294967296.0)).cast("long"), lit(4294967295L)),
      lit(0L))
    df.withColumn("samp_u", substring(md5(key), 1, 8))
      .withColumn("samp_thresh", lower(lpad(hex(scaled), 8, "0")))
      .filter(col("samp_u") < col("samp_thresh"))
  }

  /** Source-mixing table: per-source document/token counts and a
    * deterministic proportional token-budget allocation. Token sums are
    * exact longs; the allocation is floor(B · share) where share =
    * tokens/total as one double division — share-first, so nothing ever
    * exceeds B in magnitude (a long B·tokens product would overflow
    * silently near 2^63 at extreme corpus sizes). Every engine computing
    * the same IEEE expression gets the identical result. The grand total
    * is a 1-row aggregate broadcast back — never an unpartitioned window.
    */
  def sourceMix(df: DataFrame, source: Column, tokens: Column,
      budget: Long): DataFrame = {
    val per = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens.cast("long")).as("tokens"))
    val total = per.agg(sum(col("tokens")).as("total_tokens"))
    val share = col("tokens").cast("double") / col("total_tokens").cast("double")
    per.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("tokens"),
        share.as("share"),
        floor(lit(budget).cast("double") * share).cast("long")
          .as("token_budget"))
  }

  /** TEMPERATURE-adjusted source mixing (the multilingual / multi-domain
    * sampling rule: p_i ∝ n_i^α flattens the head and boosts the tail,
    * the standard fix for high-resource domains drowning low-resource
    * ones). α is fixed at 1/2 — sqrt is an IEEE correctly-rounded
    * operation in EVERY engine, so unlike a general pow the weights
    * replay bit-for-bit; each sqrt is then snapped to the 2^-20 dyadic
    * grid BEFORE the cross-source sum, making the normalizer an exact
    * (order-free) dyadic sum and the final share/allocation single IEEE
    * divisions/products of identically-rounded operands. One partial-agg
    * shuffle to source grain + a 1-row broadcast — nothing scales with
    * rows but the first aggregate.
    */
  def sourceTemperature(df: DataFrame, source: Column, tokens: Column,
      budget: Long): DataFrame = {
    val G = 1048576.0 // 2^20
    val per = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens.cast("long")).as("tokens"))
      .withColumn("w", floor(sqrt(col("tokens").cast("double")) * G) / G)
    val total = per.agg(sum(col("w")).as("wsum"), // exact: dyadic summands
      sum(col("tokens")).as("total_tokens"))
    per.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("tokens"),
        (col("tokens").cast("double") / col("total_tokens")).as("raw_share"),
        (col("w") / col("wsum")).as("temp_share"),
        floor(lit(budget).cast("double") * (col("w") / col("wsum")))
          .cast("long").as("token_budget"))
  }

  /** Chunk documents into fixed-size training windows with overlap: window
    * of `size` whitespace tokens every `stride` tokens (stride < size →
    * overlapping windows, the usual LM pretraining shape). Scan-side
    * generator — one explode, no shuffle; a doc shorter than `size` yields
    * its single (possibly short) window.
    */
  def chunkWindows(df: DataFrame, id: Column, text: Column,
      winSize: Int, stride: Int): DataFrame = {
    require(winSize >= 1 && stride >= 1 && stride <= winSize,
      s"need 1 <= stride <= winSize, got winSize=$winSize stride=$stride")
    val ws = split(trim(text), "\\s+")
    val len = least(lit(winSize), col("n_tokens") - col("chunk_idx") * stride)
    df.select(id.as("doc_id"), ws.as("__ws"), size(ws).as("n_tokens"))
      .select(col("doc_id"), col("__ws"), col("n_tokens"),
        explode(sequence(lit(0),
          greatest(floor((col("n_tokens") - 1) / stride), lit(0)).cast("int")))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("chunk_start"),
        len.cast("long").as("chunk_len"),
        array_join(slice(col("__ws"), col("chunk_idx") * stride + 1, len), " ")
          .as("chunk_text"))
  }

  /** PII-style scrubbing: redact every match of `pattern` with `tag` and
    * report the per-row redaction count. Pure projection (regexp_replace +
    * regexp_extract_all are codegen'd) — zero shuffle at any scale. The
    * pattern set here is the mechanical stand-in for email/phone/SSN
    * patterns (the testdata carries digit payloads, not synthetic PII).
    */
  def scrub(df: DataFrame, target: Column, pattern: String,
      tag: String): DataFrame =
    df.withColumn("n_redacted",
        size(regexp_extract_all(target, lit(pattern), lit(0))).cast("long"))
      .withColumn("clean", regexp_replace(target, pattern, tag))

  /** Gopher-style repetition statistics per document: duplicate-word ratio
    * (1 - distinct/total) and most-frequent-bigram fraction. Word
    * distinctness is a per-row array op (zero shuffle); the bigram mode
    * needs a real distributed count — explode → count per (doc, bigram) →
    * max per doc, everything keyed by doc_id (two partial-agg shuffles,
    * no row ever leaves its doc's key space).
    */
  def repetitionStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    val words = graft.functions.text.wordShingles(text, 1)
    val perDoc = df.select(id.as("doc_id"),
      size(words).cast("long").as("n_words"),
      size(array_distinct(words)).cast("long").as("n_distinct"))
    val topBigram = df
      .select(id.as("doc_id"),
        explode(graft.functions.text.wordShingles(text, 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bigrams"))
    perDoc.join(topBigram, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_words").cast("double"))
          .as("dup_word_ratio"),
        (col("top_bigram_n").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"))
  }

  /** TOKEN-BUDGET FILL — the data-mixing primitive: per source, keep
    * documents in priority order (most tokens first, doc_id tie-break)
    * until the cumulative token count reaches `budget`; the document that
    * crosses the line is KEPT (keep while tokens-before < budget), and
    * everything after it is dropped. This is how a mixture spec
    * ("300B web tokens, 50B code, ...") becomes a concrete document set.
    *
    * Scale shape — the naive form is a per-source running-sum window,
    * i.e. ONE sorted reducer per source, which melts on a 100 TB web
    * crawl. This implementation runs the window over the (source,
    * token-count) HISTOGRAM instead: group counts + sums per exact token
    * count (histogram-sized, bounded by distinct document lengths, not
    * documents), a cumulative sum over that to find each group's
    * remaining budget, keep-all for interior groups, and a per-doc rank
    * ONLY inside the single boundary group (documents sharing one exact
    * token count). Equivalence to the per-row window is re-proven every
    * round: the DuckDB oracle IS the naive window form.
    */
  def tokenBudgetFill(docs: DataFrame, source: Column, id: Column,
      tokens: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget must be > 0, got $budget")
    val d = docs.select(source.as("source"), id.as("doc_id"),
      tokens.cast("long").as("n_tokens"))
    val h = d.groupBy(col("source"), col("n_tokens"))
      .agg(count(lit(1)).as("g_cnt"), sum(col("n_tokens")).as("g_sum"))
    val hw = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cut = h
      .withColumn("cum_before", coalesce(sum(col("g_sum")).over(hw), lit(0L)))
      .withColumn("br", lit(budget) - col("cum_before"))
      .filter(col("br") > 0L)
      // boundary group: k = ceil(remaining / t); t > 0 here because a
      // zero-token group has g_sum = 0 <= br and takes the keep-all arm
      .withColumn("k_keep", when(col("g_sum") <= col("br"), col("g_cnt"))
        .otherwise(expr("(br + n_tokens - 1) div n_tokens")))
    val bw = Window.partitionBy(col("source"), col("n_tokens"))
      .orderBy(col("doc_id"))
    d.join(cut.select(col("source"), col("n_tokens"), col("k_keep")),
        Seq("source", "n_tokens"))
      .withColumn("rn", row_number().over(bw))
      .filter(col("rn") <= col("k_keep"))
      .select(col("source"), col("doc_id"), col("n_tokens"))
  }
}
