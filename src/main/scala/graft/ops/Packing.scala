package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — fill fixed token budgets with documents, the step
  * that turns a cleaned corpus into training sequences.
  *
  * Contiguous-fill strategy: documents in a deterministic order get a
  * running token total; `pack_id = floor((cumsum - tokens) / budget)` —
  * i.e. a doc opens a new pack when the previous docs already filled the
  * current budget. Simple, stable, and (unlike first-fit-decreasing)
  * expressible declaratively — bit-exact on any engine.
  *
  * Scale design — the global running sum is TWO-PHASE, never a
  * single-partition window (Spark's unpartitioned `WindowExec` moves ALL
  * rows to one task):
  *   1. rows get an order-preserving bucket id from sampled quantiles of
  *      the order column (bucket boundaries affect only load balance,
  *      never the output);
  *   2. a per-bucket window computes the local running sum — parallel
  *      across `buckets` tasks, one hash shuffle;
  *   3. per-bucket token totals (tiny: ≤ `buckets` rows, partial-agg
  *      combined) are collected, prefix-scanned on the driver (bounded
  *      model data, same pattern as the IVF centroid matrix), and
  *      broadcast-joined back as offsets: `cum = local_cum + offset`.
  * When global pack numbering isn't required, pass a `shard` column
  * instead: packing runs per shard and is embarrassingly parallel with no
  * driver step at all. Docs larger than the budget get a pack of their own
  * (the formula handles it naturally).
  *
  * Cost shape: the global path runs three jobs, but the first two
  * (quantile cuts, bucket totals) are column-pruned scans of just the
  * order/token columns — at 100 TB they read two thin columns; only the
  * final windowed pass reads full-width rows. The extra job-submission
  * overhead is visible at toy scale (sf0.1 bench: ~1.1s vs the old
  * single-partition plan's 0.4s) and is the price of a plan that does not
  * collapse onto one task.
  */
object Packing {

  /** Adds `pack_id` (0-based) + `cum_tokens` under contiguous-fill order by
    * `orderCol`. For the global path (no shard) `orderCol` must be a unique
    * numeric column (ids): quantile sampling needs numeric, uniqueness makes
    * the running sum deterministic.
    *
    * NOTE: the global path (shard = None) is EAGER — it runs two bounded
    * Spark jobs at call time (quantile cuts, per-bucket totals) before
    * returning the lazy result frame. Callers composing lazy pipelines
    * should pass a `shard` column, which keeps everything lazy.
    */
  def packSequences(df: DataFrame, tokens: Column, orderCol: Column,
      budget: Long, shard: Option[Column] = None,
      buckets: Int = 64): DataFrame = shard match {
    case Some(s) =>
      val w = Window.partitionBy(s).orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, 0)
      df.withColumn("cum_tokens", sum(tokens).over(w))
        .withColumn("pack_id",
          floor((col("cum_tokens") - tokens) / budget).cast("long"))

    case None =>
      val spark = df.sparkSession
      val t = df.withColumn("__tok", tokens.cast("long"))
        .withColumn("__ord", orderCol)
      // 1. order-preserving buckets from sampled quantiles. Boundaries are
      // approximate: only parallelism depends on them, not the result.
      val probs = (1 until buckets).map(_.toDouble / buckets).toArray
      // buckets=1 → no cuts (degenerate single bucket); approxQuantile
      // returns null for an empty probability array, so skip the call
      val cuts =
        if (probs.isEmpty) Array.empty[Double]
        else t.stat.approxQuantile("__ord", probs, 0.01).distinct.sorted
      // binary-search bucket assignment (reference-object expression): a
      // chained when() tree is O(buckets) per row and bloats codegen past
      // the default 64 buckets. Bucketing must stay order-consistent with
      // the window's sort for the prefix offsets to be correct: Spark sorts
      // NULL first and NaN last, so NULL pins to bucket 0 and NaN to the
      // last bucket explicitly (the null-intolerant expression would emit
      // NULL / Java NaN-compares-false would emit 0, both order-breaking).
      val bucketed = t.withColumn("__b",
        if (cuts.isEmpty) lit(0)
        else when(col("__ord").isNull, lit(0))
          .when(col("__ord").cast("double").isNaN, lit(cuts.length))
          .otherwise(
            graft.functions.vectors.bucketOf(col("__ord").cast("double"), cuts)))
      // 3. bucket totals → driver prefix scan → broadcast offsets.
      // (Computed from the pre-window frame so the aggregation is a cheap
      // partial-combined scan, not a second pass over shuffled rows.)
      val totals = bucketed.groupBy(col("__b"))
        .agg(sum(col("__tok")).as("__btot"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .sortBy(_._1)
      val offsets = totals.map(_._1)
        .zip(totals.scanLeft(0L)(_ + _._2).dropRight(1))
      val offDf = spark.createDataFrame(offsets.toSeq)
        .toDF("__b", "__off")
      // 2. per-bucket running sum: parallel window, one hash shuffle.
      val w = Window.partitionBy(col("__b")).orderBy(col("__ord"))
        .rowsBetween(Window.unboundedPreceding, 0)
      bucketed
        .withColumn("cum_tokens", sum(col("__tok")).over(w))
        .join(broadcast(offDf), Seq("__b"))
        .withColumn("cum_tokens", col("cum_tokens") + col("__off"))
        .withColumn("pack_id",
          floor((col("cum_tokens") - col("__tok")) / budget).cast("long"))
        .drop("__b", "__off", "__tok", "__ord")
  }
}
