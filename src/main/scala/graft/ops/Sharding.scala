package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard assignment + deterministic global shuffle — the LAST
  * step of a training-data pipeline: every document gets a stable
  * pseudo-random position inside a stable shard, so shard files can be
  * written in a reproducible "shuffled" order (data order affects
  * training; reproducibility demands it be a pure function of the data).
  *
  * Shuffle key = md5 of the doc id: content-independent, uniform, and the
  * one hash both engines share, so the whole permutation is exactly
  * replayable in the DuckDB oracle.
  *
  * Scale shape (the Packing two-phase pattern, applied to enumeration):
  * a naive `row_number() OVER (PARTITION BY shard)` caps parallelism at
  * nShards reducers — a single reducer per shard sorts billions of rows
  * at 100 TB. Instead positions are enumerated in two phases:
  *   1. one COUNT pass per (shard, subbucket) — subbucket = the next hex
  *      digit of the key, so nShards×16 groups; the counts (≤ a few KB)
  *      come to the driver, prefix-summed per shard, broadcast back;
  *   2. row_number only WITHIN (shard, subbucket) + the subbucket's
  *      offset — parallelism nShards×16, each sort 1/16th of a shard.
  * Widening the subbucket to two hex digits (×256) is the knob when
  * shards outgrow a reducer; the enumeration stays identical.
  */
object Sharding {

  /** Value 0-15 of the `i`-th hex char (1-based) of `hexCol` — engine-
    * portable (ascii arithmetic; both engines lowercase md5 hex).
    */
  private def hexDigit(hexCol: Column, i: Int): Column = {
    val a = ascii(substring(hexCol, i, 1))
    (a - when(a >= 97, 87).otherwise(48)).cast("int")
  }

  /** (doc_id, shard, pos): shard in [0, nShards), pos = 0-based position
    * of the doc in its shard's deterministic shuffled order
    * (subbucket, key, doc_id ascending).
    *
    * nShards must DIVIDE 16: the shard is a uniform hex digit mod
    * nShards, and a non-divisor (say 10) would give shards 0-5 twice the
    * mass of shards 6-9 — 2x shard files and 2x sort work, silently
    * breaking the uniformity contract. More shards → route on more
    * digits.
    *
    * INPUT CONTRACT: `df` must be an immutable snapshot (a lake manifest /
    * fixed file set). The two phases read it twice; if the source changes
    * between the count pass and the enumeration pass, offsets and ranks
    * disagree and positions silently duplicate or gap. (Unlike Packing,
    * whose collected boundaries only steer parallelism, here phase
    * agreement is a correctness requirement.) The CorpusSpec density
    * check is the post-hoc detector for a violated contract.
    */
  def shardShuffle(df: DataFrame, id: Column, nShards: Int): DataFrame = {
    require(nShards >= 1 && 16 % nShards == 0,
      s"nShards must divide 16 (uniform hex-digit routing; got $nShards) " +
        "— a non-divisor skews shard mass 2:1")
    val keyed = df.select(id.as("doc_id"))
      .withColumn("__key", md5(col("doc_id").cast("string")))
      .withColumn("shard", hexDigit(col("__key"), 1) % nShards)
      .withColumn("__sub", hexDigit(col("__key"), 2))
    // phase 1: bounded counts → per-shard prefix offsets (≤ nShards×16
    // rows ever reach the driver — a model step, like Packing's buckets)
    val counts = keyed.groupBy(col("shard"), col("__sub"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Int]("__sub")) -> r.getAs[Long]("__n"))
      .toMap
    val offsets = counts.keys.groupBy(_._1).flatMap { case (shard, ks) =>
      ks.toSeq.sortBy(_._2).foldLeft((0L, List.empty[((Int, Int), Long)])) {
        case ((acc, out), k) => (acc + counts(k), (k -> acc) :: out)
      }._2
    }
    val offsetDf = keyed.sparkSession.createDataFrame(
      offsets.toSeq.map { case ((s, b), o) => (s, b, o) })
      .toDF("shard", "__sub", "__off")
    // phase 2: enumerate within each (shard, subbucket) — nShards×16-way
    // parallel — and add the broadcast offset. LEFT join + loud null
    // check: with an inner join, a row whose (shard, subbucket) group was
    // absent in phase 1 (source changed between the passes — the input
    // contract above violated) would be silently DROPPED; instead it now
    // fails the job with an explicit diagnosis.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("__sub"))
      .orderBy(col("__key"), col("doc_id"))
    keyed.join(broadcast(offsetDf), Seq("shard", "__sub"), "left")
      .select(col("doc_id"), col("shard"),
        (when(col("__off").isNull,
          raise_error(concat(lit("shardShuffle: subbucket unseen by the " +
            "count pass (shard="), col("shard"), lit(", sub="), col("__sub"),
            lit(") — the input snapshot changed between phases"))))
          .otherwise(col("__off"))
          + row_number().over(w) - 1).as("pos"))
  }

  /** Curriculum enumeration — the shardShuffle two-phase pattern applied
    * to ORDERED tiers: a deterministic global position that walks tier 0
    * first (shuffled within), then tier 1, and so on. The training-data
    * shape for curriculum ordering: sort the corpus by a difficulty/
    * quality tier, shuffle within each tier, and never pay a global sort —
    * phase 1 counts per (tier, subbucket), the driver prefix-sums them in
    * (tier, sub) order (≤ nTiers×16 rows — a bounded model step), phase 2
    * ranks within (tier, subbucket) only, parallelism nTiers×16.
    *
    * Same INPUT CONTRACT as shardShuffle (immutable snapshot between the
    * two passes), with the same loud left-join guard.
    */
  def curriculumOrder(df: DataFrame, id: Column, tier: Column): DataFrame = {
    val keyed = df.select(id.as("doc_id"), tier.cast("int").as("tier"))
      .withColumn("__key", md5(col("doc_id").cast("string")))
      .withColumn("__sub", hexDigit(col("__key"), 1))
    val counts = keyed.groupBy(col("tier"), col("__sub"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getAs[Int]("tier"), r.getAs[Int]("__sub")) -> r.getAs[Long]("__n"))
      .toMap
    val offsets = counts.keys.toSeq.sorted
      .foldLeft((0L, List.empty[((Int, Int), Long)])) {
        case ((acc, out), k) => (acc + counts(k), (k -> acc) :: out)
      }._2
    val offsetDf = keyed.sparkSession.createDataFrame(
      offsets.map { case ((t, b), o) => (t, b, o) })
      .toDF("tier", "__sub", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tier"), col("__sub"))
      .orderBy(col("__key"), col("doc_id"))
    keyed.join(broadcast(offsetDf), Seq("tier", "__sub"), "left")
      .select(col("doc_id"), col("tier"),
        (when(col("__off").isNull,
          raise_error(concat(lit("curriculumOrder: subbucket unseen by the " +
            "count pass (tier="), col("tier"), lit(", sub="), col("__sub"),
            lit(") — the input snapshot changed between phases"))))
          .otherwise(col("__off"))
          + row_number().over(w) - 1).as("pos"))
  }
}
