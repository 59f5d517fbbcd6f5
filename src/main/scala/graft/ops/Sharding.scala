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
  *   1. one COUNT pass per (group, subbucket) — subbucket = the next hex
  *      digit of the key, so nGroups×16 groups; the counts (≤ a few KB)
  *      come to the driver, prefix-summed, broadcast back;
  *   2. row_number only WITHIN (group, subbucket) + the subbucket's
  *      offset — parallelism nGroups×16, each sort 1/16th of a group.
  * Widening the subbucket to two hex digits (×256) is the knob when
  * groups outgrow a reducer; the enumeration stays identical. Both
  * public enumerations (shardShuffle, curriculumOrder) share ONE
  * two-phase core — only the group key and the driver-side prefix-sum
  * layout differ.
  */
object Sharding {

  /** Value 0-15 of the `i`-th hex char (1-based) of `hexCol` — engine-
    * portable (ascii arithmetic; both engines lowercase md5 hex).
    */
  private def hexDigit(hexCol: Column, i: Int): Column = {
    val a = ascii(substring(hexCol, i, 1))
    (a - when(a >= 97, 87).otherwise(48)).cast("int")
  }

  /** The shared two-phase core. `keyed` must carry (doc_id, <g: int>,
    * __key, __sub); `offsetsOf` lays out the driver-side prefix sums
    * (per-group for shards, globally ordered for curriculum tiers).
    *
    * INPUT CONTRACT: `keyed`'s source must be an immutable snapshot (a
    * lake manifest / fixed file set). The two phases read it twice; if
    * the source changes between the count pass and the enumeration pass,
    * offsets and ranks disagree and positions silently duplicate or gap.
    * (Unlike Packing, whose collected boundaries only steer parallelism,
    * here phase agreement is a correctness requirement.) Hence the LEFT
    * join + loud raise_error: a row whose (group, subbucket) was absent
    * in phase 1 fails the job with an explicit diagnosis instead of
    * being silently dropped by an inner join.
    */
  private def twoPhase(keyed: DataFrame, g: String, opName: String,
      offsetsOf: Map[(Int, Int), Long] => Seq[((Int, Int), Long)]): DataFrame = {
    // phase 1: bounded counts (≤ nGroups×16 rows reach the driver — a
    // model step, like Packing's buckets)
    val counts = keyed.groupBy(col(g), col("__sub"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getAs[Int](g), r.getAs[Int]("__sub")) -> r.getAs[Long]("__n"))
      .toMap
    val offsetDf = keyed.sparkSession.createDataFrame(
      offsetsOf(counts).map { case ((a, b), o) => (a, b, o) })
      .toDF(g, "__sub", "__off")
    // phase 2: enumerate within each (group, subbucket) + broadcast offset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(g), col("__sub"))
      .orderBy(col("__key"), col("doc_id"))
    keyed.join(broadcast(offsetDf), Seq(g, "__sub"), "left")
      .select(col("doc_id"), col(g),
        (when(col("__off").isNull,
          raise_error(concat(lit(s"$opName: subbucket unseen by the " +
            s"count pass ($g="), col(g), lit(", sub="), col("__sub"),
            lit(") — the input snapshot changed between phases"))))
          .otherwise(col("__off"))
          + row_number().over(w) - 1).as("pos"))
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
    */
  def shardShuffle(df: DataFrame, id: Column, nShards: Int): DataFrame = {
    require(nShards >= 1 && 16 % nShards == 0,
      s"nShards must divide 16 (uniform hex-digit routing; got $nShards) " +
        "— a non-divisor skews shard mass 2:1")
    val keyed = df.select(id.as("doc_id"))
      .withColumn("__key", md5(col("doc_id").cast("string")))
      .withColumn("shard", hexDigit(col("__key"), 1) % nShards)
      .withColumn("__sub", hexDigit(col("__key"), 2))
    twoPhase(keyed, "shard", "shardShuffle", counts =>
      // prefix offsets restart at 0 WITHIN each shard (positions are
      // per-shard-file)
      counts.keys.groupBy(_._1).toSeq.flatMap { case (_, ks) =>
        ks.toSeq.sortBy(_._2).foldLeft((0L, List.empty[((Int, Int), Long)])) {
          case ((acc, out), k) => (acc + counts(k), (k -> acc) :: out)
        }._2
      })
  }

  /** Curriculum enumeration — the two-phase pattern applied to ORDERED
    * tiers: a deterministic GLOBAL position that walks tier 0 first
    * (md5-shuffled within), then tier 1, and so on — "sort the corpus by
    * quality tier, shuffle within each tier" with zero global sort.
    * Parallelism nTiers×16. `tier` must be a NON-NULL integral expression
    * — a null tier (say a quality score gone NaN on empty text) would
    * silently alias with tier 0 in the count map, so it fails the count
    * pass loudly instead.
    */
  def curriculumOrder(df: DataFrame, id: Column, tier: Column): DataFrame = {
    val keyed = df.select(id.as("doc_id"),
        when(tier.isNull, raise_error(lit("curriculumOrder: null tier — " +
          "the tier expression must be total over the input")))
          .otherwise(tier).cast("int").as("tier"))
      .withColumn("__key", md5(col("doc_id").cast("string")))
      .withColumn("__sub", hexDigit(col("__key"), 1))
    twoPhase(keyed, "tier", "curriculumOrder", counts =>
      // ONE global prefix walk in (tier, sub) order — positions never
      // restart, so the enumeration is corpus-global
      counts.keys.toSeq.sorted
        .foldLeft((0L, List.empty[((Int, Int), Long)])) {
          case ((acc, out), k) => (acc + counts(k), (k -> acc) :: out)
        }._2)
  }
}
