package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size frequency sketches over unbounded streams of items — the
  * Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications"): d hash
  * rows × w counters answer point-frequency queries with one-sided error
  * (estimate ≥ true count, overshoot ≤ e/w · N with probability
  * 1 - e^-d), in O(d·w) memory regardless of item cardinality.
  *
  * Spark-first shape: the sketch IS a (lane, bucket) → count aggregation.
  * Each occurrence emits its d bucket rows map-side; partial aggregation
  * collapses them to ≤ d·w rows PER PARTITION before the shuffle, so the
  * exchange carries at most partitions × d·w counter rows at ANY corpus
  * size — the distributed analog of per-node sketches merged by cell-wise
  * addition (CMS's linearity). Nothing about the build depends on the
  * vocabulary fitting anywhere: 100 TB of tokens still shuffles ≤ a few
  * thousand counter rows per partition.
  *
  * Hashing: ONE md5 digest per occurrence, sliced into d=4 32-bit words
  * (lower lane low/high, upper lane low/high) — the standard
  * one-strong-hash-many-slices construction; md5 keeps every bucket
  * assignment exactly replayable in the DuckDB oracle
  * (md5_number_lower/upper, see TextSketch.md5Lanes). A throughput-first
  * variant would slice xxhash64 instead (same shape, no oracle).
  */
object Sketches {

  val Depth = 4

  /** The d bucket indices of one item value: its two md5 lanes sliced
    * into 32-bit words, masked to `width` (a power of two). Bitwise AND
    * on the signed long equals the unsigned mod; logical shift matches
    * the oracle's unsigned HUGEINT division by 2^32.
    */
  private def buckets(item: Column, width: Int): Column = {
    require(width > 0 && (width & (width - 1)) == 0,
      s"CMS width must be a power of two, got $width")
    val lanes = graft.functions.text.md5Lanes(item)
    val m = lit(width - 1L)
    array(
      lanes(0).bitwiseAND(m),
      shiftrightunsigned(lanes(0), 32).bitwiseAND(m),
      lanes(1).bitwiseAND(m),
      shiftrightunsigned(lanes(1), 32).bitwiseAND(m))
  }

  /** Build the sketch: (lane, bucket, cnt), one row per NON-EMPTY counter
    * (absent cells are zero; at most Depth × width rows). `items` is one
    * row per occurrence.
    */
  def cmsBuild(items: DataFrame, item: Column, width: Int): DataFrame =
    items
      .select(posexplode(buckets(item, width)).as(Seq("lane", "bucket")))
      .groupBy(col("lane"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for `queries` (one row per distinct item in
    * column `item`): min over the item's d counters. The sketch side is
    * tiny (≤ Depth × width rows) and broadcasts; estimates never
    * undercount, so `est ≥` the true count always (CMS's one-sided
    * guarantee — pinned in Round7Spec). LEFT join: the sketch stores only
    * non-empty counters, so an absent cell is a ZERO count — an item some
    * of whose cells were never touched must estimate through those zeros
    * (an unseen item correctly estimates 0), not lose the lane or vanish.
    */
  def cmsEstimate(cms: DataFrame, queries: DataFrame, item: Column,
      width: Int): DataFrame =
    queries
      .select(item.as("item"),
        posexplode(buckets(item, width)).as(Seq("lane", "bucket")))
      .join(broadcast(cms), Seq("lane", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
