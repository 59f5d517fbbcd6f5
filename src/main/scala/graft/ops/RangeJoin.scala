package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point column matched to right
  * rows with [start, end) intervals, per key — "which session/campaign/
  * validity window does this event fall into".
  *
  * The naive plan is an inequality theta-join: Spark can only execute it as
  * a (broadcast) nested loop — O(|L|·|R|) per key. This implementation
  * BUCKETIZES time: each interval explodes to the buckets it covers, each
  * point maps to exactly one bucket, the join is a plain equi-join on
  * (key, bucket) followed by the exact containment filter. Work becomes
  * O(|L| + Σ interval_len/bucket) with hash-partition parallelism — the
  * standard trick Spark itself lacks natively.
  *
  * `bucketMs` tunes fan-out: ≈ the median interval length is right; much
  * smaller explodes the right side, much larger degrades toward per-key
  * cross products (every pair lands in one bucket).
  */
object RangeJoin {

  /** Inner join: left (key, point) ⋈ right (key, [start, end)).
    * Columns from both frames are kept; alias collisions are the caller's
    * to avoid. Point/start/end are timestamps.
    */
  def pointInInterval(left: DataFrame, right: DataFrame, key: String,
      point: Column, start: Column, end: Column,
      bucketMs: Long = 60L * 60 * 1000): DataFrame = {
    val bucket = lit(bucketMs * 1000L) // micros
    val l = left.withColumn("__b", floor(unix_micros(point) / bucket))
    val r = right
      .filter(end > start) // sequence(a,b) DESCENDS when a > b — drop empties
      .withColumn("__bs", floor(unix_micros(start) / bucket))
      .withColumn("__be", floor((unix_micros(end) - 1) / bucket))
      .withColumn("__b", explode(expr("sequence(__bs, __be)")))
      .drop("__bs", "__be")
    l.join(r, Seq(key, "__b"))
      .filter(point >= start && point < end)
      .drop("__b")
  }
}
