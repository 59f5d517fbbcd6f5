package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization as a reusable op: assign a per-key session
  * number such that a new session starts whenever the gap to the previous
  * event exceeds `gapMs`.
  *
  * The classic two-window plan — lag() marks session starts, a running sum
  * numbers them — shuffles ONCE on the key (both windows and any downstream
  * per-session groupBy reuse that partitioning). At 100 TB, events
  * pre-bucketed by the key make it shuffle-free. Streaming twin:
  * graft.streaming.EventStreams.sessionize.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key, ordered by ts then tiebreak). */
  def withSessionSeq(df: DataFrame, key: Column, ts: Column, tiebreak: Column,
      gapMs: Long = 30L * 60 * 1000): DataFrame = {
    val tsUs = unix_micros(ts)
    val byKey = Window.partitionBy(key).orderBy(tsUs, tiebreak)
    df.withColumn("__is_new",
        when(tsUs - lag(tsUs, 1).over(byKey) > gapMs * 1000L, 1)
          .when(lag(tsUs, 1).over(byKey).isNull, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__is_new")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__is_new")
  }
}
