package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension type-2 history build (Kimball's SCD2) from a
  * change stream — the warehouse-side shape of CDC ingestion: collapse a
  * per-key attribute stream to its CHANGE rows and emit versioned validity
  * intervals [valid_from, valid_to), open-ended on the current version.
  *
  * Spark-first shape: one key-partitioned sort serves every window — the
  * change detection (lag), the interval close (lead) and the version
  * number (row_number) all run over the same (key) × (ts, tieBreak)
  * ordering, and the second window pass operates on the FILTERED change
  * rows without re-shuffling (filter preserves the hash partitioning, so
  * Catalyst plans exactly one exchange for the whole build). At 100 TB
  * this is the minimum possible: one shuffle of the stream by key, no
  * state beyond the sort.
  */
object Scd {

  /** Build the SCD2 history of `attr` per `key`, ordered by (`ts`,
    * `tieBreak`) (the tie-break makes equal-timestamp streams
    * deterministic). Consecutive equal attribute values collapse into one
    * interval (null-safe comparison: a null attribute value is a value).
    * Returns (key, attr, valid_from, valid_to, version, is_current) with
    * valid_to = the next change's valid_from (exclusive bound), null on
    * the current version.
    */
  def scd2History(df: DataFrame, key: Column, ts: Column, attr: Column,
      tieBreak: Column): DataFrame = {
    val byKey = Window.partitionBy(col("__k"))
      .orderBy(col("valid_from"), col("__tie"))
    val changes = df
      .select(key.as("__k"), ts.as("valid_from"), attr.as("__a"),
        tieBreak.as("__tie"))
      .withColumn("__prev", lag(col("__a"), 1).over(byKey))
      // first row per key (lag null marker can collide with a null attr —
      // use row_number to disambiguate) or a null-safe value change
      .withColumn("__rn", row_number().over(byKey))
      .filter(col("__rn") === 1 || !(col("__a") <=> col("__prev")))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byKey))
      .withColumn("version", row_number().over(byKey))
      .select(col("__k").as("key"), col("__a").as("attr"),
        col("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
  }
}
