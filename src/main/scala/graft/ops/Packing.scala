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
  * current budget. Single window over one global ordering. Simple, stable,
  * and (unlike first-fit-decreasing) expressible as one window — bit-exact
  * on any engine.
  *
  * Scale note: a single global ordering means ONE range-partitioned sort at
  * 100 TB — heavy but standard (it's a terasort). When global pack numbering
  * isn't required, pass a `shard` column: packing runs per shard (e.g. per
  * ingest partition), the sort becomes per-shard, and pack ids are
  * (shard, local id) — embarrassingly parallel. Docs larger than the budget
  * get a pack of their own (the formula handles it naturally).
  */
object Packing {

  /** Adds `pack_id` (0-based) + `cum_tokens` under contiguous-fill order by
    * `orderCol`.
    */
  def packSequences(df: DataFrame, tokens: Column, orderCol: Column,
      budget: Long, shard: Option[Column] = None): DataFrame = {
    val w0 = shard.map(Window.partitionBy(_)).getOrElse(Window.partitionBy())
    val w = w0.orderBy(orderCol).rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("cum_tokens", sum(tokens).over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - tokens) / budget).cast("long"))
  }
}
