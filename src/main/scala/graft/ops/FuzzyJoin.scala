package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SymSpell-style fuzzy (edit-distance) self-join via deletion
  * neighborhoods.
  *
  * Two strings at Levenshtein distance ≤ 1 always share a member of each
  * other's single-deletion neighborhood: a substitution at position i means
  * deleting position i from both sides yields the same string; an
  * insert/delete means one side IS the other's deletion variant; distance 0
  * shares the string itself. So indexing every row under {s} ∪ {s minus one
  * char} and equi-joining on that key finds EVERY candidate pair without an
  * all-pairs scan — the SymSpell trick, re-expressed as a Spark shuffle
  * join. Candidates are then verified with the codegen'd `levenshtein`
  * built-in, so false key collisions cost one cheap row-level check.
  *
  * Scale shape: the key table is O(n·len) rows, the join shuffles it once
  * hash-partitioned by key, and per-key collision mass is bounded by the
  * data's near-duplicate density — never by n². The naive alternative
  * (cross join + levenshtein filter) is the cartesian-class plan this
  * module exists to avoid. Key skew (many rows sharing a deletion variant)
  * is the same mass the OUTPUT has to carry, so a blow-up here means the
  * answer itself is quadratic, not the plan.
  */
object FuzzyJoin {

  /** One row per (id, name, deletion-neighborhood key). `i = 0` keys the
    * string itself; `i = k` keys the variant with character k removed.
    * Per-row duplicate keys (repeated adjacent characters) are NOT
    * deduplicated here — that would cost a shuffle on (id, key) before the
    * join's shuffle on key; the pair-level distinct after the join absorbs
    * them instead.
    */
  private[graft] def deletionKeys(df: DataFrame, id: Column, s: Column): DataFrame =
    df.select(id.as("id"), s.as("name"))
      .select(col("id"), col("name"),
        explode(sequence(lit(0), length(col("name")))).as("i"))
      .select(col("id"), col("name"),
        when(col("i") === 0, col("name"))
          .otherwise(concat(
            expr("substr(name, 1, i - 1)"),
            expr("substr(name, i + 1)"))).as("key"))

  /** All unordered pairs (id1 < id2) at Levenshtein distance ≤ 1, with the
    * verified distance. Complete by the neighborhood argument above;
    * precise by the final `levenshtein` filter.
    */
  def edit1Pairs(df: DataFrame, id: Column, s: Column): DataFrame = {
    val keys = deletionKeys(df, id, s)
    val a = keys.select(col("id").as("id1"), col("name").as("name1"), col("key"))
    val b = keys.select(col("id").as("id2"), col("name").as("name2"), col("key"))
    a.join(b, Seq("key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("name1"), col("name2"))
      .distinct()
      .filter(levenshtein(col("name1"), col("name2")) <= 1)
      .withColumn("dist", levenshtein(col("name1"), col("name2")))
  }
}
