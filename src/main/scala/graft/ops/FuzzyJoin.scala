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

  /** One row per (id, name, DISTINCT deletion-neighborhood key): the string
    * itself plus every single-character deletion variant. Repeated
    * characters make many deletion positions collide (a run of k zeros
    * yields ONE distinct variant, not k) — deduplicating per row BEFORE the
    * explode is free (array_distinct over ≤len+1 elements, no shuffle) and
    * matters: without it a pair sharing a key of per-row multiplicity m, m'
    * joins m·m' times and the pair-level distinct pays that blow-up in
    * shuffle mass (measured 36× on zero-padded id-style names).
    */
  private[graft] def deletionKeys(df: DataFrame, id: Column, s: Column): DataFrame =
    df.select(id.as("id"), s.as("name"))
      .select(col("id"), col("name"),
        explode(array_distinct(expr(
          "transform(sequence(0, length(name)), i -> " +
            "CASE WHEN i = 0 THEN name " +
            "ELSE concat(substr(name, 1, i - 1), substr(name, i + 1)) END)")))
          .as("key"))

  /** The key-equi-join's raw output: every (id1 < id2) meeting under at
    * least one shared deletion key, duplicated once per shared key (a
    * dist-1 pair shares 1-2 keys).
    */
  private def joinedCandidates(df: DataFrame, id: Column, s: Column): DataFrame = {
    val keys = deletionKeys(df, id, s)
    val a = keys.select(col("id").as("id1"), col("name").as("name1"), col("key"))
    val b = keys.select(col("id").as("id2"), col("name").as("name2"), col("key"))
    a.join(b, Seq("key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("name1"), col("name2"))
  }

  /** The distinct pre-verification candidate pairs — the join mass the
    * neighborhood index admits. ScalingBench's measured quantity (must grow
    * ∝ near-dup density, not n²); the production path does NOT pay this
    * distinct — see edit1Pairs.
    */
  def candidatePairs(df: DataFrame, id: Column, s: Column): DataFrame =
    joinedCandidates(df, id, s).distinct()

  /** All unordered pairs (id1 < id2) at Levenshtein distance ≤ 1, with the
    * verified distance. Complete by the neighborhood argument above;
    * precise by the `levenshtein` filter — which runs BEFORE the pair-level
    * distinct: the verify is a cheap codegen call per joined row, and
    * filtering first keeps the non-pair bulk of the candidate mass
    * (measured ~3.6× here) out of the dedup shuffle.
    */
  def edit1Pairs(df: DataFrame, id: Column, s: Column): DataFrame =
    joinedCandidates(df, id, s)
      // the THRESHOLDED levenshtein computes only a 3-cell band per row
      // (O(L) with early abandon, vs the full O(L²) DP — measured ~3s of
      // the query's 5s on 1M candidates) and returns -1 past the bound
      .withColumn("dist", levenshtein(col("name1"), col("name2"), 1))
      .filter(col("dist") >= 0)
      .distinct()

  /** [[deletionKeys]] carrying a STRONG blocking field alongside the name
    * — the key-store row shape for linkage pipelines that pair fuzzy names
    * with an exact-agreement field (match on exact DOB + fuzzy name; the
    * entity-resolution rows use the account balance). Persisting the
    * strong field WITH the keys is what lets the pair join block on it.
    */
  private[graft] def deletionKeysWith(df: DataFrame, id: Column, s: Column,
      strong: Column): DataFrame =
    df.select(id.as("id"), s.as("name"), strong.as("strong"))
      .select(col("id"), col("name"), col("strong"),
        explode(array_distinct(expr(
          "transform(sequence(0, length(name)), i -> " +
            "CASE WHEN i = 0 THEN name " +
            "ELSE concat(substr(name, 1, i - 1), substr(name, i + 1)) END)")))
          .as("key"))

  /** All unordered pairs (id1 < id2) at Levenshtein distance ≤ 1 whose
    * STRONG field also agrees exactly — [[edit1Pairs]] with the strong
    * field pushed INTO the candidate join key (r19, optimization guide
    * §2.3/§3.2: block early, shuffle decisions not bulk). Against the
    * post-join filter form (derive every fuzzy pair, then join the strong
    * field on and drop disagreements) this collapses the candidate mass
    * at the join itself: near-sequential name corpora share deletion keys
    * in ~10-row runs, so fuzzy-alone candidates are O(10·n·len) rows that
    * the strong filter then throws away — blocking on (key, strong)
    * admits only the pairs the output can contain (plus hash-free exact
    * collisions the levenshtein verify kills). Output is identical by
    * construction: {(id1,id2) : dist ≤ 1 ∧ strong1 = strong2} either way.
    */
  def edit1StrongPairs(df: DataFrame, id: Column, s: Column,
      strong: Column): DataFrame = {
    val keys = deletionKeysWith(df, id, s, strong)
    edit1StrongPairsFromKeys(keys)
  }

  /** [[edit1StrongPairs]] over pre-built [[deletionKeysWith]] rows — the
    * form the incremental path uses for its persisted key stores.
    */
  private[graft] def edit1StrongPairsFromKeys(keys: DataFrame): DataFrame = {
    val a = keys.select(col("id").as("id1"), col("name").as("name1"),
      col("strong"), col("key"))
    val b = keys.select(col("id").as("id2"), col("name").as("name2"),
      col("strong"), col("key"))
    a.join(b, Seq("key", "strong"))
      .filter(col("id1") < col("id2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2"), 1))
      .filter(col("dist") >= 0)
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** INCREMENTAL form of [[edit1StrongPairs]] — every strong-agreeing
    * dist ≤ 1 pair that TOUCHES the probe side (probe-internal plus
    * probe-vs-index), over persisted [[deletionKeysWith]] stores. The
    * [[edit1IncrementalPairs]] contract otherwise applies verbatim
    * (normalization to id1 < id2, index-internal pairs never re-derived).
    */
  def edit1IncrementalStrongPairs(probeKeys: DataFrame,
      indexKeys: DataFrame): DataFrame = {
    val a = probeKeys.select(col("id").as("id1"), col("name").as("name1"),
      col("strong"), col("key"))
    val b = indexKeys.unionByName(probeKeys)
      .select(col("id").as("id2"), col("name").as("name2"),
        col("strong"), col("key"))
    a.join(b, Seq("key", "strong"))
      .filter(col("id1") =!= col("id2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2"), 1))
      .filter(col("dist") >= 0)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
      .distinct()
  }

  /** INCREMENTAL form of [[edit1Pairs]] — the daily-linkage shape: every
    * dist ≤ 1 pair that TOUCHES the probe side (probe-internal plus
    * probe-vs-index; index-internal pairs were resolved in an earlier
    * generation and must not be re-derived). Both inputs are persisted
    * [[deletionKeys]] rows (`id, name, key`) — the index side is the
    * blocking store a real pipeline keeps in the lake (bucketed by key at
    * scale, so only the day's probe keys shuffle), the probe side is
    * written once per batch and read back (key each mention exactly once,
    * ever). Pairs are normalized to id1 < id2 so probe-internal pairs
    * meeting in both orders collapse in the distinct.
    */
  def edit1IncrementalPairs(probeKeys: DataFrame,
      indexKeys: DataFrame): DataFrame = {
    val a = probeKeys.select(col("id").as("id1"), col("name").as("name1"),
      col("key"))
    val b = indexKeys.unionByName(probeKeys)
      .select(col("id").as("id2"), col("name").as("name2"), col("key"))
    a.join(b, Seq("key"))
      .filter(col("id1") =!= col("id2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2"), 1))
      .filter(col("dist") >= 0)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"), col("dist"))
      .distinct()
  }
}
