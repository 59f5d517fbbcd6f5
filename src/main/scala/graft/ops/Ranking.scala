package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT global ranking (round 16 — retires the last two
  * unpartitioned/low-partition NTILE windows): a `row_number() OVER
  * (ORDER BY key)` with no partition key funnels the whole frame through
  * ONE reducer's sort; partitioning by a 5-value dimension caps
  * parallelism at 5. This computes the identical 1-based rank with the
  * Sharding/Packing two-phase discipline:
  *
  *   1. bucket every row by an ORDER-PRESERVING, BOUNDED-cardinality
  *      quantization of the sort key (log-scale: ~32 buckets per binary
  *      octave, hard-clamped to a few thousand ids — the bucket is
  *      internal plumbing, so libm log2 is fine: it never reaches the
  *      output and both phases evaluate the same expression on the same
  *      values);
  *   2. one bounded aggregate counts rows per (group, bucket); a window
  *      over that COUNTS frame (catalog-sized — thousands of rows, not
  *      data-sized) prefix-sums the offsets, broadcast back;
  *   3. row_number runs WITHIN (group, bucket) — parallelism = occupied
  *      buckets — and the offset lifts it to the exact global rank.
  *
  * Rank-derived quantities (NTILE, PERCENT_RANK, CUME_DIST over a
  * tie-broken TOTAL order) are then map-side closed forms of (rank, n) —
  * see [[ntileOf]]. Degenerate skew (every key value identical) folds
  * into one bucket and inherits the old single-reducer cost; real
  * metrics spread across octaves.
  *
  * Both phases re-scan the input, so the source must be a deterministic
  * snapshot (the Sharding input contract); an unseen (group, bucket) in
  * phase 2 fails loudly instead of silently dropping rows.
  */
object Ranking {

  /** Order-preserving bounded bucketing of a numeric sort key: monotone
    * non-decreasing in `v` (ascending direction), ≤ ~4100 distinct ids.
    * NULL keys fail loudly — a NULL would silently vanish from the
    * count pass and corrupt every later offset.
    */
  private def monotoneBucket(v: Column): Column = {
    val pos = greatest(least(floor(log2(v) * lit(32.0)).cast("long"),
      lit(2047L)), lit(-2048L))
    val neg = lit(-8000L) + greatest(least(
      floor(-log2(-v) * lit(32.0)).cast("long"), lit(2047L)), lit(-2048L))
    when(v.isNull, raise_error(lit(
      "Ranking.withRank: NULL sort key — rank order over NULLs is " +
        "undefined here; filter or coalesce them first")))
      .when(v > 0.0, pos)
      .when(v < 0.0, neg)
      .otherwise(lit(-3000L)) // zero sits between the two log ranges
  }

  /** Adds `rankName` (exact 1-based rank within `groupCols`, ordered by
    * (`keyCol` asc/desc, `tieCol` asc — the tie column must make the
    * order TOTAL)) and `nName` (group row count) to `df`. No global
    * sort anywhere: see the object scaladoc for the two-phase shape.
    * Offsets are prefix-summed driver-side over the BOUNDED count rows
    * (≤ ~4100 per group — the Sharding.twoPhase model step) and
    * broadcast back, so the plan carries no unpartitioned window at all.
    */
  def withRank(df: DataFrame, groupCols: Seq[String], keyCol: String,
      desc: Boolean, tieCol: String, rankName: String,
      nName: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = col(keyCol).cast("double")
    val keyed = df.withColumn("__rb",
      monotoneBucket(if (desc) -dir else dir))
    val gb = groupCols :+ "__rb"
    val counts = keyed.groupBy(gb.map(col): _*)
      .agg(count(lit(1)).as("__rc"))
    // phase 1: bounded counts → driver prefix sums (a model step — the
    // collected mass is buckets × groups, catalog-sized by construction)
    val countRows = counts.collect()
    val offRows = countRows.groupBy(r => groupCols.map(r.getAs[Any]))
      .valuesIterator.flatMap { rs =>
        val sorted = rs.sortBy(_.getAs[Long]("__rb"))
        val total = sorted.iterator.map(_.getAs[Long]("__rc")).sum
        var acc = 0L
        sorted.map { r =>
          val off = acc
          acc += r.getAs[Long]("__rc")
          Row.fromSeq(groupCols.map(r.getAs[Any]) ++
            Seq(r.getAs[Long]("__rb"), off, total))
        }
      }.toSeq
    val offSchema = StructType(
      counts.schema.fields.filter(_.name != "__rc") ++
        Seq(StructField("__roff", LongType, nullable = false),
          StructField(nName, LongType, nullable = false)))
    val offs = df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(offRows, 1), offSchema)
    // phase 2: row_number WITHIN (group, bucket) + the broadcast offset
    val w = Window.partitionBy(gb.map(col): _*)
      .orderBy((if (desc) col(keyCol).desc else col(keyCol).asc) ::
        col(tieCol).asc :: Nil: _*)
    keyed.join(broadcast(offs), gb, "left")
      .withColumn(rankName,
        when(col("__roff").isNull, raise_error(lit(
          "Ranking.withRank: bucket unseen by the count pass — the " +
            "input snapshot changed between phases")))
          .otherwise(col("__roff")) + row_number().over(w))
      .drop("__rb", "__roff")
  }

  /** NTILE(k) as a closed form of (rank, n) — the exact SQL-standard
    * bucket sizing (first n%k buckets get ⌈n/k⌉ rows): identical output
    * to `ntile(k) OVER (ORDER BY ...)` over the same total order, but
    * map-side. Double division is safe here: operands are exact integers
    * ≤ 2^53 and the true quotient is ≥ 1/n away from the nearest integer
    * it could misround to.
    */
  def ntileOf(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / lit(k)).cast("long")
    val r = n % lit(k)
    val cutoff = (q + 1) * r
    when(q === 0, rank)
      .when(rank <= cutoff, floor((rank - 1) / (q + 1)).cast("long") + 1)
      .otherwise(r + floor((rank - cutoff - 1) / q).cast("long") + 1)
  }
}
