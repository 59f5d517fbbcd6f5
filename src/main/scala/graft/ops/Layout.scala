package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the data-skipping story for the
  * 100 TB lake: interleave the bits of two clustering keys so that rows
  * close in BOTH dimensions land in the same file, giving every file a
  * tight min/max envelope on BOTH columns. A scan filtered on either key
  * (or a rectangle on both) then prunes most files from parquet footer
  * stats alone — the effect a single-column sort gives one column, Z-order
  * gives all interleaved columns at once (Morton 1966; the same layout
  * Delta's OPTIMIZE ZORDER and Iceberg's sort-order rewrite produce).
  *
  * Scale shape: the z-value is a pure per-row expression (codegen'd bit
  * arithmetic, no shuffle); file assignment is a RANGE of the z-space
  * (`z >> shift`), also pure — so the whole layout is computed map-side
  * with zero global sort. A production writer would follow with one
  * `repartitionByRange`-style shuffle on `file_id` to co-locate each
  * file's rows; the per-file stats aggregation here IS that shuffle
  * (one hash exchange on file_id). Fixed-width z-ranges trade perfectly
  * even file sizes for determinism — production writers sample range
  * boundaries instead; the z-expression is identical either way.
  */
object Layout {

  /** Morton z-value of (x, y): bit i of x → bit 2i, bit i of y → bit
    * 2i+1. Both inputs must already be masked into [0, 2^bits); the
    * result occupies the low 2*bits bits. Pure bit arithmetic — stays
    * inside whole-stage codegen, and replays exactly in any engine with
    * `>>`, `&`, `<<`.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Hilbert-curve distance of (x, y) — the strictly-better-locality
    * sibling of [[zValue]] (Hilbert 1891; what Iceberg-style layout
    * writers offer beside Morton): consecutive curve positions are
    * always GRID-ADJACENT, so a contiguous d-range's (x, y) hull is
    * tighter than the same-width Morton range's — Morton takes long
    * diagonal jumps at quadrant seams, which blow up the bounding box of
    * any file that straddles one. Where the two differ in practice is
    * UNALIGNED range probes: on dyadic-aligned boxes both curves keep
    * each box a contiguous range, but an offset box shatters into far
    * fewer/tighter file envelopes under Hilbert (q_optimize_hilbert
    * measures exactly this, three layouts side by side). Inputs
    * pre-masked into [0, 2^bits); pure integer arithmetic via a codegen
    * Expression (see LayoutExprs for why not a Column fold).
    */
  def hilbertValue(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graft.LayoutColumns.hilbertValue(x, y, bits)

  /** Per-file skipping envelope of a Z-order layout over
    * (xCol % 2^bits, yCol % 2^bits) with `nFiles` fixed-width z-ranges:
    * (file_id, n_rows, z_min, z_max, min/max of both keys). The min/max
    * columns are exactly what the parquet footer would carry per file —
    * the output IS the skipping index the layout buys.
    *
    * nFiles must be a power of two ≤ 4^bits so a file is `z >> shift`
    * for an integer shift (exact, engine-portable).
    */
  def zorderStats(df: DataFrame, xCol: Column, yCol: Column,
      bits: Int, nFiles: Int): DataFrame = {
    require(nFiles >= 1 && (nFiles & (nFiles - 1)) == 0,
      s"nFiles must be a power of two, got $nFiles")
    val log2Files = java.lang.Integer.numberOfTrailingZeros(nFiles)
    require(log2Files <= 2 * bits,
      s"nFiles=$nFiles exceeds the z-space 4^$bits")
    val mask = (1L << bits) - 1
    val x = xCol.bitwiseAND(lit(mask))
    val y = yCol.bitwiseAND(lit(mask))
    val z = zValue(x, y, bits)
    df.select(x.as("__x"), y.as("__y"), z.as("__z"))
      .withColumn("file_id",
        shiftright(col("__z"), 2 * bits - log2Files).cast("int"))
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("__z")).as("z_min"), max(col("__z")).as("z_max"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }
}
