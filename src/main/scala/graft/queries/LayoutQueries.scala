package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Layout
import graft.sources.Tables

/** Data-layout queries: Z-order clustering and the file-skipping evidence
  * it buys. The reference keeps its formatted layer as plain
  * per-ingest-date parquet (raw_to_fmt_lbc.py's to_parquet) — fine at its
  * scale, but a 100 TB table is read selectively, and selective reads live
  * or die on file-level min/max pruning. These queries compute the layout
  * a clustering writer would produce and measure the pruning it enables,
  * all in exact integer arithmetic so the driver oracle replays them
  * bit-for-bit.
  */
object LayoutQueries {

  private val Bits = 10     // keys masked into [0, 1024)
  private val NFiles = 64   // 64 fixed-width z-ranges → z >> 14
  private val Log2Files = java.lang.Integer.numberOfTrailingZeros(NFiles)

  /** Per-file skipping envelope of a Z-order layout of lineitem on
    * (l_partkey, l_orderkey): 64 files, each with the min/max of BOTH keys
    * — the parquet-footer stats a rectangle scan would prune against.
    * The z-locality shows up as max_x-min_x ≈ max_y-min_y ≈ 1/8 of the
    * key space per file (a contiguous z-range of 2^14 covers a ~2^7×2^7
    * block), versus a single-column sort which pins one dimension and
    * leaves the other at full range.
    */
  def qZorderLayout(spark: SparkSession, dir: String): DataFrame =
    Layout.zorderStats(Tables.lineitem(spark, dir),
        col("l_partkey"), col("l_orderkey"), Bits, NFiles)
      .orderBy(col("file_id"))

  /** The pruning evidence: for the rectangle predicate
    * `pk in [128,255] AND ok in [128,255]`, how many of 64 files must a
    * scan open under (a) the Z-order layout vs (b) a linear layout
    * sorted on pk alone? Files are pruned when their [min,max] envelope
    * misses the rectangle on EITHER clustered dimension. One row per
    * layout: files_total, files_scanned, rows_scanned (the cost actually
    * paid). Z-order prunes on both dimensions; linear only on pk — its
    * ok envelope is the full key range, so all 8 pk-overlapping files
    * must be opened; the aligned 128x128 box is exactly one z-file.
    */
  def qZorderSkipping(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val (lo, hi) = (128L, 255L)

    val zStats = Layout.zorderStats(li,
        col("l_partkey"), col("l_orderkey"), Bits, NFiles)
      .withColumn("layout", lit("zorder"))

    // linear layout: 64 equal-width pk ranges (pk >> 4), sk unclustered
    val mask = (1L << Bits) - 1
    val linStats = li
      .select((col("l_partkey").bitwiseAND(lit(mask))).as("__x"),
        (col("l_orderkey").bitwiseAND(lit(mask))).as("__y"))
      .withColumn("file_id", shiftright(col("__x"), Bits - Log2Files).cast("int"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
      .withColumn("layout", lit("linear"))

    val cols = Seq("layout", "file_id", "n_rows",
      "min_x", "max_x", "min_y", "max_y").map(col)
    val both = zStats.select(cols: _*).unionByName(linStats.select(cols: _*))

    val overlaps = col("max_x") >= lo && col("min_x") <= hi &&
      col("max_y") >= lo && col("min_y") <= hi
    both.groupBy(col("layout"))
      .agg(
        count(lit(1)).cast("long").as("files_total"),
        sum(when(overlaps, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(overlaps, col("n_rows")).otherwise(0L)).as("rows_scanned"))
      .orderBy(col("layout"))
  }
}
