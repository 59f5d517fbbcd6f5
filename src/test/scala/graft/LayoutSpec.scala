package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout
import graft.queries.LayoutQueries

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("zValue interleaves bits: known Morton codes") {
    // (x, y) -> z with bit i of x at 2i, bit i of y at 2i+1
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L), (5L, 2L, 25L),
      (7L, 7L, 63L), (1023L, 1023L, (1L << 20) - 1))
    val df = cases.toDF("x", "y", "expect")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 10))
    assert(df.filter(col("z") =!= col("expect")).count() === 0)
  }

  test("z-order files have tight envelopes on BOTH dimensions") {
    val stats = LayoutQueries.qZorderLayout(spark, "/root/testdata/sf0.01")
      .collect()
    assert(stats.length > 16, "sf0.01 should populate most of 64 z-ranges")
    // a contiguous z-range of 2^14 covers roughly a 2^7 x 2^7 block: both
    // per-file key ranges should average well under the 1024 key space —
    // the two-dimensional locality a single-column sort cannot give
    def meanRange(lo: String, hi: String): Double =
      stats.map(r => (r.getAs[Long](hi) - r.getAs[Long](lo)).toDouble)
        .sum / stats.length
    assert(meanRange("min_x", "max_x") <= 320.0, "x envelopes too loose")
    assert(meanRange("min_y", "max_y") <= 320.0, "y envelopes too loose")
    // files partition the z-space: consecutive file z-envelopes never
    // overlap (z_min of file k+1 > z_max of file k)
    val byFile = stats.sortBy(_.getAs[Int]("file_id"))
    byFile.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("z_min") > a.getAs[Long]("z_max"))
      case _ =>
    }
  }

  test("z-order scans fewer files AND fewer rows than linear for a rectangle") {
    val rows = LayoutQueries.qZorderSkipping(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("files_total"), r.getAs[Long]("files_scanned"),
          r.getAs[Long]("rows_scanned"))).toMap
    val (zTotal, zScan, zRows) = rows("zorder")
    val (lTotal, lScan, lRows) = rows("linear")
    assert(zTotal === 64 && lTotal === 64)
    // linear prunes on x only: all 8 files overlapping pk [128,255] keep a
    // full-range y envelope and must be opened; the aligned 128x128 box is
    // one z-file, so z-order must win strictly on both counts at sf0.01
    assert(zScan < lScan, s"zorder should open fewer files: z=$zScan l=$lScan")
    assert(zRows < lRows, s"zorder should scan fewer rows: z=$zRows l=$lRows")
  }

  test("zorder stats plan: single hash aggregate exchange, no window, pruned scan") {
    val plan = LayoutQueries.qZorderLayout(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "layout must not use a global window")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
    // only the two key columns reach the scan
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>"),
      s"scan not pruned to the two keys:\n$plan")
  }

  test("bucketed join row: no exchange below the aggregate, bucketed scans") {
    val df = graft.queries.LayoutQueries.qBucketedJoin(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly ONE exchange in the whole plan: the tiny per-priority
    // aggregate's — the join itself rides the bucket co-location
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected only the aggregate exchange:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"join strategy not pinned:\n$plan")
    assert(plan.toLowerCase.contains("bucket"), s"scans not bucketed:\n$plan")
  }

  test("orc roundtrip row: filter and projection reach the ORC scan") {
    val df = graft.queries.LayoutQueries.qOrcRoundtrip(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Scan orc"), s"must read from ORC:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"quantity filter not pushed to the ORC reader:\n$plan")
    assert(!plan.contains("l_orderkey"),
      s"unused column must be pruned from the ORC scan:\n$plan")
  }

  test("Hilbert curve: bijective on the grid, every step grid-adjacent, codegen == interpreted") {
    import org.apache.spark.sql.functions.col
    val bits = 4 // full 16x16 grid = 256 cells, exhaustive
    val n = 1 << bits
    // driver-side reference walk (independent re-statement of xy2d)
    def ref(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = (n / 2).toLong
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val got = grid.select(col("x"), col("y"),
        graft.ops.Layout.hilbertValue(col("x"), col("y"), bits).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // expression (codegen path over 256 rows) == the reference walk
    got.foreach { case ((x, y), d) =>
      assert(d === ref(x, y), s"hilbert($x,$y)")
    }
    // bijective: all 256 distances hit exactly once
    assert(got.values.toSet === (0L until n.toLong * n).toSet,
      "hilbert distances must be a permutation of the grid")
    // THE Hilbert property (and the locality claim q_optimize_hilbert
    // rests on): consecutive curve positions are always grid-ADJACENT —
    // |dx| + |dy| == 1 — whereas Morton jumps diagonally at quadrant
    // seams. This is what keeps an unaligned d-range's (x, y) hull tight.
    val byD = got.toSeq.map { case ((x, y), d) => (d, x, y) }.sortBy(_._1)
    byD.sliding(2).foreach { case Seq((_, x1, y1), (d2, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) === 1L,
        s"non-adjacent step at d=$d2: ($x1,$y1) -> ($x2,$y2)")
    }
  }
}
