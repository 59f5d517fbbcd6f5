package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) computation — Börzsönyi, Kossmann &
  * Stocker 2001, "The Skyline Operator": the rows not strictly dominated
  * by any other row, here in two dimensions (minimize x, maximize y).
  *
  * Spark-first shape: the two-phase distributed skyline. Phase 1 computes
  * each partition's LOCAL skyline with a sort-based streaming scan —
  * `sortWithinPartitions` (Spark's spillable sort, no per-task in-memory
  * materialization) feeds a single-pass O(1)-state scan in mapPartitions
  * (genuine per-partition imperative logic — the scan's running-maximum
  * state has no declarative form). Phase 2 re-runs the identical scan
  * over the UNION of local skylines in one task. Correct because
  * dominance is transitive: a globally dominated point is dominated by
  * some global-skyline point, which survives its own local scan — so
  * every global-skyline point reaches phase 2, and phase 2 removes
  * cross-partition dominated survivors. Scale shape: phase 1 touches
  * each row once with no shuffle; only local skylines — typically a
  * vanishing fraction (O(log n) expected points for independent
  * dimensions) — move to the single merge task.
  *
  * Tie semantics: strict dominance only — points with identical (x, y)
  * dominate nothing and survive or fall together; a point equal in one
  * dimension and beaten in the other is dominated. Null or NaN in either
  * dimension is the caller's job to filter (NaN compares break the scan's
  * ordering contract — enforced with a loud filter here).
  */
object Skyline {

  case class SkyPoint(id: Long, x: Double, y: Double)

  /** One streaming pass over rows sorted by (x asc, y desc, id asc):
    * `bestY` = max y among completed strictly-smaller-x groups, `headY` =
    * max y of the current x-group (its first row, by the desc sort). A
    * row survives iff it matches its group head's y (same-x rows below
    * the head are dominated by it) and beats every cheaper group
    * (y > bestY; equality there means a cheaper point with ≥ y — strict
    * dominance via x).
    */
  private def scan(it: Iterator[SkyPoint]): Iterator[SkyPoint] = {
    var started = false
    var bestY = Double.NegativeInfinity
    var curX = 0.0
    var headY = 0.0
    it.flatMap { p =>
      if (!started || p.x != curX) {
        if (started) bestY = math.max(bestY, headY)
        curX = p.x; headY = p.y; started = true
      }
      if (p.y == headY && p.y > bestY) Some(p) else None
    }
  }

  /** Skyline of `df` minimizing `x` and maximizing `y`; returns
    * (id, x, y). Rows with null/NaN in either dimension are dropped
    * (they can neither dominate nor be ranked).
    */
  def skyline2D(df: DataFrame, id: Column, x: Column, y: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts: Dataset[SkyPoint] = df
      .select(id.cast("long").as("id"), x.cast("double").as("x"),
        y.cast("double").as("y"))
      .filter(col("id").isNotNull && col("x").isNotNull &&
        col("y").isNotNull && !isnan(col("x")) && !isnan(col("y")))
      .as[SkyPoint]
    val local = pts
      .sortWithinPartitions(col("x"), col("y").desc, col("id"))
      .mapPartitions(scan)
    // repartition — NOT coalesce — to width 1: coalesce(1) is a narrow
    // dependency that would fuse phase 1 into the single merge task and
    // run the whole scan serially; the repartition shuffle is the stage
    // barrier that keeps phase 1 parallel, and it moves only the tiny
    // local-skyline union
    local.repartition(1)
      .sortWithinPartitions(col("x"), col("y").desc, col("id"))
      .mapPartitions(scan)
      .toDF()
  }
}
