package graft

import org.apache.spark.sql.functions._

/** Runtime half of the skew evidence (round-11 verdict #5): q_skew_evidence
  * carries the deterministic reduce-unit distributions; this spec pins that
  * AQE's OptimizeSkewedJoin ACTUALLY fires on a constructed-skew join —
  * the executed plan marks the join/read as skew-handled — and that the
  * mitigation is invisible in results (identical rows with the optimizer
  * disabled). Runs on its own `newSession` so the tuned-down skew
  * thresholds never leak into the shared test session.
  */
class SkewSpec extends SparkSpecBase {

  /** One hot key holding ~97% of the rows plus 50 cold keys — the shape
    * where an unsalted shuffle melts one reducer.
    */
  private def skewedSides(s: org.apache.spark.sql.SparkSession) = {
    val hot = s.range(0, 200000, 1, 8)
      .select(lit("h").as("k"), col("id").as("v"))
    val cold = s.range(0, 5000, 1, 4)
      .select(concat(lit("k"), pmod(col("id"), lit(50))).as("k"),
        col("id").as("v"))
    val left = hot.unionByName(cold)
    // right built directly (no post-shuffle aggregate): OptimizeSkewedJoin
    // only matches SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an
    // aggregate between sort and shuffle read opts the join out of skew
    // handling entirely
    import s.implicits._
    val right = ("h" +: (0 until 50).map(i => s"k$i")).toDF("k")
      .select(col("k"), length(col("k")).as("attr"))
    (left, right)
  }

  private def runJoin(skewHandling: Boolean): (Array[String], String) = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", skewHandling.toString)
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // shrink the byte thresholds so the ~MB-scale hot partition counts as
    // skewed and splits into many advisory-sized chunks
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "65536")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    val (left, right) = skewedSides(s)
    val joined = left.join(right, "k")
      .groupBy(col("k"), col("attr")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("sv"))
    val rows = joined.collect().map(_.toString).sorted
    (rows, joined.queryExecution.executedPlan.toString)
  }

  test("AQE splits the skewed partition and marks the join skew=true") {
    val (withRows, withPlan) = runJoin(skewHandling = true)
    val lower = withPlan.toLowerCase
    assert(lower.contains("skew=true") || lower.contains("skewed"),
      s"no skew-handling marker in the executed plan:\n$withPlan")

    val (withoutRows, withoutPlan) = runJoin(skewHandling = false)
    assert(!withoutPlan.toLowerCase.contains("skew=true"),
      "control run unexpectedly skew-optimized")
    // mitigation invisible in values: identical results either way
    assert(withRows.sameElements(withoutRows),
      "skew-split changed the join results")
  }
}
