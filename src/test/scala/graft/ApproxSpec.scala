package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational
import graft.sources.Tables

/** The approximate profile is oracle-compared since round 8 (it runs on
  * the replayable HLL + histogram kernels) — the hash check proves
  * determinism, not accuracy. This spec pins the ACCURACY claim: the
  * sketch answers stay within their design error of the exact answers on
  * the same data.
  */
class ApproxSpec extends SparkSpecBase {

  test("approx distinct users within 5% of exact; percentiles bracket the range") {
    val approx = Relational.qApproxProfile(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // min/max/countDistinct all skip nulls, same as the sketch kernels —
    // the scopes stay aligned without filtering
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"),
        min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (et, r) =>
      val a = r.getAs[Double]("approx_users")
      val e = exact(et).getAs[Long]("users").toDouble
      assert(math.abs(a - e) / e <= 0.05, s"$et: approx $a vs exact $e")
      val p50 = r.getAs[Double]("p50_value")
      val p95 = r.getAs[Double]("p95_value")
      assert(p50 <= p95)
      // histogram quantiles answer with the BUCKET LOWER BOUND (width-1
      // buckets), so p50 may undershoot the true minimum by < 1
      assert(p50 >= math.floor(exact(et).getAs[Double]("lo")) &&
        p95 <= exact(et).getAs[Double]("hi"))
    }
  }
}
