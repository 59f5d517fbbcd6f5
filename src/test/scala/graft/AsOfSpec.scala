package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("as-of join picks the latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, 100L, ts(5)), (2L, 100L, ts(10)), (3L, 100L, ts(2)),
      (4L, 200L, ts(7))
    ).toDF("trade_id", "acct", "trade_ts")
    val quotes = Seq(
      (100L, ts(1), 10.0), (100L, ts(5), 11.0), (100L, ts(9), 12.0),
      (300L, ts(0), 99.0)
    ).toDF("acct", "quote_ts", "px")

    val got = AsOf.asOfJoin(trades, quotes, "acct", "trade_ts", "quote_ts")
      .orderBy("trade_id").collect()
    // trade 1 @10:05 → quote @10:05 (>= is inclusive, right-first at tie)
    assert(got(0).getAs[Double]("px") === 11.0)
    // trade 2 @10:10 → quote @10:09
    assert(got(1).getAs[Double]("px") === 12.0)
    // trade 3 @10:02 → quote @10:01
    assert(got(2).getAs[Double]("px") === 10.0)
    // acct 200 has no quotes → nulls, row preserved (left semantics)
    assert(got(3).isNullAt(got(3).fieldIndex("px")))
    assert(got.length === 4)
  }

  test("as-of tolerance nulls out matches staler than the window") {
    val trades = Seq(
      (1L, 100L, ts(5)),   // quote @10:04 → 1 min stale, within 2 min
      (2L, 100L, ts(9))    // quote @10:04 → 5 min stale, beyond 2 min
    ).toDF("trade_id", "acct", "trade_ts")
    val quotes = Seq((100L, ts(4), 11.0)).toDF("acct", "quote_ts", "px")
    val got = AsOf.asOfJoin(trades, quotes, "acct", "trade_ts", "quote_ts",
        tolerance = Some("2 MINUTES"))
      .orderBy("trade_id").collect()
    assert(got(0).getAs[Double]("px") === 11.0, "fresh match kept")
    assert(got(1).isNullAt(got(1).fieldIndex("px")), "stale match nulled")
    assert(got(1).isNullAt(got(1).fieldIndex("quote_ts")),
      "the whole right payload is nulled, not just one column")
    assert(got.length === 2, "left rows always preserved")
  }

  test("range join equals the naive inequality join, including bucket-boundary points") {
    import graft.ops.RangeJoin
    val events = Seq(
      (1L, 100L, ts(0)), (2L, 100L, ts(30)), (3L, 100L, ts(59)),
      (4L, 200L, ts(10)), (5L, 100L, ts(5))
    ).toDF("eid", "acct", "ets")
    // intervals: one exactly bucket-aligned, one spanning buckets, one empty
    val iv = Seq(
      (10L, 100L, ts(0), ts(30)),   // [10:00, 10:30) — catches 1, 5
      (11L, 100L, ts(29), ts(59)),  // spans buckets — catches 2 (30), 5? no (5<29)
      (12L, 200L, ts(10), ts(10)),  // empty — catches nothing
      (13L, 200L, ts(0), ts(60))    // catches 4
    ).toDF("ivid", "acct", "s", "e")
    val got = RangeJoin.pointInInterval(events, iv, "acct",
        col("ets"), col("s"), col("e"), bucketMs = 15L * 60 * 1000)
      .select("eid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = events.join(iv, Seq("acct"))
      .filter(col("ets") >= col("s") && col("ets") < col("e"))
      .select("eid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got === Set((1L, 10L), (5L, 10L), (2L, 11L), (4L, 13L)))
  }

  test("as-of join plans one shuffle, no quadratic join") {
    val trades = Seq((1L, 100L, ts(5))).toDF("trade_id", "acct", "trade_ts")
    val quotes = Seq((100L, ts(1), 10.0)).toDF("acct", "quote_ts", "px")
    val plan = AsOf.asOfJoin(trades, quotes, "acct", "trade_ts", "quote_ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"union form must not plan a join:\n$plan")
    assert(plan.contains("Window"))
  }

  test("linear attribution splits each purchase's value equally over its range-join pairs") {
    import graft.queries.EventQueries
    val pairs = EventQueries.qAttributionLinear(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    // pair set == the range join's pair set (attribution adds credit, never pairs)
    val rj = EventQueries.qRangeJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
    assert(pairs.map(r => (r.getAs[Long]("click_id"),
      r.getAs[Long]("purchase_id"))).toSet === rj)
    // per purchase: equal shares that sum back to one purchase value
    pairs.groupBy(_.getAs[Long]("purchase_id")).foreach { case (_, ps) =>
      val credits = ps.map(_.getAs[Double]("credit"))
      assert(credits.toSet.size === 1, "shares of one purchase must be equal")
      val total = credits.head * credits.length
      assert(total > 0 && math.abs(total - math.rint(total * 100) / 100) < 1e-9,
        s"credits must reassemble a 2-decimal purchase value, got $total")
    }
  }
}
