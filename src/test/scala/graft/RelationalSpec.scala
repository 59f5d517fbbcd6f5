package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

class RelationalSpec extends SparkSpecBase {

  test("q1 pricing summary: six flag/status groups, totals consistent") {
    val rows = Relational.q1PricingSummary(spark, sfDir).collect()
    assert(rows.length === 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .count()
    assert(total === expected)
  }

  test("market stats: every supplier nation present, weighted avg sane") {
    val rows = Relational.qMarketStats(spark, sfDir).collect()
    val expectedNations = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_nationkey").distinct().count()
    assert(rows.length === expectedNations)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_unit_price")
      assert(avg > 0 && avg < 110000)
    }
  }

  test("opportunities: flag agrees with the group average") {
    val rows = Relational.qOpportunities(spark, sfDir).collect()
    rows.foreach { r =>
      val expected = r.getAs[Double]("p_retailprice") < r.getAs[Double]("brand_avg_price") * 0.95
      assert(r.getAs[Boolean]("is_opportunity") === expected)
    }
  }

  test("validated filter pushes predicates into the parquet scan") {
    val plan = Relational.qValidatedFilter(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThanOrEqual(o_totalprice,5000.0)"),
      s"range filter not pushed:\n$plan")
  }

  test("q5 joins dims via broadcast, not shuffle") {
    val plan = Relational.q5RegionRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q1 runs inside whole-stage codegen") {
    // Materialize first: with AQE the final plan (and its codegen spans) only
    // exists after execution.
    val df = Relational.q1PricingSummary(spark, sfDir)
    df.collect()
    // codegen spans render as "*(n) " stage markers in the executed tree
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
  }

  test("typed Aggregator weighted mean matches the Column-level computation") {
    import spark.implicits._
    import graft.sources.Tables.LineItem
    val ds = graft.sources.Tables.lineitemDS(spark, sfDir)
    val wm = new graft.ops.TypedAggs.WeightedMean[LineItem](
      _.l_extendedprice, _.l_quantity)
    val typed = ds.groupByKey(_.l_returnflag)
      .agg(wm.toColumn.name("wprice")).collect().toMap
    val untyped = ds.toDF().groupBy("l_returnflag")
      .agg((sum(col("l_extendedprice") * col("l_quantity")) /
        sum(col("l_quantity"))).as("wprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) <= 1e-9 * math.abs(v), s"flag $k")
    }
  }

  test("typed Dataset view matches the DataFrame plan and pushes filters") {
    val ds = graft.sources.Tables.lineitemDS(spark, sfDir)
    val typedCount = ds.filter(_.l_quantity > 30).count()
    val dfCount = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 30).count()
    assert(typedCount === dfCount)
    // Column-based filter on the typed view still reaches the scan
    val plan = ds.filter(col("l_quantity") > 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter not pushed:\n$plan")
  }

  test("anti-join customers: complement of the semi join, exact partition") {
    val anti = Relational.qAntiCustomers(spark, sfDir).count()
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderdate") >= lit("1998-01-01"))
      .select("o_custkey")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(anti + semi === c.count())
    // non-emptiness is pinned by the sf0.01 oracle (8 lapsed customers);
    // sf0.001 may legitimately have zero
  }

  test("dedup keep-last keeps exactly one row per key, the latest") {
    val out = Relational.qDedupKeepLast(spark, sfDir)
    val dupKeys = out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(dupKeys === 0)
  }
}
