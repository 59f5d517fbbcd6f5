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

  test("geo export fans hot docs into two indices and builds the pin struct") {
    val out = Relational.qDocExportGeo(spark, sfDir)
    val rows = out.collect()
    val base = Relational.qDocExport(spark, sfDir)
    val nHot = base.filter(col("routing") === "hot").count()
    val nAll = base.count()
    // dual-index fan-out: output EXCEEDS input by exactly the hot-doc count
    assert(rows.length === nAll + nHot)
    assert(out.filter(col("es_index") === "orders-hot").count() === nHot)
    // nested doc assembled with the right field path and ranges; emitted as
    // its JSON form (the ES bulk-body encoding, and the only struct
    // encoding the driver's checker can hash) — parse it back to verify
    val parsed = out.select(
        get_json_object(col("pin"), "$.location.lat").cast("double").as("lat"),
        get_json_object(col("pin"), "$.location.lon").cast("double").as("lon"),
        get_json_object(col("pin"), "$.geo_name").as("geo_name"))
      .limit(50).collect()
    assert(parsed.nonEmpty)
    parsed.foreach { r =>
      val lat = r.getAs[Double]("lat"); val lon = r.getAs[Double]("lon")
      assert(lat >= -90 && lat < 90 && lon >= -180 && lon < 180)
      assert(r.getAs[String]("geo_name").nonEmpty)
    }
  }

  test("nested-field join keys on location.zipcode and matches the flat join") {
    val nested = Relational.qNestedJoin(spark, sfDir)
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    val flat = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey")).count()
    assert(nested.count() === flat)
    // the join keys on the struct FIELD internally; the output flattens it
    // to scalar columns (driver-hashable) — both fields must survive
    assert(nested.columns.toSeq ===
      Seq("o_orderkey", "zipcode", "segment", "zip_name", "o_totalprice"))
    val r = nested.limit(1).collect().head
    assert(!r.isNullAt(r.fieldIndex("zipcode")))
    assert(r.getAs[String]("segment").nonEmpty)
  }

  test("closed-form regression matches a direct least-squares computation") {
    val out = Relational.qRegression(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"), r.getAs[Double]("r2")))
      .toMap
    assert(out.keySet === Set("train", "test"))
    // recompute naively on the driver for each split
    val pts = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_retailprice").isNotNull && col("p_size").isNotNull)
      .select(col("p_partkey"), col("p_size").cast("double"),
        col("p_retailprice"))
      .collect()
      .map(r => (if (r.getLong(0) % 5 == 0) "test" else "train",
        r.getDouble(1), r.getDouble(2)))
    out.foreach { case (split, (slope, intercept, r2)) =>
      val xs = pts.filter(_._1 == split)
      val n = xs.length.toDouble
      val mx = xs.map(_._2).sum / n; val my = xs.map(_._3).sum / n
      val cov = xs.map(p => (p._2 - mx) * (p._3 - my)).sum
      val vx = xs.map(p => (p._2 - mx) * (p._2 - mx)).sum
      val expSlope = cov / vx
      assert(math.abs(slope - expSlope) <= 1e-6 * math.max(1.0, math.abs(expSlope)),
        s"$split slope $slope vs $expSlope")
      assert(math.abs((intercept + slope * mx) - my) <= 1e-6 * math.max(1.0, math.abs(my)),
        s"$split intercept/mean identity")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$split r2=$r2")
    }
  }

  test("regression eval carries train coefficients; train R2 matches the fit") {
    val fit = Relational.qRegression(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"), r.getAs[Double]("r2")))
      .toMap
    val ev = Relational.qRegressionEval(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"),
          r.getAs[Double]("rmse"), r.getAs[Double]("r2")))
      .toMap
    assert(ev.keySet === Set("train", "test"))
    // BOTH rows carry the TRAIN fit's coefficients (eval = apply train
    // model to each split), and rmse is a real non-negative error
    ev.values.foreach { case (m, b, rmse, _) =>
      assert(math.abs(m - fit("train")._1) <= 1e-9)
      assert(math.abs(b - fit("train")._2) <= 1e-9)
      assert(rmse >= 0.0 && !rmse.isNaN)
    }
    // algebraic identity: evaluating the train fit on its own split gives
    // the fit's r² (different formula, same value up to fp noise)
    assert(math.abs(ev("train")._4 - fit("train")._3) <= 1e-6)
  }

  test("z-score outliers agree with a driver-side per-brand computation") {
    val out = Relational.qOutlierZscore(spark, sfDir).collect()
    val byBrand = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_retailprice").isNotNull)
      .select("p_partkey", "p_brand", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._2)
    assert(out.length === byBrand.values.map(_.length).sum)
    out.take(200).foreach { r =>
      val xs = byBrand(r.getAs[String]("p_brand")).map(_._3)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      val x = r.getAs[Double]("p_retailprice")
      if (sd > 0) {
        val expZ = (x - mean) / sd
        assert(math.abs(r.getAs[Double]("z") - expZ) < 1e-6,
          s"z for part ${r.getLong(0)}")
        assert(r.getAs[Boolean]("is_outlier") === (math.abs(expZ) > 2.0))
      }
    }
  }

  test("dedup keep-last keeps exactly one row per key, the latest") {
    val out = Relational.qDedupKeepLast(spark, sfDir)
    val dupKeys = out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(dupKeys === 0)
  }

  test("exact quantiles: type-7 interpolation replayed bit-exact in plain Scala") {
    val rows = Relational.qExactQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val vals = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    def t7(xs: Array[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = math.floor(pos).toInt
      val frac = pos - lo
      if (lo == xs.length - 1) xs(lo)
      // the CONVEX form lower*(1-frac) + higher*frac — what both Spark's
      // Percentile and DuckDB's quantile_cont evaluate; the algebraically
      // equal lo + (hi-lo)*frac rounds differently (caught here)
      else xs(lo) * (1 - frac) + xs(lo + 1) * frac
    }
    rows.foreach { r =>
      val xs = vals(r.getString(0))
      assert(r.getLong(1) === xs.length.toLong)
      // bit-exact (no tolerance): the aggregate must evaluate the same
      // IEEE expression the reference fold — and DuckDB — evaluate
      assert(r.getDouble(2) === t7(xs, 0.25), s"p25 ${r.getString(0)}")
      assert(r.getDouble(3) === t7(xs, 0.5), s"p50 ${r.getString(0)}")
      assert(r.getDouble(4) === t7(xs, 0.75), s"p75 ${r.getString(0)}")
    }
  }

  test("quarantine: valid side is row-for-row the validated filter; every reject carries its reasons") {
    import org.apache.spark.sql.functions.col
    val o = graft.sources.Tables.orders(spark, sfDir)
    val rules = Seq(
      "bad_status" -> col("o_orderstatus").isin("O", "F"),
      "price_range" -> col("o_totalprice").between(5000, 50000000),
      "null_cust" -> col("o_custkey").isNotNull,
      "null_date" -> col("o_orderdate").isNotNull)
    val (valid, rejected) = graft.ops.Cleaning.quarantine(o, rules)
    // the dual output PARTITIONS the input: nothing dropped, nothing doubled
    assert(valid.count() + rejected.count() === o.count())
    // valid side == q_validated_filter's population, key for key
    val vKeys = valid.select(col("o_orderkey"))
      .collect().map(_.getLong(0)).toSet
    val fKeys = Relational.qValidatedFilter(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(vKeys === fKeys, "quarantine's valid side diverged from the filter")
    // each reject's reason list re-verifies against the rules themselves
    val rows = rejected.select(col("o_orderstatus"), col("o_totalprice"),
      col("reject_reason")).collect()
    assert(rows.nonEmpty, "test data carries no rejects — rules not exercised")
    rows.foreach { r =>
      val expected = Seq(
        "bad_status" -> !Seq("O", "F").contains(r.getString(0)),
        "price_range" -> !(r.getDouble(1) >= 5000 && r.getDouble(1) <= 50000000)
      ).filter(_._2).map(_._1).mkString(",")
      assert(r.getString(2) === expected,
        s"wrong reasons for status=${r.getString(0)} price=${r.getDouble(1)}")
    }
    // multi-rule failures must carry BOTH reasons in rule order
    assert(rows.exists(_.getString(2) == "bad_status,price_range") ||
      !rows.exists(r => r.getString(2).contains("bad_status") &&
        !(r.getDouble(1) >= 5000 && r.getDouble(1) <= 50000000)))
  }
}
