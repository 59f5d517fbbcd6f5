package graft

import org.apache.spark.sql.functions._
import graft.queries.JourneyQueries

/** Property checks for the journey-analytics family (exact values are the
  * DuckDB oracles' job — these pin the invariants and plan shapes).
  */
class JourneySpec extends SparkSpecBase {

  test("funnel: stages are consistent with their timestamps and ordered") {
    val rows = JourneyQueries.qFunnelSteps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val signup = r.getAs[java.sql.Timestamp]("signup_ts")
      val click = r.getAs[java.sql.Timestamp]("first_click_ts")
      val purchase = r.getAs[java.sql.Timestamp]("first_purchase_ts")
      val stage = r.getAs[String]("stage")
      assert(signup != null)
      // strict ordering: each step at-or-after the previous step
      if (click != null) assert(!click.before(signup))
      if (purchase != null) { assert(click != null); assert(!purchase.before(click)) }
      stage match {
        case "purchased" => assert(purchase != null)
        case "clicked"   => assert(click != null && purchase == null)
        case "signed_up" => assert(click == null && purchase == null)
      }
    }
  }

  test("funnel: one exchange serves all three window passes") {
    val plan = JourneyQueries.qFunnelSteps(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the three chained minima + the final agg must reuse ONE user_id
    // hash-partitioning: exactly one exchange below the sort/windows
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 keyed exchange, got $exchanges:\n$plan")
  }

  test("retention: day-0 cell is the full cohort, counts bounded by size") {
    val rows = JourneyQueries.qRetentionCohort(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val day0 = rows.filter(_.getAs[Long]("day_offset") == 0L)
    assert(day0.nonEmpty)
    day0.foreach { r =>
      assert(r.getAs[Long]("n_active") === r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") === 1.0)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("day_offset") >= 0L)
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
    }
  }

  test("gap fill: per-user calendar is dense, fill carries forward") {
    val rows = JourneyQueries.qGapFill(spark, sfDir)
      .collect().groupBy(_.getAs[Long]("user_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, days) =>
      val ds = days.map(_.getAs[java.sql.Date]("day").toLocalDate).sorted
      // dense: every day between min and max present exactly once
      assert(ds.distinct.length === ds.length)
      assert(ds.length ===
        java.time.temporal.ChronoUnit.DAYS.between(ds.head, ds.last) + 1)
      days.sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
        .foreach { r =>
          val active = r.getAs[Boolean]("is_active")
          if (active) {
            assert(r.getAs[Long]("n_events") > 0L)
            assert(r.getAs[Long]("days_since_active") === 0L)
          } else assert(r.getAs[Long]("n_events") === 0L)
          // endpoints are active days, so fill is always defined
          assert(!r.isNullAt(r.fieldIndex("filled_total")))
        }
    }
  }

  test("gap fill: a pathological span fails loudly instead of exploding") {
    import spark.implicits._
    // one corrupt millennium timestamp next to normal activity: without the
    // cap the densify would emit ~366k calendar rows for this one user;
    // with it the job dies naming the user
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), 2.0),
      (2L, java.sql.Timestamp.valueOf("1024-01-15 00:00:00"), 3.0), // corrupt
      (2L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), 4.0)
    ).toDF("user_id", "ts", "value")
    val ex = intercept[Exception] {
      JourneyQueries.gapFill(events).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(ex).mkString("\n")
    assert(all.contains("gap-fill span overflow"), s"wrong failure: $all")
    assert(all.contains("user 2"), s"overflow must name the user: $all")
    // sane spans still densify (the guard's happy path is invisible)
    val ok = JourneyQueries.gapFill(events.filter(col("user_id") === 1L))
      .collect()
    assert(ok.length === 6) // 2024-01-10..15 densified
  }

  test("json props: extraction matches a regex pull, decade truncates") {
    val rows = JourneyQueries.qJsonProps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val raw = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("props")).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("props")).toMap
    rows.foreach { r =>
      val expected = """"k":\s*(-?\d+)""".r
        .findFirstMatchIn(raw(r.getAs[Long]("event_id"))).map(_.group(1).toInt)
      if (r.isNullAt(r.fieldIndex("k"))) {
        assert(expected.isEmpty); assert(!r.getAs[Boolean]("has_k"))
      } else {
        val k = r.getAs[Int]("k")
        assert(expected.contains(k)); assert(r.getAs[Boolean]("has_k"))
        assert(r.getAs[Int]("k_decade") === k - (k % 10))
      }
    }
  }

  test("gap fill: with broadcast disabled, one keyed exchange serves agg+join+window") {
    // the 100 TB shape: daily can't broadcast, so the densify join must be
    // co-partitioned off the single explicit user_id repartition
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    val coKey = "spark.sql.requireAllClusterKeysForCoPartition"
    val oldCo = spark.conf.get(coKey)
    try {
      spark.conf.set(key, "-1")
      // the engine session (GraftSession) sets this; the shared test
      // session doesn't, so set it here for the scale-shape assertion
      spark.conf.set(coKey, "false")
      val df = JourneyQueries.qGapFill(spark, sfDir)
      df.collect() // materialize so AQE finalizes the executed plan
      // AdaptiveSparkPlan.toString prints final AND initial plans — pin
      // only the final one
      val full = df.queryExecution.executedPlan.toString
      val plan = full.split("== Initial Plan ==").head
      assert(!plan.contains("BroadcastHashJoin"), s"broadcast disabled:\n$plan")
      // every hash exchange must be one of the two explicit user_id
      // repartitions (one per join branch); the join and window must add
      // NONE of their own (no ENSURE_REQUIREMENTS hash exchange)
      val keyed = "Exchange hashpartitioning\\([^)]*\\), (\\w+)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(keyed.nonEmpty && keyed.forall(_ == "REPARTITION_BY_COL"),
        s"join/window added a hash exchange beyond the explicit " +
          s"repartitions: $keyed\n$plan")
    } finally {
      spark.conf.set(key, old)
      spark.conf.set(coKey, oldCo)
    }
  }

  test("json props: pure projection — no exchange in the plan") {
    val plan = JourneyQueries.qJsonProps(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"projection query must not shuffle:\n$plan")
  }

  test("top paths: ranked journeys are well-formed and the plan stays on two exchanges") {
    val df = JourneyQueries.qTopPaths(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getAs[Long]("n_sessions"))
    assert(counts.forall(_ > 0))
    assert(counts.sameElements(counts.sorted.reverse), "must rank by count desc")
    val types = Set("signup", "click", "view", "purchase", "error")
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.nonEmpty && steps.length <= 64 && steps.forall(types))
    }
    // sessionize window, position cap, and ordered path collect all ride
    // the user_id exchange ((user, seq) clustering is satisfied by the
    // user hash); the path count is the only second shuffle, and top-20
    // must be TakeOrderedAndProject, never a global sort. AQE's string
    // repeats the whole tree under "== Initial Plan ==" — count the final
    // section only.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 keyed exchanges, got $exchanges:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$plan")
  }
}
