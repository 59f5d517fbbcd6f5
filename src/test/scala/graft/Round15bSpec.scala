package graft

import org.apache.spark.sql.functions._
import graft.queries.{CorpusQueries, DatalakeQueries, Relational}

/** Round-15 late additions: arbitrary GROUPING SETS, ranking-window spend
  * tiers, k-anonymity suppression, categorical mutual information, and the
  * deterministic train/valid/test split. The driver oracle proves exactness
  * at sf0.01; these pin the SEMANTICS that make each op the thing it
  * claims to be.
  */
class Round15bSpec extends SparkSpecBase {

  test("grouping sets: margins are internally consistent, gid separates sets") {
    val rows = Relational.qGroupingSets(spark, sfDir).collect()
    // three sets → three gid values: (r_name,status)=0b010=2,
    // (segment)=0b101=5, ()=0b111=7
    assert(rows.map(_.getLong(5)).distinct.sorted.toSeq === Seq(2L, 5L, 7L))
    val leaf = rows.filter(_.getLong(5) == 2L)
    val seg = rows.filter(_.getLong(5) == 5L)
    val total = rows.filter(_.getLong(5) == 7L)
    assert(total.length === 1, "exactly one grand-total row")
    // n_orders is additive: each set partitions the same fact rows
    assert(leaf.map(_.getLong(4)).sum === total.head.getLong(4))
    assert(seg.map(_.getLong(4)).sum === total.head.getLong(4))
    // set-produced NULL pattern matches the set definition
    assert(leaf.forall(r => !r.isNullAt(0) && r.isNullAt(1) && !r.isNullAt(2)))
    assert(seg.forall(r => r.isNullAt(0) && !r.isNullAt(1) && r.isNullAt(2)))
    // revenue margins agree to exact-decimal-sum-then-cast tolerance
    val leafRev = leaf.map(_.getDouble(3)).sum
    assert(math.abs(leafRev - total.head.getDouble(3)) < 1e-4)
  }

  test("grouping sets: one Expand + one aggregate, no repeated fact scan") {
    val plan = Relational.qGroupingSets(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets must compile to Expand")
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.sliding("Expand".length).count(_ == "Expand") === 1,
      "one Expand — the sets share a single aggregation pass")
  }

  test("ntile: quartiles balanced within every segment, ranks normalized") {
    val rows = Relational.qNtileSpend(spark, sfDir).collect()
    rows.groupBy(_.getString(1)).foreach { case (seg, rs) =>
      val sizes = rs.groupBy(_.getLong(4)).view.mapValues(_.length).toMap
      assert(sizes.keySet === Set(1L, 2L, 3L, 4L), s"$seg: 4 buckets")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$seg: NTILE buckets differ by at most one row: $sizes")
      // quartile follows the spend ordering: q1 spends ≥ q4 spends
      val q1min = rs.filter(_.getLong(4) == 1L).map(_.getDouble(2)).min
      val q4max = rs.filter(_.getLong(4) == 4L).map(_.getDouble(2)).max
      assert(q1min >= q4max, s"$seg: quartile 1 dominates quartile 4")
      val pr = rs.map(_.getDouble(5))
      assert(pr.min === 0.0 && pr.max <= 1.0)
      val cd = rs.map(_.getDouble(6))
      assert(cd.max === 1.0 && cd.min > 0.0)
    }
  }

  test("k-anonymity: every released quasi-id combination covers ≥ k rows") {
    val k = 5
    val rows = Relational.qKAnonymity(spark, sfDir, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))
    // anonymity on the RELEASED table: group by the released quasi-ids
    val groups = rows.groupBy(r => (r._2, r._3, r._4))
    groups.foreach { case (q, rs) =>
      if (q != ("*", "*", "*"))
        assert(rs.length >= k, s"released group $q has ${rs.length} < $k")
    }
    // suppression is all-or-nothing per row and flagged
    rows.foreach { r =>
      val star = Seq(r._2, r._3, r._4).count(_ == "*")
      assert(star == 0 || star == 3, s"partial suppression on ${r._1}")
      assert(r._5 === (star == 0))
    }
    // completeness: every customer appears exactly once
    val nCust = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.length.toLong === nCust)
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("mutual info: bounded below by the grid undershoot, above by ln|X|") {
    val r = Relational.qMutualInfo(spark, sfDir).collect().head
    val mi = r.getDouble(2)
    // mathematically MI ≥ 0 and ≤ ln(min(|X|,|Y|)) = ln 5; each of ≤25
    // terms is floored onto the 2^-16 grid, so the sum can undershoot the
    // true MI by at most 25·2^-16 — the released value must stay in that
    // envelope
    assert(mi > -25.0 / 65536.0 && mi < math.log(5.0))
    assert(r.getLong(0) <= 25L, "≤ |segments|×|priorities| pairs")
    assert(r.getLong(1) ===
      spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("dp counts: seeded Laplace release is deterministic, exact-sum, never degenerate") {
    val rows = Relational.qDpCounts(spark, sfDir).collect()
    val again = Relational.qDpCounts(spark, sfDir).collect()
    assert(rows.map(_.toSeq.toList).toList ===
      again.map(_.toSeq.toList).toList, "release is a pure function")
    rows.foreach { r =>
      val (n, noise, released) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(released === n.toDouble + noise, "exact audit identity")
      assert(noise !== 0.0,
        "u is an odd dyadic — exactly-zero noise (u=1/2) is impossible")
      assert(math.abs(noise) < 40.0, "ln of an open-interval u is finite")
      assert(r.getDouble(5) === 1.0 && r.getDouble(6) === 1.0)
    }
    // the draws behave like Laplace(1): median |noise| ≈ ln 2 — a loose
    // envelope that still catches a broken inverse-CDF (all-positive,
    // all-tiny, or unsigned draws would all fail one of these)
    val absNoise = rows.map(r => math.abs(r.getDouble(3))).sorted
    val med = absNoise(absNoise.length / 2)
    assert(med > 0.2 && med < 2.0, s"median |noise| $med vs ln2≈0.69")
    assert(rows.exists(_.getDouble(3) > 0) && rows.exists(_.getDouble(3) < 0),
      "both noise signs must occur")
  }

  test("bitemporal: later knowledge times genuinely rewrite valid-time history") {
    val rows = DatalakeQueries.qBitemporal(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3)))
    val byKnown = rows.groupBy(_._1)
    assert(byKnown.keySet === Set(1500L, 2500L, 3500L))
    // monotone knowledge: each wave adds events, so the user set can
    // only grow with known_at
    val users = byKnown.view.mapValues(_.map(_._2).toSet).toMap
    assert(users(1500L).subsetOf(users(2500L)))
    assert(users(2500L).subsetOf(users(3500L)))
    // at least one user's believed state-at-V must CHANGE between
    // knowledge times — late events rewrite history, which is the whole
    // reason the system-time axis exists
    val s1 = byKnown(1500L).map(r => r._2 -> (r._3, r._4)).toMap
    val s3 = byKnown(3500L).map(r => r._2 -> (r._3, r._4)).toMap
    val rewritten = s1.keySet.intersect(s3.keySet)
      .count(u => s1(u) !== s3(u))
    assert(rewritten > 0, "no user's history was rewritten — the probe " +
      "would be testing plain time travel, not bitemporality")
    // exactly one state per (known_at, user)
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
  }

  test("period over period: delta identities hold, one row per day") {
    val rows = Relational.qPeriodOverPeriod(spark, sfDir).collect()
    assert(rows.length ===
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select(date_trunc("day", col("o_orderdate"))).distinct().count())
    assert(rows.head.isNullAt(3) && rows.head.isNullAt(4),
      "first day has no predecessor")
    rows.drop(1).foreach { r =>
      val (rev, prev, delta, pct) =
        (r.getDouble(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(delta === rev - prev)
      assert(pct === delta / prev)
    }
    // days strictly increase
    val days = rows.map(_.getTimestamp(0).getTime)
    assert(days.sameElements(days.sorted.distinct))
  }

  test("attribution decay: bounded fan-out, exact dyadic weights, real predecessors") {
    import graft.queries.EventQueries
    val rows = EventQueries.qAttributionDecay(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val byPurchase = rows.groupBy(_._1)
    byPurchase.foreach { case (pid, ts) =>
      val ks = ts.map(_._5).sorted
      assert(ks.length <= 4 && ks.sameElements(1L to ks.length),
        s"purchase $pid: k must be the prefix 1..n of the 4 slots")
    }
    rows.foreach { case (_, _, _, _, k, w, _) =>
      assert(w === 1.0 / (1L << k), "weight is the exact dyadic 2^-k")
    }
    // spot-check one purchase's touches against the recomputed timeline
    val (pid, uid) = (byPurchase.keys.min, byPurchase(byPurchase.keys.min).head._2)
    // Tables.events, not a raw read: ts needs the nanos/micros
    // normalization branch (the verify-skill gotcha)
    val timeline = graft.sources.Tables.events(spark, sfDir)
      .filter(col("user_id") === uid)
      .select(col("event_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
      .sortBy { case (id, t) => (t.getTime, id) }.map(_._1)
    val pos = timeline.indexOf(pid)
    val want = (1 to math.min(4, pos)).map(k => timeline(pos - k))
    val got = byPurchase(pid).sortBy(_._5).map(_._3)
    assert(got.sameElements(want),
      s"purchase $pid: touches must be the $pos-prefix neighbors")
  }

  test("train split: deterministic, complete, disjoint, ~80/10/10, no shuffle") {
    val a = CorpusQueries.qTrainSplit(spark, sfDir)
    val rows = a.collect()
    val again = CorpusQueries.qTrainSplit(spark, sfDir).collect()
    assert(rows.map(_.toSeq.toList).toList ===
      again.map(_.toSeq.toList).toList, "re-runs agree bit for bit")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length.toLong === nDocs, "complete: every doc assigned")
    val bySplit = rows.groupBy(_.getString(3)).view.mapValues(_.length)
    val frac = bySplit("train").toDouble / rows.length
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    assert(bySplit.keySet.toSet.subsetOf(Set("train", "valid", "test")))
    // bucket↔split law holds row by row
    rows.foreach { r =>
      val b = r.getLong(2)
      val want = if (b < 80) "train" else if (b < 90) "valid" else "test"
      assert(r.getString(3) === want)
    }
    // scan-stage-only plan: no exchange before the output sort
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      "split is a pure map over the scan")
  }
}
