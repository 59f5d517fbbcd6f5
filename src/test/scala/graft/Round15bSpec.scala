package graft

import org.apache.spark.sql.functions._
import graft.queries.{CorpusQueries, Relational}

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
