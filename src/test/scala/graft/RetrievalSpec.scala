package graft

import org.apache.spark.sql.functions._
import graft.ops.Retrieval
import graft.queries.TextQueries

class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  test("bm25: more occurrences rank higher; length normalization breaks ties") {
    val docs = Seq(
      (1L, "cat cat cat dog"), // tf(cat)=3
      (2L, "cat dog bird fish"), // tf(cat)=1, dl=4
      (3L, "cat dog bird fish lion tiger bear wolf"), // tf(cat)=1, dl=8
      (4L, "dog dog dog dog")) // no match
      .toDF("doc_id", "text")
    val q = Seq(0L -> "cat").toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docs, col("doc_id"), col("text"), q, k = 10)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L),
      "tf dominates, then shorter doc wins; non-matching doc absent")
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall { case Array(a, b) => a > b; case _ => true })
    assert(scores.forall(_ > 0.0), "BM25+ idf keeps every score positive")
  }

  test("bm25 corpus query: deterministic, ranked, dyadic-exact scores") {
    val a = TextQueries.qBm25Search(spark, "/root/testdata/sf0.01").collect()
    val b = TextQueries.qBm25Search(spark, "/root/testdata/sf0.01").collect()
    assert(a.toSeq === b.toSeq, "scores must be reduction-order independent")
    val byQ = a.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.length === 10)
      // ranks are dense 1..10 and scores non-increasing with doc_id tiebreak
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to 10))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          val (sx, sy) = (x.getAs[Double]("score"), y.getAs[Double]("score"))
          assert(sx > sy ||
            (sx == sy && x.getAs[Long]("doc_id") < y.getAs[Long]("doc_id")))
        case _ =>
      }
      // every score is a multiple of 2^-16 summed — scaling by 2^16 must
      // give an integer (the determinism contract, observable)
      sorted.foreach { r =>
        val scaled = r.getAs[Double]("score") * 65536.0
        assert(scaled == math.rint(scaled), s"non-dyadic score: $r")
      }
    }
  }

  test("bm25 plan: broadcast-restricted tf, no sort-merge join, heap topk") {
    val df = TextQueries.qBm25Search(spark, "/root/testdata/sf0.01")
    df.collect() // materialize so AQE finalizes
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"), "query-term restriction must broadcast")
    assert(plan.contains("topk"), "bounded-heap topk aggregate must serve the cut")
  }

  test("incrementally-built index == full rebuild; stored-index serve == from-text serve") {
    import graft.queries.TextQueries
    val got = TextQueries.qIndexServe(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val direct = TextQueries.qBm25Search(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === direct,
      "serving from the published incremental index must be bit-identical " +
        "to scoring from raw text")
  }

  test("hybrid RRF: both-leg hits dominate single-leg hits; scores are exact rank arithmetic") {
    val rows = graft.queries.TextQueries.qHybridSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // dense ranks 1..n per query, n <= 10
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.toSeq === (1L to ranks.length).toSeq, s"query $q ranks $ranks")
      assert(ranks.length <= 10)
    }
    rows.foreach { r =>
      val (rrf, lex, vec) = (r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))
      // the fused score is exactly the rank arithmetic — no calibration
      val expect = lex.map(l => 1.0 / (60.0 + l)).getOrElse(0.0) +
        vec.map(v => 1.0 / (60.0 + v)).getOrElse(0.0)
      assert(rrf === expect, s"rrf $rrf != $expect for $r")
      assert(lex.isDefined || vec.isDefined)
    }
    // a provable RRF property at k0=60, k=20: min both-leg score
    // 2/(60+20) = 0.025 exceeds max single-leg score 1/(60+1) ≈ 0.0164,
    // so every doc found by BOTH rankers outranks every single-leg doc
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val both = rs.filter(r => !r.isNullAt(4) && !r.isNullAt(5))
      val single = rs.filter(r => r.isNullAt(4) || r.isNullAt(5))
      if (both.nonEmpty && single.nonEmpty) {
        val worstBoth = both.map(_.getLong(1)).max
        val bestSingle = single.map(_.getLong(1)).min
        assert(worstBoth < bestSingle,
          s"query $q: a single-leg doc outranked a both-leg doc")
      }
    }
  }
}
