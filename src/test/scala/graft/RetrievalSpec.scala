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
}
