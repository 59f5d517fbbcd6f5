package graft

import org.apache.spark.sql.functions._
import graft.ops.LanguageModel
import graft.queries.TextQueries

class LanguageModelSpec extends SparkSpecBase {
  import spark.implicits._

  test("bigram cross-entropy: hand-computed add-one probabilities") {
    // ref "a b a b": c2 = {"a b": 2, "b a": 1}; c1 = {a: 2, b: 1}; V = 2
    val docs = Seq((0L, "a b a b"), (1L, "a b x")).toDF("doc_id", "text")
    val out = LanguageModel.bigramCrossEntropy(docs,
        col("doc_id"), col("text"), isRef = col("doc_id") === 0, tau = 6.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // candidate "a b x": p(a b) = 3/4, p(b x) = (0+1)/(1+2) = 1/3 (unseen)
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_bigrams") === 2)
    assert(r1.getAs[Long]("n_unseen") === 1)
    val expected = -(math.floor(math.log(3.0 / 4.0) * 65536.0) / 65536.0 +
      math.floor(math.log(1.0 / 3.0) * 65536.0) / 65536.0) / 2.0
    assert(r1.getAs[Double]("cross_entropy") === expected)
    assert(r1.getAs[Boolean]("keep"))
    // the reference doc itself: all bigrams seen
    assert(out(0L).getAs[Long]("n_unseen") === 0)
    assert(out(0L).getAs[Double]("cross_entropy") <
      r1.getAs[Double]("cross_entropy"),
      "in-distribution text must score lower cross-entropy")
  }

  test("corpus lm score: deterministic, covers all docs, in-vocab mass low") {
    val a = TextQueries.qLmScore(spark, "/root/testdata/sf0.01").collect()
    val b = TextQueries.qLmScore(spark, "/root/testdata/sf0.01").collect()
    assert(a.toSeq === b.toSeq, "cross-entropy must be reduction-order exact")
    assert(a.length === 500, "every sf0.01 doc gets a score")
    // synthetic docs share one small vocabulary: the every-10th-doc LM
    // should see most candidate bigrams, and cross-entropy stays bounded
    val unseenFrac = a.map(r => r.getAs[Long]("n_unseen").toDouble /
      r.getAs[Long]("n_bigrams")).sum / a.length
    assert(unseenFrac < 0.5, s"unseen-bigram fraction too high: $unseenFrac")
    assert(a.forall(_.getAs[Double]("cross_entropy") > 0.0))
  }

  test("lm score plan: no cartesian beyond the 1-row vocab broadcast") {
    val df = TextQueries.qLmScore(spark, "/root/testdata/sf0.01")
    df.collect()
    // AQE renders "== Final Plan ==" then "== Initial Plan ==" — count
    // joins only once, in the final plan
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    val bnlj = plan.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"only the vocab scalar may nested-loop-broadcast:\n$plan")
  }
}
