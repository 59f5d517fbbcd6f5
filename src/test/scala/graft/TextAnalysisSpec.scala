package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis._
import graft.ops.Cleaning

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("fingerprint is whitespace/case invariant") {
    val df = Seq("Hello   World", "hello world", "  hello world  ").toDF("t")
    val fps = df.select(fingerprint(col("t"))).as[String].collect().toSet
    assert(fps.size === 1)
    assert(fps.head.matches("[0-9a-f]{32}"))
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq("hello world, it's 42 degrees!").toDF("t")
    val r = df.select(wsTokenCount(col("t")).as("ws"), bpeTokenCount(col("t")).as("bpe"))
      .as[(Long, Long)].head()
    assert(r._1 === 5L)
    // hello | world | , | it | ' | s | 42 | degrees | !
    assert(r._2 === 9L)
  }

  test("language prediction follows marker counts with stable tie-break") {
    val df = Seq(
      "the cat and the dog of the house",   // en
      "le chat et la maison de le une",     // fr
      "der hund und das haus ist ein",      // de
      "xyz qrs tuv").toDF("t")              // no markers → tie → en
    val got = df.select(langPredict(col("t"))).as[String].collect()
    assert(got === Array("en", "fr", "de", "en"))
  }

  test("coercing casts: garbage → default, valid → value") {
    val df = Seq("12.5", "abc", null).toDF("s")
    val got = df.select(Cleaning.coerceDouble(col("s"), -1.0)).as[Double].collect()
    assert(got === Array(12.5, -1.0, -1.0))
  }

  test("range validation predicate") {
    val df = Seq(10.0, 5000.0, 6e7, Double.NaN).toDF("v")
    val got = df.filter(Cleaning.inRange(col("v"), 5000, 5e7)).as[Double].collect()
    assert(got === Array(5000.0))
  }
}
