package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis._
import graft.ops.{Cleaning, Packing, TextAnalysis}

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("sequence packing: contiguous fill respects the budget invariant") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), wsTokenCount(col("text")).as("tokens"))
    val packed = Packing.packSequences(docs, col("tokens"), col("doc_id"), 512L)
    // every doc lands in exactly one pack
    assert(packed.count() === docs.count())
    // pack ids are contiguous from 0
    val ids = packed.select("pack_id").distinct()
      .orderBy("pack_id").as[Long].collect()
    assert(ids.toSeq === (0L until ids.length).toSeq)
    // contiguous-fill invariant: a pack exceeds the budget only by its
    // final document: total - last_doc_tokens < budget
    val viol = packed.groupBy("pack_id")
      .agg(sum("tokens").as("total"), max("doc_id").as("last_doc"))
      .join(packed.select(col("doc_id").as("last_doc"), col("tokens").as("last_tokens")), "last_doc")
      .filter(col("total") - col("last_tokens") >= 512L)
      .count()
    assert(viol === 0)
  }

  test("two-phase packing equals the sequential reference for any bucketing") {
    // the distributed cumsum (quantile buckets + prefix offsets) must be
    // bit-identical to a driver-side sequential scan, whatever the bucket
    // count — boundaries may only affect load balance, never output
    val rnd = new scala.util.Random(7)
    val docs = (0L until 500L).map(i => (i, rnd.nextInt(300).toLong + 1L))
    val expectedFull = {
      var cum = 0L
      docs.sortBy(_._1).map { case (id, t) =>
        cum += t; id -> ((cum, (cum - t) / 97L))
      }.toMap
    }
    val df = docs.toDF("doc_id", "tokens")
    Seq(1, 3, 16, 64, 500).foreach { buckets =>
      val got = Packing.packSequences(df, col("tokens"), col("doc_id"),
          budget = 97L, buckets = buckets)
        .select("doc_id", "cum_tokens", "pack_id")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got === expectedFull, s"buckets=$buckets")
    }
  }

  test("sharded packing never crosses shard boundaries") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), wsTokenCount(col("text")).as("tokens"),
        (col("doc_id") % 4).as("shard"))
    val packed = Packing.packSequences(docs, col("tokens"), col("doc_id"),
      512L, shard = Some(col("shard")))
    // within each shard, ids are contiguous from 0 — independent packings
    val perShard = packed.groupBy("shard")
      .agg(countDistinct("pack_id").as("n_packs"), max("pack_id").as("max_id"))
      .collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("max_id") === r.getAs[Long]("n_packs") - 1)
    }
  }

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

  test("tfidf keywords: hand-checked scores and ranks on a toy corpus") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple date date")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, col("doc_id"), col("text"), k = 2)
      .collect()
    // N=3; df: apple 2, banana 2, cherry 1, date 1
    val top = out.groupBy(_.getAs[Long]("doc_id")).view
      .mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[String]("term")).toSeq).toMap
    assert(top(1L) === Seq("apple", "banana"), "doc1: 2*3/2=3.0 > 1*3/2=1.5")
    assert(top(2L) === Seq("cherry", "banana"), "doc2: 1*3/1=3.0 > 1.5")
    assert(top(3L) === Seq("date", "apple"), "doc3: 2*3/1=6.0 > 1.5")
    val a1 = out.find(r => r.getAs[Long]("doc_id") == 1L &&
      r.getAs[String]("term") == "apple").get
    assert(a1.getAs[Long]("tf") === 2L)
    assert(a1.getAs[Long]("df") === 2L)
    assert(a1.getAs[Double]("score") === 3.0)
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
