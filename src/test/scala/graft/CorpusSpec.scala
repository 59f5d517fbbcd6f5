package graft

import org.apache.spark.sql.functions._
import graft.ops.Corpus
import graft.queries.CorpusQueries

class CorpusSpec extends SparkSpecBase {
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing an n-gram with eval") {
    val eval_ = Seq((100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "completely unrelated text about spark query planning here"),
      // contains the eval 8-gram "the quick brown fox jumps over the lazy"
      (2L, "prefix words the quick brown fox jumps over the lazy dog suffix"),
      (3L, "short doc")).toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, eval_, col("doc_id"), col("text"), n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("stratified sample is deterministic and near its target rates") {
    val a = CorpusQueries.qSampleStratified(spark, "/root/testdata/sf0.01")
    val b = CorpusQueries.qSampleStratified(spark, "/root/testdata/sf0.01")
    assert(a.collect().toSeq === b.collect().toSeq, "sampling must be stable")
    val bySrcParity = a
      .withColumn("par", regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 2)
      .groupBy("par").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 250 docs per parity at sf0.01: even ≈ 50%, odd ≈ 20%
    assert(bySrcParity(0) > 95 && bySrcParity(0) < 155, s"even rate off: $bySrcParity")
    assert(bySrcParity(1) > 25 && bySrcParity(1) < 75, s"odd rate off: $bySrcParity")
  }

  test("source mix: shares sum to 1, budgets never exceed the total") {
    val rows = CorpusQueries.qSourceMix(spark, "/root/testdata/sf0.01").collect()
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-9)
    val budgets = rows.map(_.getAs[Long]("token_budget")).sum
    assert(budgets <= 1000000L && budgets > 1000000L - rows.length,
      s"floor allocation must lose < 1 token per source, got $budgets")
  }

  test("chunk windows tile every token with the configured overlap") {
    val df = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Corpus.chunkWindows(df, col("doc_id"), col("text"), 64, 48)
      .orderBy("chunk_idx").collect()
    assert(chunks.length === 3) // starts 0, 48, 96
    assert(chunks.map(_.getAs[Long]("chunk_start")).toSeq === Seq(0L, 48L, 96L))
    assert(chunks.map(_.getAs[Long]("chunk_len")).toSeq === Seq(64L, 52L, 4L))
    val first = chunks.head.getAs[String]("chunk_text").split(" ")
    assert(first.head === "w1" && first.last === "w64" && first.length === 64)
    val last = chunks.last.getAs[String]("chunk_text").split(" ")
    assert(last.toSeq === Seq("w97", "w98", "w99", "w100"))
  }

  test("weighted sampling: rate tracks weight, samples are nested in weight") {
    val docs = (1 to 4000).map(i => (i.toLong, s"doc body number $i")).toDF("doc_id", "text")
    def kept(w: Double): Set[Long] =
      Corpus.sampleWeighted(docs.withColumn("w", lit(w)), col("text"), col("w"))
        .collect().map(_.getLong(0)).toSet
    val k0 = kept(0.0); val k2 = kept(0.2); val k6 = kept(0.6); val k1 = kept(1.0)
    assert(k0.isEmpty, "weight 0 keeps nothing")
    // the md5 draw is shared across thresholds → samples NEST: raising the
    // weight only ADDS rows (the property that makes re-sampling at a new
    // rate cheap and stable)
    assert(k2.subsetOf(k6) && k6.subsetOf(k1))
    assert(math.abs(k2.size / 4000.0 - 0.2) < 0.03, s"~20% kept, got ${k2.size}")
    assert(math.abs(k6.size / 4000.0 - 0.6) < 0.03, s"~60% kept, got ${k6.size}")
    assert(k1.size === 4000, "weight 1.0 (clamped to 1-2^-32) keeps all")
    // determinism: same call, same rows
    assert(kept(0.2) === k2)
  }

  test("rolling frame features: hand-checked against a driver-side scan") {
    val uid = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").count().filter(col("count") >= 6)
      .orderBy("user_id").limit(1).collect().head.getLong(0)
    val rows = graft.queries.EventQueries.qRollingFeatures(spark, sfDir)
      .filter(col("user_id") === uid).orderBy(col("event_id")).collect()
    val raw = graft.sources.Tables.events(spark, sfDir)
      .filter(col("user_id") === uid)
      // sort on raw MICROS, not Timestamp.getTime (millis) — sub-milli ties
      // would order differently from the query's microsecond window order
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .sortBy(r => (r.getLong(1), r.getLong(0)))
    assert(rows.nonEmpty && rows.length === raw.length)
    val vals = raw.map(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    rows.zipWithIndex.foreach { case (r, _) =>
      val i = raw.indexWhere(_.getLong(0) == r.getLong(0))
      val lo = math.max(0, i - 4)
      val frame = vals.slice(lo, i + 1).flatten
      assert(r.getAs[Long]("roll_n") === (i - lo + 1), s"roll_n at $i")
      val expSum = BigDecimal(frame.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toString)
      assert(math.abs(r.getAs[Double]("roll_sum") - expSum.toDouble) < 1e-6,
        s"roll_sum at $i")
      if (frame.nonEmpty) {
        assert(r.getAs[Double]("roll_min") === frame.min, s"roll_min at $i")
        assert(r.getAs[Double]("roll_max") === frame.max, s"roll_max at $i")
      }
    }
  }

  test("chunk windows tile any length: property over random docs") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(200) + 1
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "), n)
    }
    val df = docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
    val got = graft.ops.Corpus.chunkWindows(df, col("doc_id"), col("text"), 64, 48)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getLong(1)) }
    docs.foreach { case (id, _, n) =>
      val chunks = got(id)
      val expected = math.max(1, (n - 1) / 48 + 1)
      assert(chunks.length === expected, s"doc $id n=$n")
      chunks.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(2) === i * 48L, s"doc $id chunk $i start")
        assert(c.getLong(3) === math.min(64L, n - i * 48L), s"doc $id chunk $i len")
      }
      // last chunk reaches the end; consecutive chunks overlap by 16 (or less at tail)
      val last = chunks.last
      assert(last.getLong(2) + last.getLong(3) === n.toLong, s"doc $id tail")
    }
  }

  test("scrub redacts every digit run and counts them") {
    val out = CorpusQueries.qPiiScrub(spark, sfDir)
    assert(out.filter(col("props_clean").rlike("\\d")).count() === 0,
      "digits survived scrubbing")
    assert(out.filter(col("n_redacted") >= 1).count() > 0)
  }

  test("repetition stats catch a degenerate doc and pass a normal one") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "a genuinely varied document with many different words inside"))
      .toDF("doc_id", "text")
    val out = Corpus.repetitionStats(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("dup_word_ratio"), r.getAs[Double]("top_bigram_frac")))
      .toMap
    assert(out(1L)._1 === 0.9 && out(1L)._2 === 1.0) // 10 words, 1 distinct
    assert(out(2L)._1 === 0.0 && out(2L)._2 < 0.2)
  }

  test("salted join rejects join types that would duplicate unmatched rows") {
    val a = Seq((1L, "x")).toDF("k", "va")
    val b = Seq((1L, "y")).toDF("k", "vb")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Salting.saltedJoin(a, b, "k", salts = 4, joinType = "full_outer")
    }
    assert(e.getMessage.contains("saltedJoin"))
    // safe types still work
    assert(graft.ops.Salting.saltedJoin(a, b, "k", 4, "left").count() === 1)
  }

  test("sig_agreement: exact fraction, null on length mismatch or null slot") {
    val df = Seq((Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 4L)))
      .toDF("a", "b")
    val v = df.select(graft.functions.text.sigAgreement(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(v === 0.75)
    val mism = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
      .select(graft.functions.text.sigAgreement(col("a"), col("b")))
      .collect().head
    assert(mism.isNullAt(0), "length mismatch must yield NULL")
    // a null slot is a malformed signature → NULL, never counted as a match
    val nullSlot = spark.range(1).select(graft.functions.text.sigAgreement(
        array(lit(1L), lit(null).cast("long")),
        array(lit(2L), lit(null).cast("long"))))
      .collect().head
    assert(nullSlot.isNullAt(0), "null slots must not count as agreement")
  }

  test("shard shuffle: two-phase enumeration == single-window rank, dense, deterministic") {
    import graft.ops.Sharding
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Sharding.shardShuffle(docs, col("doc_id"), nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length === docs.count())
    // positions are DENSE 0..n-1 within each shard (shard files can be
    // written by position with no gaps)
    got.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $s positions not dense")
    }
    // the scalable two-phase enumeration must equal the naive
    // single-window definition (rank by (subbucket, key, id) per shard)
    val naive = docs.select(col("doc_id"))
      .withColumn("k", md5(col("doc_id").cast("string")))
      .withColumn("v1", ascii(substring(col("k"), 1, 1)))
      .withColumn("v2", ascii(substring(col("k"), 2, 1)))
      .withColumn("shard",
        ((col("v1") - when(col("v1") >= 97, 87).otherwise(48)) % 8).cast("int"))
      .withColumn("sub", col("v2") - when(col("v2") >= 97, 87).otherwise(48))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("sub"), col("k"), col("doc_id"))).cast("long") - 1)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet === naive.toSet)
    // pure function of the data: a second run is identical
    val again = Sharding.shardShuffle(docs, col("doc_id"), nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSet === got.toSet)
  }

  test("curriculum order: dense global positions, tiers walked in order, shuffled within") {
    val out = CorpusQueries.qCurriculum(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("tier"),
        r.getAs[Long]("pos")))
    // one dense global enumeration 0..n-1
    assert(out.map(_._3).sorted.toSeq === (0L until out.length).toSeq)
    // positions walk tiers monotonically: sort by pos, tier never decreases
    val tiersByPos = out.sortBy(_._3).map(_._2)
    tiersByPos.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "tier must never decrease along pos")
      case _ =>
    }
    assert(tiersByPos.distinct.length > 1, "quality must split into tiers")
    // within a tier the order is md5-shuffled, not id-ordered: doc_ids
    // along pos inside the largest tier must not be sorted
    val biggest = out.groupBy(_._2).maxBy(_._2.length)._2
    val idsByPos = biggest.sortBy(_._3).map(_._1).toSeq
    assert(idsByPos !== idsByPos.sorted, "within-tier order should be shuffled")
    // deterministic
    val again = CorpusQueries.qCurriculum(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("tier"),
        r.getAs[Long]("pos")))
    assert(again.toSeq === out.toSeq,
      "output must be pos-ordered and bit-identical across runs")
  }

  test("tokenBudgetFill: boundary arithmetic, zero-token docs, oversized budget") {
    // src a: docs of 10 tokens each under budget 35 → keep while
    // cum_before < 35: 4 docs (ids 1..4), ceil(35/10)=4 through the
    // boundary-group arm (all five docs share one token count)
    val d = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 10L),
      ("a", 5L, 10L),
      // src b: exact-divisible boundary — 20+15 = 35 = budget, doc 13
      // (cum_before=35) dropped; zero-token docs sort last and drop
      ("b", 11L, 20L), ("b", 12L, 15L), ("b", 13L, 5L), ("b", 14L, 0L),
      // src c: total below budget → everything kept incl the 0-token doc
      ("c", 21L, 30L), ("c", 22L, 0L))
      .toDF("source", "doc_id", "n_tokens")
    val kept = Corpus.tokenBudgetFill(d, col("source"), col("doc_id"),
        col("n_tokens"), budget = 35L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(kept === Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 4L,
      "b" -> 11L, "b" -> 12L, "c" -> 21L, "c" -> 22L))
  }
}
