package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Scd, Sketches, Skyline}

/** Round-7 operator family: Count-Min sketch, triangle counting, skyline,
  * Naive Bayes, SCD2 history.
  */
class Round7Spec extends SparkSpecBase {
  import spark.implicits._

  test("sketch plans combine map-side: partial agg BEFORE the counter exchange") {
    // the 100 TB contract of both sketches is that the shuffle carries
    // counters, not occurrences: the partial aggregate must sit below the
    // (lane,bucket)/(g,bucket) exchange so each partition contributes at
    // most its own fixed-size counter block
    val toks = TestSession.spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.text.wordShingles(col("text"), 1))
        .as("t"))
    val cms = Sketches.cmsBuild(toks, col("t"), width = 256)
    cms.collect()
    val cmsPlan = cms.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(cmsPlan.contains("partial_count"),
      s"CMS build lost its map-side combine:\n$cmsPlan")
    val regs = Sketches.hllRegisters(
      TestSession.spark.read.parquet(s"$sfDir/events.parquet"),
      col("event_type"), col("user_id"))
    regs.collect()
    val hllPlan = regs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(hllPlan.contains("partial_max"),
      s"HLL registers lost their map-side combine:\n$hllPlan")
  }

  // ---- Count-Min sketch ----

  test("CMS never undercounts: estimate >= exact for EVERY distinct item") {
    val toks = TestSession.spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.text.wordShingles(col("text"), 1))
        .as("t"))
    val cms = Sketches.cmsBuild(toks, col("t"), width = 256)
    assert(cms.count() <= 4 * 256, "sketch exceeded its fixed d*w size")
    val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("exact"))
    val under = exact
      .join(Sketches.cmsEstimate(cms, exact.select(col("t")), col("t"), 256)
        .withColumnRenamed("item", "t"), Seq("t"))
      .filter(col("cms_est") < col("exact"))
      .count()
    assert(under === 0, "CMS one-sided error violated: an estimate undercounted")
  }

  test("CMS estimate is exact when width crushes the vocabulary") {
    // 3 distinct items in a 1024-wide sketch: collision probability ~0 for
    // this fixed md5 layout — estimates equal exact counts
    val items = Seq.fill(5)("aa") ++ Seq.fill(3)("bb") ++ Seq.fill(2)("cc")
    val df = items.toDF("t")
    val cms = Sketches.cmsBuild(df, col("t"), width = 1024)
    val est = Sketches.cmsEstimate(cms, df.distinct(), col("t"), 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("aa" -> 5L, "bb" -> 3L, "cc" -> 2L))
  }

  test("CMS estimates an UNSEEN item as 0 instead of dropping or inflating it") {
    val cms = Sketches.cmsBuild(Seq.fill(4)("present").toDF("t"), col("t"),
      width = 1024)
    val est = Sketches.cmsEstimate(cms,
        Seq("present", "never-seen").toDF("t"), col("t"), 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("present" -> 4L, "never-seen" -> 0L),
      "an item with empty cells must estimate through the zero counters")
  }

  test("HLL estimate lands within the m=1024 error envelope on real data") {
    val e = TestSession.spark.read.parquet(s"$sfDir/events.parquet")
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
    val rows = Sketches.hllDistinct(e, col("event_type"), col("user_id"))
      .withColumnRenamed("g", "event_type")
      .join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("hll_est")
      val ex = r.getAs[Long]("exact").toDouble
      // 1.04/√1024 ≈ 3.25% std error; 15% is > 4 sigma
      assert(math.abs(est - ex) / ex < 0.15,
        s"${r.getAs[String]("event_type")}: est $est vs exact $ex")
    }
  }

  test("HLL regime split: tiny sets go linear, large sets go raw, both accurate") {
    val small = (1L to 40L).map(i => ("s", i)).toDF("g", "v")
    val large = (1L to 50000L).map(i => ("l", i)).toDF("g", "v")
    val out = Sketches.hllDistinct(small.unionAll(large), col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getString(2))).toMap
    assert(out("s")._2 === "linear" && math.abs(out("s")._1 - 40.0) < 5.0)
    assert(out("l")._2 === "raw" &&
      math.abs(out("l")._1 - 50000.0) / 50000.0 < 0.15)
  }

  test("HLL registers merge losslessly: max-merged parts equal the direct sketch") {
    val e = TestSession.spark.read.parquet(s"$sfDir/events.parquet")
    val merged = Sketches.hllEstimate(
      Sketches.hllRegisters(e, col("event_type"), col("user_id"))
        .select(lit("all").as("g"), col("bucket"), col("rho"))
        .groupBy(col("g"), col("bucket")).agg(max(col("rho")).as("rho")))
      .collect().head
    val direct = Sketches.hllEstimate(
        Sketches.hllRegisters(e, lit("all"), col("user_id")))
      .collect().head
    assert(merged.getDouble(1) === direct.getDouble(1),
      "register merge must be bit-identical to the single-pass sketch")
  }

  test("histogram quantile bucket contains the rank-q order statistic exactly") {
    // rank semantics, not interpolation: the estimate is the lower bound
    // of the bucket holding the ceil(q*n)-th smallest value (interpolated
    // percentile can sit a value-GAP away in a sparse tail, so comparing
    // to it would test the data, not the operator)
    val e = TestSession.spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("value").isNotNull)
    val est = Sketches.histQuantiles(e, col("event_type"), col("value"),
        Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val vals = e.select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, a) => g -> a.map(_._2).sorted }
    assert(est.keySet === vals.keySet)
    est.foreach { case (g, (p50, p95)) =>
      val sorted = vals(g)
      def orderStat(q: Double): Double =
        sorted(math.ceil(q * sorted.length).toInt - 1)
      assert(math.floor(orderStat(0.5)) === p50,
        s"$g p50 bucket $p50 misses order stat ${orderStat(0.5)}")
      assert(math.floor(orderStat(0.95)) === p95,
        s"$g p95 bucket $p95 misses order stat ${orderStat(0.95)}")
    }
  }

  test("bloom pruning is sound (no false negatives) and map-side (broadcast only)") {
    val df = graft.queries.Relational.qBloomPrune(TestSession.spark, sfDir)
    val r = df.collect().head
    assert(r.getAs[Long]("false_negative_rows") === 0L,
      "a bloom filter must NEVER drop a true match")
    assert(r.getAs[Long]("bloom_pass_rows") >= r.getAs[Long]("exact_match_rows"))
    assert(r.getAs[Long]("probe_rows") > 0)
    // the query checkpoints its 1-row summary (leak discipline), so ITS
    // executedPlan is a checkpoint scan — pin the join shape on the
    // membership construction itself
    val spark = TestSession.spark
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val urgent = orders.filter(col("o_orderpriority").like("1-%"))
      .select(col("o_orderkey"))
    val bits = graft.ops.Sketches
      .bloomBits(urgent, col("o_orderkey").cast("string"), 1 << 17)
      .localCheckpoint(true)
    val member = graft.ops.Sketches.bloomMember(
      spark.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey")),
      col("l_orderkey").cast("string"), bits, 1 << 17, "bloom_pass")
    val plan = member.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // Dataset.unpersist is a silent no-op for checkpoint-backed frames
    // (blocks live at the RDD level) — release the backing RDD properly
    graft.ops.Checkpoints.release(bits)
    assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("ShuffledHashJoin"),
      "membership tests must stay broadcast, never a shuffled join")
  }

  test("bloom and heavy-hitter queries release their working storage") {
    // the qPagerank leak discipline extended to the other checkpointing
    // queries (round-7 ADVICE): one invocation may leave exactly ONE
    // persistent RDD — its checkpointed result. Retried because suites
    // share the SparkContext (cache/unpersist races inflate one reading).
    for ((name, run) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "q_bloom_prune" ->
          (() => graft.queries.Relational.qBloomPrune(TestSession.spark, sfDir)),
        "q_heavy_hitters" ->
          (() => graft.queries.TextQueries.qHeavyHitters(TestSession.spark, sfDir)))) {
      assertReleasesStorage(name, run)
    }
  }

  // ---- triangle counting ----

  test("triangles: K4 gives every node 3, an open wedge gives none") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + wedge 10-11-12
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L)
    ).toDF("u", "v")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: hub orientation never explodes the hub's fan-out") {
    // star centre 0 with 20 leaves + one closing edge (1,2): exactly one
    // triangle {0,1,2}; the centre's high degree must orient edges INTO it
    val edges = ((1L to 20L).map(i => (0L, i)) :+ (1L, 2L)).toDF("u", "v")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("reservoir sample: exactly min(8, |source|) rows per source, partition-invariant") {
    val got = graft.queries.CorpusQueries
      .qSampleReservoir(TestSession.spark, sfDir).collect()
    val perSource = got.groupBy(_.getString(0)).map { case (s, a) => s -> a.length }
    val sizes = TestSession.spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.keySet === sizes.keySet)
    perSource.foreach { case (s, n) =>
      assert(n === math.min(8L, sizes(s)), s"source $s: $n of ${sizes(s)}")
    }
    // the selected SET is a pure function of (doc_id, n_chars) — rerun
    // must reproduce it row for row
    val again = graft.queries.CorpusQueries
      .qSampleReservoir(TestSession.spark, sfDir).collect()
    assert(got.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  // ---- skyline ----

  test("skyline matches brute-force strict dominance, any partitioning") {
    // fixed deterministic point set with duplicates and x/y ties
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i =>
      (i, (rnd.nextInt(50) + 1).toDouble, (rnd.nextInt(50) + 1).toDouble)) ++
      Seq((401L, 1.0, 50.0), (402L, 1.0, 50.0)) // equal best points: both stay
    val df = pts.toDF("id", "x", "y").repartition(7)
    val got = Skyline.skyline2D(df, col("id"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.toSet
    assert(got === brute.map(p => (p._1, p._2, p._3)))
    assert(got.exists(_._1 == 401L) && got.exists(_._1 == 402L),
      "equal non-dominated duplicates must BOTH survive")
  }

  test("skyline drops null/NaN rows instead of corrupting the scan") {
    val df = Seq(
      (1L, Some(1.0), Some(2.0)), (2L, None, Some(9.0)),
      (3L, Some(Double.NaN), Some(1.0)), (4L, Some(0.5), Some(1.0))
    ).toDF("id", "x", "y")
    val ids = Skyline.skyline2D(df, col("id"), col("x"), col("y"))
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 4L))
  }

  // ---- Naive Bayes ----

  test("NB classifies separable classes and never misses a doc") {
    val docs = (0L to 19L).map { i =>
      if (i % 2 == 0) (i, "le chat mange le poisson frais", "fr")
      else (i, "the cat eats the fresh fish", "en")
    }.toDF("doc_id", "text", "lang")
    // train on half the docs (doc_id % 4 < 2 covers both classes)
    val out = graft.ops.LanguageModel.naiveBayes(docs, col("doc_id"),
      col("text"), col("lang"), col("doc_id") % 4 < 2).collect()
    assert(out.length === 20, "every document must be scored")
    assert(out.forall(_.getBoolean(4)), // is_correct
      "fully separable vocabularies must classify perfectly")
  }

  test("NB argmax tie-break is deterministic: first class name wins") {
    // both classes see the identical token stream -> identical likelihoods
    // and priors; the tie must break to the lexicographically first class
    val docs = Seq(
      (0L, "x y z", "a"), (1L, "x y z", "b"), (2L, "x y z", "a"),
      (3L, "x y z", "b")
    ).toDF("doc_id", "text", "lang")
    val out = graft.ops.LanguageModel.naiveBayes(docs, col("doc_id"),
      col("text"), col("lang"), lit(true)).collect()
    assert(out.forall(_.getString(1) == "a"))
  }

  // ---- SCD2 ----

  test("SCD2: consecutive duplicates collapse, intervals chain, current open") {
    val e = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "free"),
      (2L, "2024-01-02 00:00:00", 10L, "free"), // same value: no new version
      (3L, "2024-01-03 00:00:00", 10L, "pro"),
      (4L, "2024-01-04 00:00:00", 10L, "free"), // value can recur later
      (5L, "2024-01-01 00:00:00", 20L, "pro")
    ).toDF("event_id", "ts", "user_id", "plan")
      .select(col("event_id"), to_timestamp(col("ts")).as("ts"),
        col("user_id"), col("plan"))
    val got = Scd.scd2History(e, col("user_id"), col("ts"), col("plan"),
        col("event_id"))
      .orderBy(col("key"), col("version")).collect()
    val u10 = got.filter(_.getLong(0) == 10L)
    assert(u10.map(_.getString(1)).toSeq === Seq("free", "pro", "free"))
    assert(u10.map(_.getInt(4)).toSeq === Seq(1, 2, 3))
    // each interval closes exactly where the next opens
    assert(u10(0).getTimestamp(3) === u10(1).getTimestamp(2))
    assert(u10(1).getTimestamp(3) === u10(2).getTimestamp(2))
    assert(u10(2).isNullAt(3) && u10(2).getBoolean(5), "last version open + current")
    val u20 = got.filter(_.getLong(0) == 20L)
    assert(u20.length === 1 && u20(0).getBoolean(5))
  }

  test("SCD2 equal-timestamp changes order by the tie-break, deterministically") {
    val ts0 = "2024-01-01 00:00:00"
    val e = Seq(
      (2L, ts0, 1L, "b"), (1L, ts0, 1L, "a"), (3L, ts0, 1L, "c")
    ).toDF("event_id", "ts", "user_id", "v")
      .select(col("event_id"), to_timestamp(col("ts")).as("ts"),
        col("user_id"), col("v"))
    val got = Scd.scd2History(e, col("user_id"), col("ts"), col("v"),
        col("event_id"))
      .orderBy(col("version")).collect()
    assert(got.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
  }
}
