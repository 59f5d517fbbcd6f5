package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}
import graft.queries.TextQueries

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
    (4L, "completely different content about spark engines and shuffles here"),
    (5L, "THE  quick   Brown fox JUMPS over the lazy dog") // normalizes to 1
  ).toDF("doc_id", "text")

  test("exact dedup groups normal-form duplicates, keeps min id") {
    val out = docs.select(
        graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp").agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .collect()
    val dupGroup = out.find(_.getAs[Long]("n") === 3L)
    assert(dupGroup.isDefined, "1,2,5 should share a fingerprint")
    assert(dupGroup.get.getAs[Long]("keep_id") === 1L)
  }

  test("minhash LSH surfaces exact and near duplicates as candidates") {
    val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical docs must collide in every band")
    assert(pairs.contains((1L, 5L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      s"near dup should be a candidate, got $pairs")
  }

  test("minhash est_jaccard is 1.0 for identical docs") {
    val est = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .select("est_jaccard").as[Double].head()
    assert(est === 1.0)
  }

  test("simhash: identical docs at hamming 0, unrelated docs far") {
    val sh = Dedup.withSimhash(docs.select(col("doc_id"), col("text")), col("text"))
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L) === sh(5L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 10)
  }

  test("ngram jaccard: identical=1, near-dup high, disjoint docs absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        minJaccard = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs((1L, 3L)) > 0.5)
    assert(!pairs.contains((1L, 4L)), "docs sharing no shingle never pair")
  }

  test("winnow pairs: identical docs pair, substring overlap fires, disjoint absent") {
    val pairs = Dedup.winnowPairs(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical docs share every fingerprint")
    assert(pairs.contains((1L, 5L)), "normalization-equal docs share fingerprints")
    assert(!pairs.contains((1L, 4L)), "no shared word runs → no shared fingerprint")
  }

  test("winnow sketch is deterministic and much smaller than the shingle set") {
    val sk = docs.select(col("doc_id"),
        graft.functions.text.winnow(col("text"), 3, 4).as("w"),
        graft.functions.text.wordShingles(col("text"), 3).as("sh"))
      .collect()
    sk.foreach { r =>
      val w = r.getSeq[Long](1)
      // md5-lane domain (what winnow hashes with), not xxhash64
      val sh = r.getSeq[String](2).map(s =>
        org.apache.spark.sql.graft.TextSketch.md5Lower(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))).toSet
      assert(w.nonEmpty && w.toSet.subsetOf(sh),
        "every fingerprint is one of the doc's shingle hashes")
    }
  }

  test("exact-substring spans: copied run flagged only in the later doc, merged into one span") {
    val run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima" // 12 words
    val corpus = Seq(
      (1L, run),                              // canonical first occurrence
      (2L, "prefix words here " + run),       // copies the 12-word run at word 3
      (3L, "unrelated totally different words with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(corpus, col("doc_id"), col("text"), w = 8)
      .collect()
    assert(!spans.exists(_.getLong(0) == 1L), "canonical occurrence keeps its text")
    assert(!spans.exists(_.getLong(0) == 3L), "no shared 8-word run, no span")
    val s2 = spans.filter(_.getLong(0) == 2L)
    assert(s2.length === 1, s"the 5 flagged windows must merge to ONE span: ${s2.toSeq}")
    val r = s2.head
    // flagged window starts 3..7 → span [3, 7+7] = the whole copied run
    assert(r.getAs[Long]("span_start") === 3L)
    assert(r.getAs[Long]("span_end") === 14L)
    assert(r.getAs[Long]("span_words") === 12L)
    assert(r.getAs[Long]("n_windows") === 5L)
  }

  test("exact-substring spans: self-repetition inside one doc is flagged after its first occurrence") {
    val eight = "one two three four five six seven eight"
    val corpus = Seq((7L, eight + " " + eight)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(corpus, col("doc_id"), col("text"), w = 8)
      .collect()
    // 16 words, windows 0..8; only window 8 repeats window 0 (the boundary
    // windows mix both copies) → one span over the second copy
    assert(spans.length === 1)
    val r = spans.head
    assert(r.getAs[Long]("span_start") === 8L && r.getAs[Long]("span_end") === 15L
      && r.getAs[Long]("n_windows") === 1L)
  }

  test("exact-substring spans: short docs are excluded, disjoint spans stay separate") {
    val runA = "a1 a2 a3 a4 a5 a6 a7 a8"
    val runB = "b1 b2 b3 b4 b5 b6 b7 b8"
    val corpus = Seq(
      (1L, "tiny doc"), (2L, "tiny doc"),     // < 8 words: exact-dup territory
      (3L, runA), (4L, runB),
      // copies run A at 0 and run B at 17 with 9 fresh words between — two islands
      (5L, runA + " x1 x2 x3 x4 x5 x6 x7 x8 x9 " + runB)
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(corpus, col("doc_id"), col("text"), w = 8)
      .collect()
    assert(!spans.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L),
      "docs under w words never emit spans")
    val s5 = spans.filter(_.getLong(0) == 5L).sortBy(_.getAs[Long]("span_start"))
    assert(s5.length === 2, s"runs separated by > w fresh words must stay two spans: ${s5.toSeq}")
    assert(s5(0).getAs[Long]("span_start") === 0L && s5(0).getAs[Long]("span_end") === 7L)
    assert(s5(1).getAs[Long]("span_start") === 17L && s5(1).getAs[Long]("span_end") === 24L)
  }

  test("exact-substring plan: two exchanges, no joins") {
    val df = Dedup.exactSubstringSpans(docs, col("doc_id"), col("text"), w = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"identity dedup needs no join:\n$plan")
    val exch = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exch <= 2, s"expected at most 2 exchanges (hash key, doc key), got $exch:\n$plan")
  }

  test("incremental dedup: exact beats near, canonical min id, unique passes") {
    // history = docs 1..5 (the suite corpus); today's batch carries an
    // exact copy (normalizes to doc 1), a near-dup, and a fresh doc
    val batch = Seq(
      (10L, "The quick  brown fox jumps over the LAZY dog"), // exact (norm) of 1
      (11L, "the quick brown fox jumps over the lazy wolf"), // near dup
      (12L, "entirely novel text with no historical counterpart whatsoever")
    ).toDF("doc_id", "text")
    val histSk = Dedup.minhashSketch(docs, col("doc_id"), col("text"))
    val out = Dedup.incrementalDedup(
        Dedup.minhashSketch(batch, col("doc_id"), col("text")),
        histSk.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id")),
        Dedup.bandRows(histSk.select(col("doc_id"), col("__sig")), 32, 8))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // exact dup: fingerprint match wins even though bands also match;
    // canonical = MIN historical id of the fp group (1, not 2 or 5)
    assert(out(10L) === ("exact_dup", 1L))
    // near dup: shares a band at agreement >= 0.5 with some historical
    // near-duplicate; WHICH of the family matches is banding luck, but the
    // match must be from the quick-brown-fox family (1,2,3,5), never 4
    assert(out(11L)._1 === "near_dup")
    assert(Set(1L, 2L, 3L, 5L).contains(out(11L)._2), s"got ${out(11L)._2}")
    // unique: neither join fires
    assert(out(12L) === ("unique", -1L))
  }

  test("incremental dedup plan: store joins are shuffle_hash, zero sort-merge") {
    // the incremental design exists to avoid O(corpus) work per day — a
    // sort-merge join would re-SORT the full history side every run, and
    // the planner picks exactly that without the hints. Build side must be
    // the (small) batch; the bucketed store streams through the probe side.
    val batch = Seq((10L, "some fresh text here")).toDF("doc_id", "text")
    val histSk = Dedup.minhashSketch(docs, col("doc_id"), col("text"))
    val df = Dedup.incrementalDedup(
      Dedup.minhashSketch(batch, col("doc_id"), col("text")),
      histSk.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id")),
      Dedup.bandRows(histSk.select(col("doc_id"), col("__sig")), 32, 8))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("SortMergeJoin"),
      s"incremental dedup must not sort the history store:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffle_hash joins:\n$plan")
  }

  test("incremental components: merges, bridges, new-min relabels == from-scratch") {
    import graft.ops.Components
    // store graph: {5,6} and {8,9} are two converged components (labels =
    // min member), 7 a singleton
    val storeLabels = Seq((5L, 5L), (6L, 5L), (7L, 7L), (8L, 8L), (9L, 8L))
      .toDF("id", "component")
    // day's batch: 1 bridges BOTH store components (and its id is SMALLER
    // than every historical member — the relabel must flow new→old);
    // 10 pairs with the singleton; 11 arrives with no edges at all
    val newNodes = Seq(1L, 10L, 11L).toDF("id")
    val newEdges = Seq((1L, 6L), (9L, 1L), (10L, 7L)).toDF("src", "dst")
    val got = Components.incrementalComponents(storeLabels, newNodes, newEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // from-scratch reference over the full two-generation graph
    val allNodes = Seq(5L, 6L, 7L, 8L, 9L, 1L, 10L, 11L).toDF("id")
    val histEdges = Seq((5L, 6L), (8L, 9L)).toDF("src", "dst")
    val want = Components.connectedComponents(allNodes,
        histEdges.unionByName(newEdges))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    // and the specific shapes: the bridge merged 5,6,8,9 under new min 1;
    // 10 joined 7 under 7; 11 stayed a singleton
    assert(Seq(5L, 6L, 8L, 9L, 1L).forall(got(_) == 1L))
    assert(got(10L) === 7L && got(7L) === 7L)
    assert(got(11L) === 11L)
  }

  test("incremental components == batch on the two-generation LSH split, store never shuffles") {
    import graft.ops.{Components, Similarity}
    val c = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val hist = c.filter(col("id") % 5 =!= 4)
    val batch = c.filter(col("id") % 5 === 4)
    val store = Components.connectedComponents(hist.select(col("id")),
      Similarity.hyperplaneLshPairs(hist)
        .select(col("id_a").as("src"), col("id_b").as("dst")))
    val newPairs = Similarity.lshIncrementalPairs(
      Similarity.lshBuckets(batch), Similarity.lshBuckets(hist))
    val inc = Components.incrementalComponents(store, batch.select(col("id")),
      newPairs)
    val got = inc.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Components.connectedComponents(c.select(col("id")),
        Similarity.hyperplaneLshPairs(c)
          .select(col("id_a").as("src"), col("id_b").as("dst")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want,
      "incremental fold must equal from-scratch components on the full graph")
    // the relabel stage must broadcast the remap over the store — a
    // shuffled join of the full store would be the O(corpus) cost the
    // incremental design exists to avoid. The NEGATIVE assertion is the
    // real pin: a positive contains(BroadcastHashJoin) alone would still
    // pass if the store relabel regressed to a shuffled join while some
    // other join in the plan happened to broadcast.
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"store relabel should be a broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no join in the fold's output plan may shuffle the store:\n$plan")
  }

  test("edit1 incremental pairs: probe-touching set completes the index-internal set") {
    import graft.ops.FuzzyJoin
    val rows = Seq((1L, "alpha"), (2L, "alphb"), (3L, "beta"), (4L, "betas"),
      (5L, "alphc"), (6L, "gamma")).toDF("m_id", "m_name")
    val index = rows.filter(col("m_id") <= 3) // "history"
    val probe = rows.filter(col("m_id") > 3) // "today's batch"
    def keys(df: org.apache.spark.sql.DataFrame) =
      FuzzyJoin.deletionKeys(df, col("m_id"), col("m_name"))
    val inc = FuzzyJoin.edit1IncrementalPairs(keys(probe), keys(index))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = FuzzyJoin.edit1Pairs(rows, col("m_id"), col("m_name"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexInternal = FuzzyJoin.edit1Pairs(index, col("m_id"), col("m_name"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the pairs that touch the probe: full minus index-internal
    assert(inc === (full -- indexInternal))
    // and the batch-vs-history + batch-internal shapes are both present
    assert(inc.contains((1L, 5L)) && inc.contains((2L, 5L)),
      "batch mention must link to its historical near-duplicates")
    assert(inc.contains((3L, 4L)), "probe-vs-index insert/delete pair")
  }

  test("IVF-flat knn recalls most of the exact brute-force neighbors") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val queries = corpus.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    val exact = Similarity.knnBruteForce(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfFlatKnn(corpus, queries, k = 5, nCells = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    assert(ivf.size === exact.size, "IVF must still return k per query here")
    // Lloyd training is deterministic: same init sample, same iteration math
    val again = Similarity.ivfFlatKnn(corpus, queries, k = 5, nCells = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === ivf)
  }

  test("embedding LSH pairs are a subset of exact brute-force pairs") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val exact = Similarity.bruteForcePairs(corpus, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.hyperplaneLshPairs(corpus, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH found non-pairs: ${lsh -- exact}")
    assert(lsh.nonEmpty, "LSH should recall at least some true pairs here")
  }
}
