package graft

import org.apache.spark.sql.functions._
import graft.queries.{DatalakeQueries, EventQueries}

/** Round-8 operator semantics: sweep-line concurrency and incremental
  * materialized-view maintenance (the driver oracle proves exactness at
  * sf0.01; these pin the SEMANTICS on reference computations).
  */
class Round8Spec extends SparkSpecBase {

  test("concurrency: sweep-line peak equals brute-force interval counting") {
    val got = EventQueries.qConcurrency(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    // brute force: for every interval start t, count intervals with
    // s <= t < e (peaks occur at starts under the closed-open convention)
    val iv = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (et, a) =>
        et -> a.map(_._2 ).sorted
      }
    iv.foreach { case (et, starts) =>
      val ends = starts.map(_ + 30L * 60 * 1000000)
      val peak = starts.map { t =>
        starts.count(s => s <= t) - ends.count(e => e <= t)
      }.max
      assert(got(et).getAs[Long]("max_concurrent") === peak.toLong,
        s"$et: expected peak $peak")
      assert(got(et).getAs[Long]("n_intervals") === starts.length.toLong)
    }
  }

  test("bfs distances: hop bound honored, early convergence, unreachable absent") {
    import spark.implicits._
    // path 1→2→3→4→5 plus island 99
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val bounded = graft.ops.Graph.bfsDistances(edges, Seq(1L).toDF("node"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded === Map(1L -> 0L, 2L -> 1L, 3L -> 2L),
      "nodes past the hop bound must be absent, not mislabeled")
    val full = graft.ops.Graph.bfsDistances(edges, Seq(1L).toDF("node"), maxHops = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L),
      "early convergence (diameter 4 << bound 20) must still be exact")
    // multi-source: nearest source wins
    val multi = graft.ops.Graph.bfsDistances(edges,
        Seq(1L, 4L).toDF("node"), maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 1L))
  }

  test("prefix set-join: complete vs full inverted index, with smaller candidate mass") {
    import graft.ops.{Dedup, SetJoin}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // ground truth: the FULL inverted-index exact Jaccard join at τ=1/2
    val full = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPrefix = SetJoin.prefixJaccardPairs(docs, col("doc_id"),
        col("text"), tauNum = 1, tauDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPrefix === full,
      s"prefix filter must be LOSSLESS: missing=${(full -- viaPrefix).take(5)}, " +
        s"extra=${(viaPrefix -- full).take(5)}")
    // the scale claim: prefix candidates ≪ the full inverted index's
    // candidate pair mass at the same shingling
    val prefixCand = SetJoin.prefixCandidates(docs, col("doc_id"),
      col("text"), tauNum = 1, tauDen = 2).count()
    val fullCand = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      minJaccard = 0.0).count()
    assert(prefixCand < fullCand / 2,
      s"prefix candidates $prefixCand should be well under full-index $fullCand")
  }

  test("incremental MV merge equals the one-pass aggregate, store persisted") {
    val inc = DatalakeQueries.qMvIncremental(spark, sfDir).collect()
      .map(r => (String.valueOf(r.get(0)), r.getDouble(1), r.getLong(2)))
    val once = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_orderdate"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderdate"))
      .collect()
      .map(r => (String.valueOf(r.get(0)), r.getDouble(1), r.getLong(2)))
    assert(inc.toSeq === once.toSeq,
      "store + delta fold must equal the from-scratch aggregate exactly")
  }
}
