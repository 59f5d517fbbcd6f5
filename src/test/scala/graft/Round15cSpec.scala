package graft

import org.apache.spark.sql.functions._
import graft.queries.{DatalakeQueries, EventQueries, Relational, StreamQueries}

/** Round-15c additions: K-fold out-of-fold target encoding, the EWMA
  * control chart, incremental JOIN-view maintenance, and streaming HLL.
  * The driver oracle proves exactness at sf0.01; these pin the SEMANTICS
  * that make each op the thing it claims to be.
  */
class Round15cSpec extends SparkSpecBase {

  test("target encode: leave-one-fold-out means, never the row's own fold") {
    val rows = Relational.qTargetEncode(spark, sfDir).collect()
    assert(rows.length === 25, "5 segments x 5 folds")
    // recompute each encoding directly from the other folds' partials
    val byKey = rows.map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    rows.groupBy(_.getString(0)).foreach { case (seg, rs) =>
      val totN = rs.map(_.getLong(2)).sum
      rs.foreach { r =>
        assert(r.getLong(2) + r.getLong(3) === totN,
          s"$seg fold ${r.getLong(1)}: own + other folds = segment total")
      }
      // out-of-fold means differ across folds unless the data conspires —
      // at minimum they must all be finite and positive (prices are)
      assert(rs.forall(r => r.getDouble(4) > 0.0 &&
        !r.getDouble(4).isNaN && !r.getDouble(4).isInfinite))
    }
    // leakage check: encoding for (seg, fold) must NOT equal the naive
    // whole-segment mean when the fold is non-empty (it excludes the fold)
    val seg0 = rows.filter(_.getString(0) == rows.head.getString(0))
    val distinctEnc = seg0.map(_.getDouble(4)).distinct
    assert(distinctEnc.length > 1,
      "out-of-fold encodings vary by fold — a constant would mean leakage " +
        "of the whole-table mean")
    assert(byKey.nonEmpty)
  }

  test("ewma: warmup rows dropped, deviation identity, weights sum to 1") {
    val rows = EventQueries.qEwmaAnomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per type: first 8 days are warmup — emitted days per type = total - 8
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
    val daysPerType = daily.groupBy(_.getString(0)).view.mapValues(_.length)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.length === daysPerType(t) - 8, s"$t: all post-warmup days")
    }
    rows.foreach { r =>
      val v = r.getDouble(2); val f = r.getDouble(4); val dev = r.getDouble(5)
      assert(dev === v - f, "deviation is the single IEEE subtract")
      val expectAlert = if (math.abs(dev) > f * 0.25) 1L else 0L
      assert(r.getLong(6) === expectAlert, "alert rule replays")
    }
    // the weight vector is a partition of unity: a CONSTANT series'
    // forecast equals the constant exactly (exact dyadic scaling)
    val w = (1 to 7).map(k => 1.0 / (1L << k)) :+ 1.0 / (1L << 7)
    assert(w.sum === 1.0)
  }

  test("mv join incremental == from-scratch join, provenance disjoint") {
    val rows = DatalakeQueries.qMvJoinIncremental(spark, sfDir).collect()
    val o = graft.sources.Tables.orders(spark, sfDir)
    val c = graft.sources.Tables.customer(spark, sfDir)
    val direct = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === direct(r.getString(0)),
        s"${r.getString(0)}: incremental row count == full recompute")
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1),
        "store + delta provenance partitions the view exactly")
      assert(r.getLong(3) > 0, "the delta terms actually contributed")
    }
  }

  test("partition evolution: chain walks, union complete, no rewrite") {
    import graft.sources.{Datalake, Tables}
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("day"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-evolve-spec").toString + "/t"
    Datalake.publishEvolved(e.filter(col("event_id") % 3 === 1)
      .repartition(1), root, "1", Seq("event_type"))
    val v1Files = new java.io.File(s"$root/v=1/add").listFiles()
      .filter(_.isDirectory).map(_.lastModified()).toSeq
    Datalake.publishEvolved(e.filter(col("event_id") % 3 === 2)
      .repartition(1), root, "2", Seq("day"))
    // a third evolution back to UNPARTITIONED also chains
    Datalake.publishEvolved(e.filter(col("event_id") % 3 === 0)
      .repartition(1), root, "3", Nil)
    val segs = Datalake.evolvedSegments(spark, root)
    assert(segs.map(_.version) === Seq("3", "2", "1"), "newest → oldest")
    assert(segs.map(_.spec) === Seq(Nil, Seq("day"), Seq("event_type")))
    // the union is exactly the source table — nothing dropped or doubled
    assert(Datalake.readEvolved(spark, root).count() === e.count())
    // v1's files were NOT touched by the later evolutions (zero rewrite)
    val v1After = new java.io.File(s"$root/v=1/add").listFiles()
      .filter(_.isDirectory).map(_.lastModified()).toSeq
    assert(v1After === v1Files, "pre-evolution segment is immutable")
    // pruning: the day-spec segment admits one dir's file; others full
    val day = e.filter(col("event_id") % 3 === 2)
      .select(min(col("day")).cast("string")).collect()(0).getString(0)
    val scans = Datalake.evolvedPrunedScan(spark, root, "day", day)
    val byV = scans.map(s => s.segment.version -> s).toMap
    assert(byV("2").filesScanned === 1L && byV("2").filesTotal > 1L)
    assert(byV("1").filesScanned === byV("1").filesTotal,
      "pre-evolution layout honestly full-scans")
    assert(byV("3").filesScanned === byV("3").filesTotal)
  }

  test("evolved read refuses a plain-published table (no silent empty)") {
    import graft.sources.{Datalake, Tables}
    val root = java.nio.file.Files
      .createTempDirectory("graft-evolve-plain").toString + "/t"
    Datalake.publish(Tables.nation(spark, sfDir), root, "1")
    val ex = intercept[IllegalStateException] {
      Datalake.evolvedSegments(spark, root)
    }
    assert(ex.getMessage.contains("not an evolved segment"))
  }

  test("stream hll == batch hll bit-for-bit (register max is idempotent)") {
    val streamed = StreamQueries.qStreamHll(spark, sfDir).collect()
    val batch = Relational.qHllDistinct(spark, sfDir).collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getString(0) === b.getString(0))
      assert(s.getDouble(3) === b.getDouble(3),
        s"${s.getString(0)}: stream estimate == batch estimate exactly")
      assert(s.getString(4) === b.getString(4), "same estimator regime")
    }
  }
}
