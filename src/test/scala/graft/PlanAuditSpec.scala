package graft

import org.apache.spark.sql.DataFrame
import graft.queries.{Relational, SimilarityQueries, TextQueries}

/** Plan-shape audit: the properties that make these queries survive a 100 TB
  * scale-up — scans pruned to the needed columns, filters pushed to parquet,
  * dimension joins broadcast, no accidental cartesian products.
  */
class PlanAuditSpec extends SparkSpecBase {

  private def executed(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q3/q5/market_stats/doc_export broadcast every dimension join") {
    Seq[DataFrame](
      Relational.q3TopOrders(spark, sfDir),
      Relational.q5RegionRevenue(spark, sfDir),
      Relational.qMarketStats(spark, sfDir),
      Relational.qDocExport(spark, sfDir)
    ).foreach { df =>
      val plan = executed(df)
      assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"dim join fell back to sort-merge:\n$plan")
    }
  }

  test("no query plans a CartesianProduct (knn uses broadcast nested loop)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian:\n$plan")
    }
  }

  test("feature extract scan reads only the projected columns") {
    val plan = executed(Relational.qFeatureExtract(spark, sfDir))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey") && readSchema.contains("p_size"))
    assert(!readSchema.contains("p_comment") && !readSchema.contains("p_container"),
      s"scan reads pruned columns: $readSchema")
  }

  test("fingerprint scan prunes the documents payload columns") {
    val plan = executed(TextQueries.qFingerprint(spark, sfDir))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang"), s"unused column read: $readSchema")
  }

  test("range join plans an equi-join, never a nested loop") {
    val plan = graft.queries.EventQueries.qRangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("Join"), "bucketized range join still joins")
  }

  test("global sequence packing never plans an unpartitioned window") {
    // Spark's unpartitioned WindowExec moves every row to ONE task — the
    // round-1 scale-killer. The two-phase cumulative sum must only emit
    // windows partitioned by the bucket column.
    val df = TextQueries.qPackSequences(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "packing should still use a window for the per-bucket cumsum")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window (single-task cumsum) in packing plan:\n$w")
    }
  }

  test("similarity sketch queries keep their single shuffle per side") {
    // buckets self-join: explode → one hash-partition exchange per side (the
    // sketch/bucket shape), never a range/cartesian fallback
    val plan = SimilarityQueries.qMinhashNearDup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
