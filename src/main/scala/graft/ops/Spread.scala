package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive spread for CPU-bound kernel scans (optimization guide
  * §2.5, "input skew: one huge unsplittable file … repartition immediately
  * after the read").
  *
  * The engine's heavy per-row kernels (JDK codec decode/demux in
  * ops.Multimodal, the md5 sketching chains) run INSIDE the scan stage —
  * zero shuffle by design. That is the right 100 TB shape (a large input is
  * thousands of parquet splits, so the scan stage is already as wide as the
  * cluster), but when the input arrives as a handful of unsplittable files
  * the same plan serializes the whole kernel onto as many cores as there
  * are files: the sf0.1 bench tables are ONE parquet file each, so every
  * decode pass ran on 1 of 32 cores (measured: q_image_thumbnail 5.38s /
  * q_video_frames 5.14s at sf0.1, ≥95% of it the single-task decode stage).
  *
  * `cpuBound` widens the scan ONLY when it is narrower than the session's
  * parallelism: one round-robin exchange of the payload rows, paid exactly
  * in the degenerate case and a no-op (plan-identical) when the scan is
  * already wide — the partitioning derives from the input's actual split
  * count, never from a constant tuned for local mode or for the cluster.
  * Correctness is unaffected: every consumer is a per-row map (decode,
  * hash) followed by key-partitioned aggregation/ordering, so row placement
  * is invisible in the result.
  */
object Spread {

  /** Widen `df` to the session's default parallelism iff its current plan
    * would execute narrower — e.g. a scan over fewer unsplittable files
    * than the box has cores. No-op (returns `df` unchanged, zero plan
    * delta) when the input is already at least that wide.
    *
    * CONTRACT (r18 ADVICE #1): `df` must be a BATCH LEAF SCAN — a bare
    * file-source read, optionally with per-row projections/filters, with
    * no Exchange anywhere in its plan. The width probe builds `df.rdd`,
    * which (a) throws AnalysisException on a streaming frame and (b) on
    * an AQE plan CONTAINING exchanges would materialize every upstream
    * query stage at plan-construction time and then discard the result
    * (repartition() re-plans from the logical plan). Both are guarded
    * here: streaming is rejected up front, and an exchange-bearing plan
    * fails loudly instead of silently running its subtree twice. Callers
    * with derived inputs should widen the LEAF scans before deriving.
    */
  def cpuBound(df: DataFrame): DataFrame = {
    require(!df.isStreaming,
      "Spread.cpuBound: streaming frame — the width probe (df.rdd) " +
        "throws on streams; widen the batch leaf scan instead")
    // the optimized LOGICAL plan is enough to see a shuffle coming:
    // joins, aggregates, repartitions and windows all force exchanges
    import org.apache.spark.sql.catalyst.plans.logical._
    val shuffling = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: RepartitionOperation | _: Window |
           _: Sort | _: Distinct | _: Deduplicate => true
      case _ => false
    }
    require(!shuffling,
      "Spread.cpuBound: plan is not a leaf scan (join/aggregate/" +
        "repartition/window in lineage) — the width probe would " +
        "materialize upstream query stages just to read a partition " +
        "count (leaf-scan-only contract, r18 ADVICE)")
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planning-only probe: building the RDD resolves the scan's split
    // count without running a job (safe by the leaf-scan contract above)
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
