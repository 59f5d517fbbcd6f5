package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Graph
import graft.sources.Tables

/** Graph-analytics queries over the star schema. The reference's usage
  * layer aggregates the customer↔supplier trade relation flat
  * (compute_usage.py's groupbys); here the same relation becomes a graph
  * and importance propagates through it — the standard entity-ranking
  * upgrade of a co-occurrence table.
  */
object GraphQueries {

  /** 5 power iterations of PageRank over the bidirected customer–supplier
    * trade graph (an edge per distinct (o_custkey, l_suppkey) trading
    * pair). Node encoding: customer c → 2c, supplier s → 2s+1 — disjoint
    * id spaces, recovered in the output as (kind, entity_key). Suppliers
    * are ~15× fewer than customers, so trade mass concentrates on them:
    * the rank mass per supplier node materially exceeds any customer's.
    */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    // RAW pair stream, duplicates and all — the dedup rides pageRank's
    // own src-keyed repartition partition-locally (dedupEdges=true), so
    // edge construction pays ONE |E| shuffle instead of the old
    // distinct-then-repartition two (r14 verdict #6)
    val e0 = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRank(edges, iters = 5, dedupEdges = true)
      .select(col("node"),
        when(col("node") % 2 === 0, "customer").otherwise("supplier")
          .as("kind"),
        shiftright(col("node"), 1).as("entity_key"),
        col("r").as("pr"))
      .orderBy(col("node"))
  }

  /** BFS hop distances from the lowest-keyed supplier over the bidirected
    * trade graph (round 8) — "how far is every entity from this anchor",
    * the reachability question underneath influence radius, blast-radius
    * and fraud-ring analyses. The graph is bipartite
    * (customer ↔ supplier), so distances alternate parity: suppliers sit
    * at even hops, customers at odd. Source resolved as a bounded
    * 1-value model step; the propagation is ops.Graph.bfsDistances
    * (frontier-only edge join per round, early-converging, checkpointed).
    * Oracle: recursive CTE over the same edge construction — min d per
    * node over paths of ≤ maxHops hops, exact in both engines since hop
    * counts are integers.
    */
  def qBfsDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e0 = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    val srcNode = Tables.supplier(spark, dir)
      .agg(min(col("s_suppkey"))).head().getLong(0) * 2 + 1
    Graph.bfsDistances(edges, Seq(srcNode).toDF("node"), maxHops = 6)
      .select(col("node"),
        when(col("node") % 2 === 0, "customer").otherwise("supplier")
          .as("kind"),
        shiftright(col("node"), 1).as("entity_key"),
        col("dist"))
      .orderBy(col("node"))
  }

  /** Per-part triangle counts over the co-purchase graph. The graph is the
    * scale-robust kNN form of co-occurrence: edge strength = how many
    * orders contain both parts, each part keeps its top-8 strongest
    * partners (ties by partner id), edges canonicalized undirected. The
    * top-8 cap is what survives 1000×: a raw ≥-k-co-occurrences threshold
    * makes graph density scale with the corpus, while top-8 bounds degree
    * (≤ 16 after the union) and hence triangle work at ANY data size.
    * Pair enumeration itself is bounded: orders hold ≤ a handful of
    * parts, so the per-order self-join fans out C(lines,2), not n².
    */
  def qTriangleCount(spark: SparkSession, dir: String): DataFrame = {
    // pair enumeration WITHOUT a self-join: one shuffle by order collects
    // each order's distinct part set (orders hold a handful of lines, so
    // the set is tiny and collect_set's dedup replaces a separate
    // distinct exchange), then the ordered pairs explode map-side —
    // per-order C(parts,2) fan-out, bounded by order size at any SF
    Graph.triangleCounts(copurchaseEdges(spark, Tables.lineitem(spark, dir)))
      .orderBy(col("node"))
  }

  /** The degree-bounded co-purchase edge construction behind
    * qTriangleCount, factored out so ScalingBench can measure its
    * triangle mass on the 5× replica corpus with the same plan.
    */
  private[graft] def copurchaseEdges(spark: SparkSession,
      lineitem: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pairs = lineitem
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("u"), col("ps"))
      .select(col("u"), explode(col("ps")).as("v"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("w"))
    // top-8 via the bounded-heap aggregate, NOT a window: partial buffers
    // cap at 8 entries per u per partition, so the exchange carries
    // 8·partitions rows per node instead of sorting the full O(pairs)
    // candidate mass (the count fits a double exactly — ≤ 2^53; heap
    // tie-break is (w desc, v asc), identical to the oracle's row_number)
    pairs
      .groupBy(col("u"))
      .agg(graft.functions.vectors.topk(col("w").cast("double"), col("v"), 8)
        .as("tk"))
      .select(col("u"), explode(col("tk")).as("e"))
      .select(least(col("u"), col("e.id")).as("u"),
        greatest(col("u"), col("e.id")).as("v"))
      .distinct()
  }

  /** k-CORE DECOMPOSITION (round 16 — the graph-robustness peel every
    * abuse/community pipeline runs: the maximal subgraph where every
    * node keeps degree ≥ k, found by repeatedly deleting under-degree
    * nodes). Runs the classic synchronous peel over the REPEAT
    * co-purchase graph (pairs bought together in ≥2 orders — the
    * weight threshold gives the natural heavy-tailed degree variance
    * the fixed top-8 graph lacks, so the peel actually peels): per
    * round ONE degree aggregate over the
    * surviving edges + two semi-joins against the ≥k node set, each
    * round checkpointed (the qBomRollup lineage discipline) — no
    * all-pairs anything, per-round cost O(|E_surviving|). The loop
    * stops at the FIXPOINT (a round that deletes nothing) with a hard
    * 16-round cap that fails loudly rather than emitting a half-peeled
    * graph; the oracle unrolls a fixed 16 rounds — peeling a converged
    * core is the identity, so early convergence and the fixed unroll
    * agree by construction.
    *
    * Output = the 2-core's nodes with their in-core degree: a node
    * wrongly kept, dropped, or with a stale degree all hash-fail.
    */
  def qKcore(spark: SparkSession, dir: String, k: Int = 2): DataFrame = {
    import graft.ops.Checkpoints
    val und = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("u"), col("ps"))
      .select(col("u"), explode(col("ps")).as("v"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select(col("u"), col("v"))
    // Action floor (r18 optimization — the bfsDistances discipline): each
    // peel round pays exactly ONE job — the survivor count rides the
    // round's checkpoint action as an `observe`d metric instead of a
    // separate count() job. The loop runs under ops.Fixpoint's scope (r19):
    // AQE off (every round's stage shape is KNOWN: checkpointed edges →
    // degree agg → two keyed semi-joins — adaptive re-planning can only
    // fragment it into extra per-stage jobs) AND the shuffle width derived
    // from the surviving edge mass (2|E| degree rows per round), so a
    // node-sized peel stops paying cluster-width empty-task overhead per
    // stage per round. Construction stays under AQE for the scan-side
    // broadcast planning, materialized by the count below.
    var edges = Checkpoints.checkpoint(und)
    var nEdges = edges.count()
    var converged = false
    var rounds = 0
    graft.ops.Fixpoint.withLoopConf(spark,
        graft.ops.Fixpoint.widthFor(spark, 2L * nEdges)) {
      while (rounds < 16 && !converged) {
        rounds += 1
        val deg = edges.select(col("u").as("n"))
          .unionAll(edges.select(col("v").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("d"))
        val keep = deg.filter(col("d") >= k).select(col("n"))
        val pruned = edges
          .join(keep.withColumnRenamed("n", "u").hint("shuffle_hash"),
            Seq("u"), "leftsemi")
          .join(keep.withColumnRenamed("n", "v").hint("shuffle_hash"),
            Seq("v"), "leftsemi")
          .select(col("u"), col("v"))
        val obs = org.apache.spark.sql.Observation()
        val next = Checkpoints.checkpoint(
          pruned.observe(obs, count(lit(1)).as("n")))
        // harvested from the checkpoint's own action — no second job
        val nNext = obs.get("n").asInstanceOf[Long]
        Checkpoints.release(edges)
        edges = next
        converged = nNext == nEdges
        nEdges = nNext
      }
    }
    if (!converged) {
      // release the tail checkpoint before dying — without this the
      // throw path leaks the final localCheckpoint's blocks until
      // ContextCleaner GC (r16 ADVICE)
      Checkpoints.release(edges)
      throw new IllegalStateException(
        "qKcore: peel did not reach a fixpoint within 16 rounds — raise " +
          "the bound instead of trusting a half-peeled core")
    }
    // the converged `edges` checkpoint is NOT released here by design:
    // the returned frame reads it lazily, so an eager release would pull
    // the blocks out from under the caller — the blocks live until the
    // frame is consumed and ContextCleaner collects them
    edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
      .orderBy(col("node"))
  }

  /** HIERARCHY ROLL-UP via POINTER DOUBLING (round 15c — the
    * bill-of-materials explosion every manufacturing/ops warehouse
    * runs: "how many units of each part does one unit of its root
    * assembly need?", the multiplied-quantity path aggregate a flat
    * groupBy cannot express). Synthetic 4-ary hierarchy over part:
    * parent(p) = p div 4 (roots are p ≤ 3), per-edge quantity
    * qty(p) = p mod 3 + 1 — deterministic, so the DuckDB recursive CTE
    * replays it exactly in bounded integer arithmetic.
    *
    * THE SCALE POINT: the naive walk is one self-join per LEVEL
    * (O(depth) shuffles); this runs POINTER DOUBLING — every node
    * carries (ancestor, path product, path length) and each round joins
    * the state with ITSELF, composing jumps: after k rounds every node
    * has jumped 2^k edges. Five rounds close ANY hierarchy up to depth
    * 32 — at 100 TB that is 5 shuffles where the per-level walk pays 32,
    * and the state never exceeds one row per node. Round-local plans are
    * checkpointed so the self-join tree doesn't compound.
    *
    * Exactness: quantities are exact longs (products ≤ 3^32 overflow?
    * no — depth here ≤ 8, product ≤ 3^8 = 6561; the CTE and the engine
    * agree in exact BIGINT), sums exact.
    */
  def qBomRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Checkpoints
    val parts = Tables.part(spark, dir).select(col("p_partkey").as("node"))
    // initial state: one step up (or self for roots)
    var state = parts.select(col("node"),
      when(col("node") >= 4, expr("node div 4")).otherwise(col("node"))
        .as("cur"),
      when(col("node") >= 4, col("node") % 3 + 1).otherwise(lit(1L))
        .cast("long").as("prod"),
      when(col("node") >= 4, 1L).otherwise(0L).as("depth"))
    var cp = Checkpoints.checkpoint(state)
    state = cp
    for (_ <- 1 to 5) {
      val t = state.select(col("node").as("t_node"), col("cur").as("t_cur"),
        col("prod").as("t_prod"), col("depth").as("t_depth"))
      val next = state.join(t.hint("shuffle_hash"),
          state("cur") === t("t_node"), "left")
        .select(col("node"),
          when(col("cur") >= 4, col("t_cur")).otherwise(col("cur"))
            .as("cur"),
          when(col("cur") >= 4, col("prod") * col("t_prod"))
            .otherwise(col("prod")).as("prod"),
          when(col("cur") >= 4, col("depth") + col("t_depth"))
            .otherwise(col("depth")).as("depth"))
      val nextCp = Checkpoints.checkpoint(next)
      Checkpoints.release(cp)
      cp = nextCp
      state = nextCp
    }
    // convergence gate: 5 doubling rounds close depth ≤ 32; a deeper
    // hierarchy would silently emit non-root `cur` values as roots, so
    // assert reachability loudly (one cheap count over the checkpointed
    // state — roots are keys ≤ 3 by construction)
    val unconverged = state.filter(col("cur") >= 4).count()
    if (unconverged > 0) throw new IllegalStateException(
      s"qBomRollup: $unconverged nodes did not reach a root after 5 " +
        "pointer-doubling rounds (hierarchy deeper than 32 levels) — " +
        "raise the round count instead of trusting these as roots")
    val res = Checkpoints.checkpoint(state
      .groupBy(col("cur").as("root"), col("depth"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("prod")).cast("bigint").as("total_units"))
      .orderBy(col("root"), col("depth")))
    Checkpoints.release(cp)
    res
  }
}
