package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vectors._

/** Product quantization — the 100 TB ANN index format: each vector is
  * stored as M one-byte sub-codes (64-dim float32 = 256 B → 8 B at M=8:
  * 32x compression), and query-time scoring is M table LOOKUPS per corpus
  * row (asymmetric distance computation) instead of a float loop.
  *
  * Spark-native shapes:
  *  - TRAIN: per-subspace Lloyd where every iteration is one map-side
  *    assignment pass (codegen'd L2 against inlined centroids) plus ONE
  *    groupBy (subspace, cell) shuffle of per-dimension partial sums; only
  *    the M·ksub·subdim codebook matrix ever reaches the driver, so the
  *    same loop trains on any corpus size.
  *  - ENCODE: pure projection (PqEncode codegen expression) — applied once
  *    at write time; the encoded corpus is what gets stored/scanned.
  *  - SEARCH: queries precompute their M·ksub lookup table once (PqLut),
  *    the table is broadcast with the query set, and the corpus scan costs
  *    M byte-indexed lookups per row (PqAdc) feeding the bounded-heap
  *    top-k. No shuffle of corpus rows; the only moved data is k results
  *    per query per partition.
  */
object Pq {

  /** Driver-held codebook model: `flat` is m-major [m][k][subdim]. */
  case class PqModel(m: Int, ksub: Int, dim: Int, flat: Array[Float]) {
    def sub: Int = dim / m
    def centroid(mi: Int, k: Int): Array[Float] = {
      val base = (mi * ksub + k) * sub
      java.util.Arrays.copyOfRange(flat, base, base + sub)
    }
  }

  /** All-subspace cell assignment in ONE expression: PqEncode carries the
    * codebook as a codegen reference object, so the generated code is a
    * single static call — inlining ksub literal arrays per subspace
    * (m·ksub codegen'd L2 expressions) blows generated methods past
    * janino's limits and falls back to interpreted.
    */
  private def codesCol(emb: Column, model: PqModel): Column =
    org.apache.spark.sql.graft.VectorColumns.pqEncode(
      emb, model.flat, model.m, model.ksub)

  /** Byte `mi` of a binary codes column as INT (hex round-trip — training
    * only, never on the serving path).
    */
  private def byteAt(codes: Column, mi: Int): Column =
    conv(hex(substring(codes, mi + 1, 1)), 16, 10).cast("int")

  /** Train per-subspace codebooks with `iters` Lloyd iterations. Init is a
    * deterministic hash-sample of the corpus (ksub vectors, sliced per
    * subspace). Each iteration: map-side assignment for all M subspaces in
    * one projection, explode to (subspace, cell, subvector), ONE grouped
    * aggregation of per-dimension means. Empty cells keep their centroid.
    */
  def train(corpus: DataFrame, emb: Column, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): PqModel = {
    val first = corpus.select(emb.as("e")).limit(1).collect()
    require(first.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = first.head.getSeq[Float](0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val init: Array[Array[Float]] = corpus
      .orderBy(hash(emb), emb.getItem(0))
      .limit(ksub)
      .select(emb.as("e")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(init.length == ksub, s"corpus smaller than ksub=$ksub")
    val flat = new Array[Float](m * ksub * sub)
    for (mi <- 0 until m; k <- 0 until ksub; d <- 0 until sub)
      flat((mi * ksub + k) * sub + d) = init(k)(mi * sub + d)
    var model = PqModel(m, ksub, dim, flat)

    var it = 0
    while (it < iters) {
      val slices = array((0 until m).map { mi =>
        struct(lit(mi).as("mi"), byteAt(col("__codes"), mi).as("cell"),
          slice(emb, mi * sub + 1, sub).as("sv"))
      }: _*)
      val dims = (0 until sub).map(d =>
        avg(col("s.sv").getItem(d)).as(s"d$d"))
      val means = corpus
        .withColumn("__codes", codesCol(emb, model))
        .select(explode(slices).as("s"))
        .groupBy(col("s.mi").as("mi"), col("s.cell").as("cell"))
        .agg(dims.head, dims.tail: _*)
        .collect()
      val next = model.flat.clone()
      means.foreach { r =>
        val mi = r.getAs[Int]("mi")
        val cell = r.getAs[Int]("cell")
        val base = (mi * ksub + cell) * sub
        var d = 0
        while (d < sub) {
          next(base + d) = r.getAs[Double](s"d$d").toFloat
          d += 1
        }
      }
      model = PqModel(m, ksub, dim, next)
      it += 1
    }
    model
  }

  /** Encode the corpus for storage: `pq_codes` is M bytes per vector. */
  def encodeCorpus(corpus: DataFrame, emb: Column, model: PqModel): DataFrame =
    corpus.withColumn("pq_codes",
      org.apache.spark.sql.graft.VectorColumns.pqEncode(
        emb, model.flat, model.m, model.ksub))

  /** The ONE exact-rerank tail every two-stage search ends in: the
    * (query_id, neighbor_id) shortlist fetches its full vectors — |Q|·
    * shortlist point lookups, never a second corpus scan — and the
    * bounded-heap top-k reranks on exact L2. One definition so the three
    * callers (whole-corpus PQ, raw IVF+PQ, residual IVF+PQ) cannot drift
    * on tie-breaks or broadcast shape.
    */
  private def rerankExact(short: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int): DataFrame =
    Similarity.topkServe(
      short.join(corpus.select(col("id"), col("emb")),
          short("neighbor_id") === col("id"))
        .join(broadcast(queries), "query_id"),
      -l2Dist(col("q_emb"), col("emb")), k)

  /** Two-stage production search: PQ-ADC generates a `shortlist` of
    * candidates from the compressed codes (cheap, coarse — on
    * cluster-free random vectors ADC alone ranks poorly), then ONLY the
    * shortlist rows fetch their full vectors for an exact L2 rerank.
    * At 100 TB the full-precision reads are |Q|·shortlist point lookups,
    * not a scan; recall@k equals ADC's recall@shortlist.
    */
  def searchPqRerank(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      model: PqModel, k: Int, shortlist: Int = 64): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k): the rerank can only " +
        "return candidates the ADC stage produced")
    rerankExact(
      searchPq(encoded, queries, model, shortlist)
        .select(col("query_id"), col("neighbor_id")),
      corpus, queries, k)
  }

  /** The composed production serving index: IVF coarse cells OVER PQ codes
    * (IVFADC, Jégou et al. 2011, "Product quantization for nearest
    * neighbor search" §IV) — what a real 100 TB ANN deployment stores and
    * scans. The stored index row is (id, cell, M-byte code): the coarse
    * cell bounds WHICH rows a query touches (~nProbe/nCells of the
    * corpus), the PQ code bounds what each touched row COSTS (M byte
    * lookups, no float read), and only the ADC shortlist ever fetches its
    * full-precision vector for the exact rerank.
    *
    * Plan shape: cell assignment + PQ encode are one map-side projection
    * (what the ingest job writes); queries probe top-nProbe cells and
    * carry their precomputed LUT in the broadcast; the within-cell ADC
    * scan feeds the bounded-heap top-`shortlist`; the rerank is
    * |Q|·shortlist point lookups joined back to the float store — never a
    * second corpus scan.
    */
  def searchIvfPq(corpus: DataFrame, queries: DataFrame,
      cents: Array[Array[Float]], model: PqModel, k: Int, nProbe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k): the rerank can only " +
        "return candidates the ADC stage produced")
    val vc = org.apache.spark.sql.graft.VectorColumns
    // the stored index: one projection at write time, floats dropped
    val indexed = corpus.select(col("id"),
      vc.ivfCell(col("emb"), cents.flatten, cents.length).as("cell"),
      vc.pqEncode(col("emb"), model.flat, model.m, model.ksub).as("pq_codes"))
    // probes carry the per-query LUT: nProbe rows per query, M·ksub floats
    // each — tiny, broadcast with the query set
    val probes = Similarity.probeCells(queries, cents, nProbe)
      .withColumn("__lut",
        vc.pqLut(col("q_emb"), model.flat, model.m, model.ksub))
      .select(col("query_id"), col("cell"), col("__lut"))
    val short = Similarity.topkServe(
        indexed.join(broadcast(probes), "cell"),
        -vc.pqAdc(col("pq_codes"), col("__lut"), model.ksub), shortlist)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(short, corpus, queries, k)
  }

  /** Residual variant of [[searchIvfPq]] — IVFADC as published (Jégou et
    * al. 2011 §IV.A): the PQ code quantizes the RESIDUAL emb −
    * centroid[cell] instead of the raw vector, centering the codebook's
    * domain on each cell and cutting quantization error. `model` must be
    * trained on the residual column (see
    * SimilarityQueries.qAnnIvfPqResidual).
    *
    * The one structural difference from the raw variant: the query-side
    * LUT is PER PROBED CELL, not per query — the query's residual against
    * cell c (q_emb − centroid[c]) differs per cell, so each probe row
    * carries its own LUT. Still tiny: nProbe rows per query, M·ksub
    * floats each. The residual subtraction is float32 on both engines
    * (zip_with float−float here; FLOAT[] arithmetic in the generated
    * oracle), which is what keeps this path exactly replayable.
    */
  def searchIvfPqResidual(corpus: DataFrame, queries: DataFrame,
      cents: Array[Array[Float]], model: PqModel, k: Int, nProbe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k): the rerank can only " +
        "return candidates the ADC stage produced")
    val vc = org.apache.spark.sql.graft.VectorColumns
    // stored index row: cell id + code of the RESIDUAL, one map-side pass
    // with ONE argmax per row — the residual is taken against the
    // already-computed cell column (ivfResidualAt), not recomputed
    val indexed = corpus
      .withColumn("cell",
        vc.ivfCell(col("emb"), cents.flatten, cents.length))
      .select(col("id"), col("cell"),
        vc.pqEncode(
          vc.ivfResidualAt(col("emb"), col("cell"), cents.flatten),
          model.flat, model.m, model.ksub).as("pq_codes"))
    // per-probe query residual: the probe set is tiny, so the interpreted
    // zip_with costs nothing — and float−float in zip_with is the same
    // IEEE float32 the corpus-side kernel computes
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("cell", "__cent"))
    val probes = Similarity.probeCells(queries, cents, nProbe)
      .join(centDf, "cell")
      .withColumn("__qres",
        zip_with(col("q_emb"), col("__cent"), (a, b) => a - b))
      .withColumn("__lut",
        vc.pqLut(col("__qres"), model.flat, model.m, model.ksub))
      .select(col("query_id"), col("cell"), col("__lut"))
    val short = Similarity.topkServe(
        indexed.join(broadcast(probes), "cell"),
        -vc.pqAdc(col("pq_codes"), col("__lut"), model.ksub), shortlist)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank on the ORIGINAL vectors, same tail as the raw variant
    Similarity.topkServe(
      short.join(corpus.select(col("id"), col("emb")),
          short("neighbor_id") === col("id"))
        .join(broadcast(queries), "query_id"),
      -l2Dist(col("q_emb"), col("emb")), k)
  }

  /** Approximate top-k over a PQ-encoded corpus. `queries` carries
    * (query_id, q_emb); each query's LUT is computed once and broadcast
    * with it, the corpus scan pays M lookups per row.
    */
  def searchPq(encoded: DataFrame, queries: DataFrame, model: PqModel,
      k: Int): DataFrame = {
    val vc = org.apache.spark.sql.graft.VectorColumns
    val q = queries.withColumn("__lut",
      vc.pqLut(col("q_emb"), model.flat, model.m, model.ksub))
    Similarity.topkServe(encoded.crossJoin(broadcast(q)),
      -vc.pqAdc(col("pq_codes"), col("__lut"), model.ksub), k)
  }
}
