package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.TextAnalysis

/** Streaming corpus ingestion — the continuous form of the cleaning
  * pipeline: documents land as files (the reference's per-fetch raw drops),
  * are rate-limited into bounded micro-batches, cleaned statelessly, and
  * handed to a sink.
  *
  * Scale notes:
  *  - `maxFilesPerTrigger` bounds micro-batch size, so a 100 TB backlog
  *    replays in controlled chunks instead of one giant batch that OOMs
  *    the first trigger; with Trigger.AvailableNow the same bounded batches
  *    drain the backlog and then STOP — the idempotent backfill pattern.
  *  - [[cleanDocs]] is a pure projection+filter: no state, no shuffle, so
  *    streaming throughput is scan-bound and append-mode safe at any rate.
  *    Cross-batch exact dedup deliberately stays OUT of this stage — dedup
  *    state over an unbounded corpus grows without a watermark; it belongs
  *    to the batch layer (q_dedup_exact) or a watermarked key-state op
  *    (EventStreams.dedupEvents) when event time exists.
  */
object CorpusStreams {

  /** Rate-limited file-source document stream. */
  def readDocFiles(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)

  /** Stateless streaming clean: the same scan-side signals as the batch
    * funnel (language ID, quality score, normal-form fingerprint), keeping
    * English docs above the quality bar. Identical thresholds to
    * TextQueries.qCorpusFunnel so batch and stream agree on what "clean"
    * means.
    */
  def cleanDocs(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        TextAnalysis.langPredict(col("text")).as("pred_lang"),
        TextAnalysis.qualityScore(TextAnalysis.wsTokenCount(col("text")),
          TextAnalysis.punctCount(col("text")).cast("double") / length(col("text")),
          TextAnalysis.langScore(col("text"), "en").cast("double") /
            TextAnalysis.wsTokenCount(col("text"))).as("quality"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .filter(col("pred_lang") === "en" && col("quality") >= 0.5)
}
