package graft.sources

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-ingest watermark state — the reference's `state/lbc_state
  * .json` last-fetched marker (lbc_fetcher.py) as a tiny state file beside
  * the data, read/written through the Hadoop FileSystem API so the same
  * code works on local disk, HDFS, or an object store.
  *
  * Protocol: `incrementalRead` filters rows strictly newer than the stored
  * watermark (a pushed-down predicate — with time-partitioned data it
  * becomes partition pruning, so each increment reads only new partitions);
  * after processing, `commit` advances the watermark to the batch's max
  * timestamp. Crash between read and commit → the next run re-reads the
  * same increment: at-least-once, idempotent when the sink dedups (e.g.
  * dedup-keep-last downstream, exactly the reference's pairing).
  */
object Watermark {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def read(spark: SparkSession, statePath: String): Option[Timestamp] = {
    val p = new Path(statePath)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = in.readAllBytes()
        val s = new String(bytes, StandardCharsets.UTF_8).trim
        if (s.isEmpty) None else Some(Timestamp.valueOf(s))
      } finally in.close()
    }
  }

  def write(spark: SparkSession, statePath: String, ts: Timestamp): Unit = {
    val p = new Path(statePath)
    val f = fs(spark, p)
    val out = f.create(p, true)
    try out.write(ts.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Rows of `df` strictly newer than the stored watermark (everything on
    * first run).
    */
  def incrementalRead(spark: SparkSession, df: DataFrame, tsCol: String,
      statePath: String): DataFrame =
    read(spark, statePath) match {
      case Some(w) => df.filter(col(tsCol) > lit(w))
      case None => df
    }

  /** Advance the watermark to the batch's max timestamp (no-op on an empty
    * batch). One tiny aggregate — the only driver-side data is a single
    * timestamp.
    */
  def commit(spark: SparkSession, batch: DataFrame, tsCol: String,
      statePath: String): Unit = {
    val mx = batch.agg(max(col(tsCol))).head()
    if (!mx.isNullAt(0))
      write(spark, statePath, mx.getTimestamp(0))
  }
}
