package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.sources.Tables
import graft.streaming.EventStreams.Event

/** Bounded replay harness: runs a REAL Structured Streaming query (file
  * source → stateful fold → file sink, `Trigger.AvailableNow`) over the
  * batch `events` table INSIDE a registered query, so the streaming
  * changelog operators get driver-checkable correctness rows against the
  * SAME DuckDB oracles as their batch twins — the reference's hourly
  * Airflow poll (dags/DAG_Project.py:18-26, lbc_fetcher.py's state file)
  * re-run as the idempotent backfill pattern.
  *
  * Replay contract — why this reproduces the batch answer EXACTLY:
  *  - The feed is the events table written as `chunks` range-partitioned
  *    parquet files on (ts, event_id), with strictly increasing file
  *    modification times in range order. The file source (sorted by
  *    modtime, `maxFilesPerTrigger=1`) therefore replays in event-time
  *    order with file-level granularity: WITHIN a micro-batch order is
  *    arbitrary (the folds sort their ripe slice), and ACROSS batches
  *    nothing ever arrives behind the watermark (batch N's minimum ts ≥
  *    batch N−1's maximum by the range bounds), so the late-event filter
  *    provably drops nothing. This is the contract a production feed
  *    (Kafka, landing files) is ASSUMED to satisfy; the harness
  *    manufactures it from data at rest.
  *  - Two far-future sentinel files (user_id = −1, ts = max+3d and
  *    max+6d) land LAST, each its own micro-batch. During the second
  *    sentinel's DATA batch the watermark is already sentinel-1 − delay —
  *    past every real day's end — so every buffered key's event-time
  *    timeout has expired and Spark folds it in that same trigger: the
  *    flush is deterministic and does not depend on trailing no-data
  *    batches. Callers filter `user_id >= 0` to drop sentinel output.
  *
  * Scale notes: staging is one distributed range-shuffle write; the
  * stream itself is the production plan (per-key state in the state
  * store, one shuffle on user_id per batch). `maxFilesPerTrigger=1`
  * serializes batches — that is the point (bounded-backlog backfill, the
  * CorpusStreams discipline), and each batch is internally parallel. At
  * 100 TB the same query runs off the live landing dir with the staging
  * step deleted.
  */
object StreamReplay {

  // The returned DataFrame reads the staged sink LAZILY, so the temp tree
  // must outlive this call — repeated invocations in one JVM (bench passes,
  // the spec suite) would otherwise accumulate feeds forever. One shutdown
  // hook reaps every root this JVM created.
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  /** Register a replay temp tree for deletion at JVM exit (shared by the
    * other replay-style queries, e.g. the CMS store replay). */
  def track(root: Path): Unit = { reaper; roots.add(root) }

  private lazy val reaper: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      roots.forEach { r =>
        try {
          import scala.jdk.CollectionConverters._
          val walk = Files.walk(r)
          try walk.iterator().asScala.toSeq.reverse.foreach(p =>
            try Files.deleteIfExists(p) catch { case _: Exception => () })
          finally walk.close()
        } catch { case _: Exception => () }
      }
    }))

  /** Stage `events(dir)` as an event-time-ordered feed, run `op` over it
    * as a stream to completion, and return the materialized output
    * (sentinel rows still present — filter `user_id >= 0`).
    */
  /* chunks default: 2 data chunks + 2 sentinels = 4 serialized
   * micro-batches. Cross-batch state carry-over is exercised from 2
   * chunks on (and larger chunks carry MORE within-batch disorder for
   * the buffer-sorts to fix); each extra micro-batch costs a ~0.6s
   * listing+state-commit+sink-commit floor regardless of data size, so
   * the registered rows keep the count low. */
  // Staged-feed memo: eleven registered rows replay the SAME events table
  // with the same chunking, and the feed is read-only input (every query
  // keeps its own sink + checkpoint), so staging once per (dir, chunks)
  // per JVM is sound and removes a repeated range-shuffle write + modtime
  // dance from every bench pass and the driver's Verify loop.
  private val feeds =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  def replayEvents[O](spark: SparkSession, dir: String, chunks: Int = 2)(
      op: Dataset[Event] => Dataset[O]): DataFrame = {
    val feed = feeds.computeIfAbsent((dir, chunks), _ =>
      stageFeed(spark, dir, chunks))
    val root = Files.createTempDirectory("graft-replay")
    track(root)
    // The stream runs on a SUB-SESSION with a smaller shuffle width: a
    // stateful micro-batch pays per-partition state-store open/commit on
    // EVERY batch (4 serialized batches at the default chunks=2), and at
    // 32 partitions that is ~128 state commits for node-sized state — 8
    // partitions cuts it 4× with the same semantics (state is keyed;
    // width only shards it). The caller's session and conf are untouched;
    // the production form of this knob is
    // spark.sql.streaming.statefulOperator.* sizing on the live job.
    val sq = spark.newSession()
    sq.conf.set("spark.sql.shuffle.partitions", "8")
    import sq.implicits._
    val stream = sq.readStream.schema(implicitly[
        org.apache.spark.sql.Encoder[Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(feed)
      .as[Event]
    val out = root.resolve("out").toString
    val q = op(stream).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", root.resolve("ck").toString)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  /** One-time staging of `events(dir)` as the modtime-ordered chunked
    * feed + the two sentinel files (see the replay contract above).
    */
  private def stageFeed(spark: SparkSession, dir: String,
      chunks: Int): String = {
    import spark.implicits._
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"))
    val root = Files.createTempDirectory("graft-replay-feed")
    track(root)
    val feed = root.resolve("feed").toString
    // ONE range-shuffle pass stages the feed; the sentinel timestamps
    // come from a max() over the staged files (footer-stat cheap), not a
    // second scan of the source table.
    src.repartitionByRange(chunks, col("ts"), col("event_id"))
      .write.parquet(feed)
    val maxTs = spark.read.parquet(feed).agg(max(col("ts")))
      .head.getTimestamp(0)
    val parts = listParts(Paths.get(feed))
    val base = (System.currentTimeMillis() / 2000L) * 2000L - 7200000L
    parts.zipWithIndex.foreach { case (p, i) =>
      p.toFile.setLastModified(base + i * 2000L)
    }
    Seq(3L, 6L).zipWithIndex.foreach { case (days, i) =>
      val sDir = root.resolve(s"s$i")
      spark.createDataset(Seq(Event(Long.MaxValue - i,
          new java.sql.Timestamp(maxTs.getTime + days * 86400000L),
          -1L, "view", 0.0)))
        .coalesce(1).write.parquet(sDir.toString)
      val part = listParts(sDir).head
      val dst = Paths.get(feed, s"zz-sentinel-$i.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(base + (parts.length + i) * 2000L)
    }
    feed
  }

  private def listParts(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith("part-"))
        .sortBy(_.getFileName.toString)
    } finally s.close()
  }
}
