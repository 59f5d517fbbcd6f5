package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.queries.DatalakeQueries
import graft.sources.Datalake

/** The composed DAG's CONTINUOUS form: the reference schedules the whole
  * raw→formatted→usage chain hourly on Airflow (DAG_Project.py:26-29,
  * `schedule='0 * * * *'`); here the same chain runs as a Structured
  * Streaming micro-batch job — each raw fetch file that lands becomes an
  * increment, with no scheduler in the loop.
  *
  * Division of labor per trigger (foreachBatch):
  *   - the INCREMENT is coerced (same shared projection as the batch DAG —
  *     DatalakeQueries.coerceRaw, so batch and stream agree on "formatted")
  *     and APPENDED to the formatted layer: the formatted layer is an
  *     append-only log of increments;
  *   - the usage aggregate is recomputed over the whole formatted layer
  *     with the keep-last dedup applied AT READ — cross-batch dedup state
  *     inside the stream would grow without bound (the CorpusStreams
  *     caveat); dedup-at-read over the log needs no state at all.
  * Checkpointing makes the append at-least-once across restarts; replayed
  * increments are absorbed by the same read-time dedup, so usage is
  * exactly-once in effect.
  *
  * Scale notes: maxFilesPerTrigger bounds each increment (a 100 TB raw
  * backlog drains in controlled chunks; Trigger.AvailableNow turns the
  * same job into a bounded backfill that stops when caught up). The
  * usage recompute reads the full formatted layer per trigger — the right
  * trade while usage ≪ raw; an incremental-usage variant would partition
  * the layer by event_date and overwrite only the dates present in the
  * increment (Datalake.upsertPartitions).
  */
object DatalakeStreams {

  val rawSchema: StructType = DatalakeQueries.rawSchema

  /** Rate-limited JSONL raw-fetch stream (one file = one fetch drop). */
  def readRawStream(spark: SparkSession, bulkDir: String,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(bulkDir)

  /** Run the micro-batch DAG until the raw backlog is drained
    * (Trigger.AvailableNow): append formatted increments, refresh usage.
    */
  def runBackfill(raw: DataFrame, fmtPath: String, usagePath: String,
      checkpoint: String): StreamingQuery =
    backfill(raw, fmtPath, checkpoint) { (usage, _) =>
      Datalake.writeParquet(usage, usagePath)
    }

  /** The ONE micro-batch DAG body (coerce → append formatted → read-back
    * keep-last dedup → usage aggregate) with the per-epoch usage SINK as
    * the only variation point — runBackfill overwrites a plain path,
    * runPublishingBackfill publishes an epoch-named manifest version.
    * Hand-copying the chain into each variant is how the batch-stream
    * agreement contract desynchronizes silently (review finding): a new
    * coercion step or dedup key added to one body would quietly fork
    * "formatted" semantics between the two.
    */
  private def backfill(raw: DataFrame, fmtPath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (increment: Dataset[Row], batchId: Long) =>
        val spark = increment.sparkSession
        DatalakeQueries.coerceRaw(increment).drop("value")
          .write.mode(SaveMode.Append)
          .option("compression", "snappy").parquet(fmtPath)
        val fmt = DatalakeQueries.dedupKeepLast(spark.read.parquet(fmtPath))
        sink(DatalakeQueries.usageStats(fmt), batchId)
        ()
      }
      .start()

  /** STREAMING → MANIFEST PUBLISH (round-10 verdict #5 — marries the two
    * flagship subsystems): same micro-batch DAG as [[runBackfill]], but
    * every trigger PUBLISHES the refreshed usage aggregate as an atomic
    * manifest version named by the batch epoch. Readers of the published
    * table therefore always resolve a COMPLETE usage snapshot (old epoch
    * or new, never a half-written refresh — runBackfill's plain overwrite
    * has exactly that torn-read window), and the version history is the
    * stream's epoch history: time travel to "usage as of batch N" for
    * free, vacuum retires old epochs.
    *
    * Crash-replay idempotence is BY CONSTRUCTION of the epoch keying: a
    * restarted stream re-runs the last uncommitted batch with the SAME
    * batchId, so it overwrites the same v=<epoch> dir and re-swaps the
    * manifest to the identical target; the formatted-layer append is
    * at-least-once, and replayed raw rows are absorbed by the read-time
    * keep-last dedup before any published aggregate sees them.
    */
  /** CDC APPLY STREAM (round 14): a change feed arrives as micro-batches
    * and each batch lands on the table as ONE committed MERGE —
    * `Datalake.mergeTransact`, so every epoch claims a commit-log record
    * and a concurrent batch writer can't be lost (and vice versa). The
    * replay contract differs from the epoch-publish sink on purpose:
    * a MERGE's effect derives from the table, so idempotence can't come
    * from same-dir overwrite — it comes from the ARMS BEING ABSOLUTE
    * (update SET and insert VALUES carry final values, never base-derived
    * increments; delete is naturally idempotent): re-applying a replayed
    * batch's delta over a table that already absorbed it reproduces the
    * same rows, one version later. A feed whose updates are deltas
    * (`price = price + x`) must NOT ride this sink — that is the
    * documented CDC-consumer rule, not a streaming quirk.
    *
    * Scale: one full-outer shuffle-hash join per epoch (delta build
    * side) — the per-epoch cost a CDC consumer already signed up for;
    * at production rates the file-granularity merge refinement applies
    * unchanged.
    */
  def mergeStream(feed: DataFrame, tableRoot: String, keys: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column],
      checkpoint: String): StreamingQuery =
    feed.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Datalake.mergeTransact(batch.sparkSession, tableRoot,
          batch.toDF(), keys, deleteWhen)
        ()
      }
      .start()

  def runPublishingBackfill(raw: DataFrame, fmtPath: String,
      tableRoot: String, checkpoint: String): StreamingQuery =
    backfill(raw, fmtPath, checkpoint) { (usage, batchId) =>
      // CAS, not plain publish (r13 verdict #4): each epoch claims a
      // commit-log sequence, so a concurrent batch CAS writer to the same
      // table can't orphan a stream epoch with a later manifest swap —
      // and a crash-replayed batchId re-syncs its existing record instead
      // of committing twice (publishEpochCas's replay contract).
      Datalake.publishEpochCas(usage, tableRoot, batchId.toString)
      ()
    }

  /** STREAMING SOURCE FROM A PUBLISHED TABLE (round 15 — r14 verdict
    * #4): every stream above consumes raw file dirs; this is the missing
    * half of the CDC story — CONSUMING the lake. A manifest-aware stream
    * that emits each committed version's change feed as a micro-batch,
    * the Delta streaming-source shape. No custom Source machinery is
    * needed: the `_commits/` log is append-only immutable small files,
    * which is EXACTLY the contract Spark's file source streams over — so
    * the log itself is the stream, and each record row arrives with its
    * sequence (from `_metadata.file_path`) and token (the file body).
    *
    * Per record the emission is SELF-CONTAINED (intra-batch order never
    * matters): sequence 1 emits the initial snapshot as inserts
    * (`_from_version='initial'`, the Delta initial-snapshot convention);
    * sequence N>1 resolves its predecessor's token with one point read
    * and emits `Datalake.changeFeedTokens(prev, cur)` — the
    * token-general diff, so EVERY commit class feeds correctly: a
    * deletion-vector commit materializes as delete rows, a committed
    * MERGE as its arms, a maintenance rewrite as the empty feed. Only
    * `ref=` clone pointers are skipped (their data lives in another
    * table), loudly. A log whose early records were vacuumed before the
    * stream attached still gets an initial snapshot: the earliest live
    * record's resolved state is emitted as inserts (r15 hardening — a
    * mid-stream gap, by contrast, stays a loud skip, never a second
    * "initial").
    *
    * Each micro-batch lands on the SINK via [[Datalake.publishEpochCas]]
    * keyed by batchId — the foreachBatch at-least-once caveat closed by
    * the epoch machinery: a crash-replayed batch republishes the same
    * epoch version instead of double-appending. The full CDC log is the
    * union of the sink's epoch versions ([[Datalake.readVersionsMerged]]).
    *
    * Scale: per-trigger cost is one keyed full-outer join per NEW commit
    * (the CDC consumer's signed-up cost); the log read is catalog-sized.
    */
  /** CDC TABLE REPLICATION end-to-end (round 15 — the composed proof of
    * the lake-as-stream source: not just emitting the feed but APPLYING
    * it): consume the source table's commit log as a stream and fold
    * each commit's change feed into a REPLICA table, in commit order.
    * Sequence 1 publishes the snapshot wholesale; each later commit
    * applies `next = cur ∖ changed-keys ∪ (insert + update_postimage
    * rows)` — the set form of the three CDC arms, and a FIXPOINT under
    * re-application (applying the same feed twice yields the same
    * state).
    *
    * Exactly-once across crash replays is a real hazard here (an
    * at-least-once foreachBatch re-delivery must not re-apply an OLD
    * feed over a NEWER replica state — unlike the epoch-publish sink,
    * apply is order-sensitive), closed with an applied-sequence
    * HIGH-WATER file on the replica (`_REPL_SEQ`, atomic tmp+rename,
    * the manifest discipline): records ≤ the high water are skipped on
    * replay. The replica's version history is `r<source seq>` — an
    * audit trail mapping every replica version to the source commit it
    * mirrors.
    *
    * SNAPSHOT RE-SYNC (r15 hardening — the vacuumed-log hole): when a
    * commit's predecessor record is gone (vacuumCommits swept it before
    * the stream started, or the chain is broken by a clone-pointer
    * commit the replica can't follow), there is no diff base — the
    * first cut SKIPPED the commit and still advanced the high water,
    * silently diverging the replica forever (and a replica that was
    * never bootstrapped would crash the next incremental apply). Now
    * any commit whose predecessor doesn't resolve — including seq 1,
    * which is just the degenerate case — publishes its OWN resolved
    * snapshot wholesale as `r<seq>`: the replica state AT that commit
    * is exactly that snapshot, so the stream converges instead of
    * diverging, at the cost of one table-sized write (what a vacuumed
    * CDC consumer owes anyway; Delta makes you restart the stream by
    * hand in the same situation).
    *
    * Scale: per source commit, one keyed anti-join + union over the
    * replica (the apply) — the CDC consumer's cost; the feed itself is
    * commit-sized, never table-sized, except snapshot (re-)syncs.
    */
  def replicateStream(spark: SparkSession, srcRoot: String,
      keys: Seq[String], replicaRoot: String,
      checkpoint: String): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(s"$srcRoot/_commits")
      .select(col("value"), col("_metadata.file_path").as("_path"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sp = batch.sparkSession
        val log = org.slf4j.LoggerFactory.getLogger(getClass)
        val applied = readHighWater(sp, replicaRoot)
        val recs = batch.collect().toSeq
          .map(r => (r.getString(1).split('/').last.toLong,
            r.getString(0).trim))
          .filter(_._1 > applied)
          .sortBy(_._1)
        recs.foreach { case (seq, token) =>
          if (token.startsWith("ref=")) {
            log.warn(s"replicateStream: commit $seq is a clone pointer " +
              "— skipped (replicate from the clone's source)")
          } else {
            val prev =
              if (seq == 1L) None
              else Datalake.commitTokenSeq(sp, srcRoot, seq - 1)
                .filterNot(_.startsWith("ref="))
            val replicaLive =
              Datalake.currentVersion(sp, replicaRoot).isDefined
            prev match {
              case Some(pt) if replicaLive =>
                val feed = Datalake.changeFeedTokens(sp, srcRoot, pt,
                  token, keys)
                val meta =
                  Seq("_change_type", "_from_version", "_to_version")
                val upserts = feed.filter(col("_change_type")
                    .isin("insert", "update_postimage"))
                  .drop(meta: _*)
                val changed = feed.filter(col("_change_type")
                    .isin("insert", "update_postimage", "delete"))
                  .select(keys.map(col): _*).distinct()
                val cur = Datalake.readPublished(sp, replicaRoot)
                // feed side is commit-sized: hash-join it (hint keeps
                // the anti off SortMergeJoin under any stats)
                val next = cur
                  .join(changed.hint("shuffle_hash"), keys, "left_anti")
                  .unionByName(upserts)
                Datalake.publish(next, replicaRoot, s"r$seq")
              case why =>
                // bootstrap (seq 1), vacuumed-away predecessor, or a
                // replica that was never seeded: the commit's own
                // resolved snapshot IS the correct replica state here
                if (seq != 1L) log.warn(
                  s"replicateStream: no diff base for commit $seq " +
                    s"(predecessor=$why, replicaLive=$replicaLive) — " +
                    "re-syncing from the commit's full snapshot")
                Datalake.publish(Datalake.readToken(sp, srcRoot, token),
                  replicaRoot, s"r$seq")
            }
          }
          writeHighWater(sp, replicaRoot, seq)
        }
        ()
      }
      .start()
  }

  private def readHighWater(spark: SparkSession, replicaRoot: String): Long = {
    val p = new org.apache.hadoop.fs.Path(replicaRoot, "_REPL_SEQ")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), "UTF-8").trim
        finally in.close()
      if (s.nonEmpty && s.forall(_.isDigit)) s.toLong else 0L
    }
  }

  private def writeHighWater(spark: SparkSession, replicaRoot: String,
      seq: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(replicaRoot)
    val fs = root.getFileSystem(conf)
    fs.mkdirs(root)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"._replseq.${java.util.UUID.randomUUID().toString}.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$seq\n".getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
      .rename(tmp, new org.apache.hadoop.fs.Path(root, "_REPL_SEQ"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  def changeFeedStream(spark: SparkSession, tableRoot: String,
      keys: Seq[String], sinkRoot: String,
      checkpoint: String): StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit}
    spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(s"$tableRoot/_commits")
      .select(col("value"), col("_metadata.file_path").as("_path"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        // commit records are catalog-sized (bytes each) — this collect
        // is the log read, not a data read
        val recs = batch.collect().toSeq
          .map(r => (r.getString(1).split('/').last.toLong,
            r.getString(0).trim))
          .sortBy(_._1)
        val log = org.slf4j.LoggerFactory.getLogger(getClass)
        // has this sink ever received a feed? (a log that starts past
        // seq 1 — vacuumed before the stream attached — must still get
        // its initial snapshot; a MID-stream gap must not be papered
        // over with a second "initial")
        var emitted = Datalake.currentVersion(sp, sinkRoot).isDefined
        def snapshotAsInserts(token: String): DataFrame = {
          // initial snapshot as inserts (the Delta streaming-source
          // convention) — readToken, so even a first commit carrying
          // a vector resolves correctly
          val snap = Datalake.readToken(sp, tableRoot, token)
          val payload = snap.columns.filterNot(keys.contains).toSeq
          snap.select(keys.map(col) ++ payload.map(col) ++ Seq(
            lit("insert").as("_change_type"),
            lit("initial").as("_from_version"),
            lit(Datalake.tokenLabel(token)).as("_to_version")): _*)
        }
        val feeds = recs.flatMap { case (seq, token) =>
          val out: Option[DataFrame] = if (token.startsWith("ref=")) {
            log.warn(s"changeFeedStream: commit $seq holds a clone " +
              s"pointer '$token' — skipped (the data lives in another " +
              "table; replicate from the source)")
            None
          } else if (seq == 1L) {
            Some(snapshotAsInserts(token))
          } else Datalake.commitTokenSeq(sp, tableRoot, seq - 1) match {
            case Some(pt) if !pt.startsWith("ref=") =>
              // token-general diff: DELETE (dv=) commits materialize as
              // delete rows, merges as their arms, maintenance rewrites
              // as the empty feed — every commit class, one code path
              Some(Datalake.changeFeedTokens(sp, tableRoot, pt, token,
                keys))
            case other if !emitted =>
              // the log's earliest LIVE record (everything before it
              // vacuumed away): this commit IS the stream's initial
              // snapshot (r15 hardening — the first cut never emitted
              // one, so a consumer of a trimmed log replayed nothing)
              log.warn(s"changeFeedStream: predecessor of $seq " +
                s"unresolvable ($other) at stream start — emitting its " +
                "snapshot as the initial feed")
              Some(snapshotAsInserts(token))
            case other =>
              log.warn(s"changeFeedStream: commit ${seq - 1} " +
                s"(predecessor of $seq) unresolvable ($other) — skipped; " +
                "vacuumed-past-the-checkpoint logs need a snapshot restart")
              None
          }
          if (out.isDefined) emitted = true
          out
        }
        feeds.reduceOption(_.unionByName(_)).foreach { f =>
          Datalake.publishEpochCas(f, sinkRoot, batchId.toString)
        }
        ()
      }
      .start()
  }
}
