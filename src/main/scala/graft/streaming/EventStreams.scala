package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.sources.Datalake

/** Structured Streaming forms of the event analytics: the reference's
  * hourly Airflow poll + state file (lbc_fetcher.py) becomes a real stream
  * with watermarks and typed state.
  *
  * Both transforms take a streaming DataFrame with
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double) — e.g. `spark.readStream.schema(...).parquet(dir)` or a
  * MemoryStream in tests — and are sink-agnostic.
  */
object EventStreams {

  /** Tumbling 1h windowed counts per event type with a 2h watermark: late
    * events beyond the watermark are dropped, state is bounded, output is
    * append-mode compatible. At scale this is the canonical "metrics from
    * a firehose" plan: partial aggregation per executor, one shuffle on
    * (window, event_type).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("total_value"))

  /** The DRIVER-CHECKABLE form of the windowed aggregate
    * (q_stream_window): per-(window, event_type, user_id) cells instead of
    * the display-level rollup, because the two things the batch twin
    * computes that a streaming agg cannot — `countDistinct(user_id)` and a
    * double sum independent of accumulation order — both fall out of the
    * finer grain: each cell is exactly-once-and-final under append mode
    * (it seals when the watermark passes its window end), so downstream
    * n_users is a plain COUNT of cells and the decimal(18,2) partial sums
    * re-aggregate exactly (decimal addition is associative — same
    * linearity argument as the CMS merge). At 100 TB this is also the
    * shape you'd persist: the cells are the reusable cube, the rollup is a
    * cheap batch read over them.
    */
  def windowedUserCells(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("v"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("user_id"), col("n"), col("v"))

  /** Sessionization via the BUILT-IN `session_window` aggregation (r13) —
    * the native-operator twin of [[sessionize]]'s
    * flatMapGroupsWithState: Spark merges per-key session windows in the
    * state store itself (gap-bounded interval union), and append mode
    * seals a session once the watermark passes its end (= last event +
    * gap). Semantics pin: a gap of EXACTLY the session timeout starts a
    * NEW session here (windows are end-exclusive), where a lag-based
    * `> gap` split would merge it — the oracle must replay `>=`.
    * Sentinels flow through under their own user_id key and are dropped
    * batch-side.
    */
  def sessionWindowCells(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("v"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("v"))

  /** Watermark-SEALED drift histogram cells — the production drift-gate
    * shape (round-11 verdict #7): daily event-time windows of
    * (type, bin) counts that emit ONLY once the watermark passes their
    * window end, so a cohort can never change after the monitor reads
    * it. The binning head is the batch monitor's
    * `EventQueries.driftBinnedTs` verbatim (one definition, stream and
    * batch cannot drift). Sentinel rows must NOT be filtered inside the
    * streaming op — PushPredicateThroughNonJoin pushes any non-event-time
    * predicate below the EventTimeWatermark node, dropping the sentinels
    * before they can advance the watermark (observed: the last real day
    * never sealed). Instead they flow through the aggregation under
    * their own `__sentinel` group flag and the caller drops their cells
    * batch-side (the qStreamWindow discipline). Append mode makes
    * "sealed" a structural guarantee, not a convention: an unsealed
    * window simply hasn't emitted.
    */
  def driftWindowCells(events: DataFrame): DataFrame =
    graft.queries.EventQueries.driftBinnedTs(
        events.withColumn("__sentinel", col("user_id") < 0)
          .withWatermark("ts", "2 hours"),
        carry = Seq("__sentinel"))
      .groupBy(window(col("ts"), "1 day"), col("event_type"), col("bin"),
        col("__sentinel"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"),
        col("window.end").as("wend"), col("event_type"), col("bin"),
        col("__sentinel"), col("n"))

  /** Stream-stream attribution join: clicks within the hour before each
    * purchase of the same user, both sides unbounded streams. The
    * time-interval join condition + watermarks let Spark BOUND the join
    * state: a buffered click can be dropped once the purchase watermark
    * passes click_ts + 1h, and vice versa — without the interval bound the
    * state grows forever. The streaming twin of ops.RangeJoin /
    * EventQueries.qRangeJoin.
    *
    * clicks: (click_id, user_id, click_ts); purchases: (purchase_id,
    * p_user, p_ts) — sides pre-aliased so the join condition is unambiguous.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("click_ts", "1 hour")
      .join(purchases.withWatermark("p_ts", "1 hour"),
        expr("""user_id = p_user
               |AND click_ts >= p_ts - INTERVAL 1 HOUR
               |AND click_ts < p_ts""".stripMargin))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("p_ts"))

  /** LEFT OUTER stream-stream interval join — the semantics the inner
    * join above cannot express: every click emits, and a click with NO
    * in-window purchase emits (click, NULL) — but only once the
    * watermark proves the negative ("no purchase can ever arrive for
    * this click"), i.e. when it passes click_ts + 1h and the buffered
    * click's state evicts. Inner matches still emit as they occur; the
    * null rows are the part that needs a SEALING argument, which is why
    * this row's feed must keep advancing the watermark after the last
    * real click (the sentinel-passthrough note on the registered query).
    * The streaming twin of a batch LEFT JOIN on the same interval.
    */
  def attributionJoinOuter(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("click_ts", "1 hour")
      .join(purchases.withWatermark("p_ts", "1 hour"),
        expr("""user_id = p_user
               |AND click_ts >= p_ts - INTERVAL 1 HOUR
               |AND click_ts < p_ts""".stripMargin),
        "left_outer")
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("p_ts"))

  /** Incremental JSONL bulk export — the streaming form of the reference's
    * Elasticsearch `_bulk` indexing (index_to_es.py): each micro-batch is
    * written as JSONL under `outDir/batch=<epoch>/` by every executor in
    * parallel. Overwrite per epoch directory makes replays after failure
    * idempotent; the checkpoint carries exactly-once epoch tracking.
    */
  def exportJsonl(docs: DataFrame, outDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        Datalake.writeJsonl(batch, s"$outDir/batch=$epoch", SaveMode.Overwrite)
      }
      .start()

  /** Streaming exact dedup on event_id with bounded state: the watermark
    * lets Spark drop dedup state older than the delay, so memory is
    * proportional to the watermark window, not the stream's history —
    * the streaming twin of the batch keep-last dedup (and the reference's
    * incremental `id`-dedup in raw_to_fmt_lbc.py).
    */
  def dedupEvents(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based session aggregates via the BUILT-IN session_window (dynamic
    * gap windows merged by the engine): the declarative twin of the typed
    * [[sessionize]] — use this form when per-session output is just
    * aggregates; drop to flatMapGroupsWithState only when session state
    * needs custom logic. State is bounded by the watermark like any
    * windowed agg.
    */
  def sessionWindowStats(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Stream-static enrichment: join the stream against a STATIC dimension
    * frame. The static side is broadcast and re-planned per micro-batch
    * (picking up dim updates between batches) and — unlike a stream-stream
    * join — keeps NO state: the cheapest join a stream can do, and the
    * streaming twin of the batch dim-broadcast enrichment.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, totalCents: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  case class FunnelState(buf: List[Event],
      signup: Option[Long], click: Option[Long], purchase: Option[Long])
  case class FunnelOut(user_id: Long, signup_ts: Timestamp,
      first_click_ts: Option[Timestamp], first_purchase_ts: Option[Timestamp],
      stage: String)

  /** Micros-since-epoch of a Timestamp — `getTime` is MILLIS and silently
    * truncates the microsecond part the events actually carry. */
  private def usOf(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming twin of JourneyQueries.qFunnelSteps, and the one stateful
    * op here that is CORRECT UNDER OUT-OF-ORDER DELIVERY: the funnel's
    * chained "first click at-or-after the FIRST signup" rule is
    * order-sensitive (a late-arriving earlier signup can validate a click
    * that was previously before the funnel start), so events cannot be
    * folded in arrival order. Instead each user BUFFERS events until the
    * watermark passes them (nothing older can still arrive), then folds
    * the ripe prefix in (ts, stage, event_id) order into O(1) funnel state
    * and emits a changelog row with the user's current stage.
    *
    * State per user = the O(1) step triple + a buffer bounded by the
    * watermark delay (events ≤ delay old), NOT history: the ripe prefix is
    * folded on EVERY invocation — data batches included, since Spark never
    * fires a timeout for a key that just received data (its timeout is
    * re-armed above the sweep threshold first), so a continuously-active
    * key that only folded on timeout would be starved and its buffer
    * unbounded. Emission is a CHANGELOG (append of monotone snapshots,
    * emitted only when the step triple CHANGES); the latest row per user
    * equals the batch funnel over the same events once the watermark
    * passes them (proven in StreamingSpec against qFunnelSteps' rule).
    *
    * The watermark delay is the operator's out-of-order tolerance — how
    * much CROSS-batch disorder is absorbed before Spark's late-record
    * filter drops events (within-batch disorder is always absorbed by the
    * buffer). "0 seconds" would make the cross-batch guarantee vacuous,
    * so the default matches the session-gap order of magnitude.
    */
  def funnelChangelog(events: Dataset[Event],
      watermarkDelay: String = "1 hour"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    foldRipeEvents[FunnelState, FunnelOut](events, watermarkDelay,
      FunnelState(Nil, None, None, None), _.buf, (s, b) => s.copy(buf = b),
      (userId, st, ripe) => {
        var (su, cl, pu) = (st.signup, st.click, st.purchase)
        // batch's chained `>=` comparisons are order-insensitive within
        // one timestamp (a click AT the signup's ts counts), so the
        // fold must see equal-ts events in stage order, not id order
        def prio(t: String): Int = t match {
          case "signup" => 0; case "click" => 1; case "purchase" => 2
          case _ => 3
        }
        ripe.sortBy(e => (usOf(e.ts), prio(e.event_type), e.event_id))
          .foreach { e =>
            val t = usOf(e.ts)
            e.event_type match {
              case "signup" if su.isEmpty => su = Some(t)
              case "click" if cl.isEmpty && su.exists(t >= _) => cl = Some(t)
              case "purchase" if pu.isEmpty && cl.exists(t >= _) => pu = Some(t)
              case _ => ()
            }
          }
        // emit only when the fold CHANGED the triple — identical
        // snapshots would otherwise re-emit on every watermark advance
        val changed = (su, cl, pu) != ((st.signup, st.click, st.purchase))
        val out = if (changed) su.map { s =>
          FunnelOut(userId, tsOf(s),
            cl.map(tsOf), pu.map(tsOf),
            if (pu.isDefined) "purchased"
            else if (cl.isDefined) "clicked" else "signed_up")
        }.iterator
        else Iterator.empty
        (st.copy(signup = su, click = cl, purchase = pu), out)
      })
  }

  case class ScdState(buf: List[Event], lastAttr: Option[String],
      nextVersion: Int)
  case class ScdOut(user_id: Long, event_type: String,
      valid_from: Timestamp, version: Int)

  /** Streaming twin of EventQueries.qScd2History — the event-time-correct
    * CDC changelog. SCD2 is order-sensitive in the strongest way: a
    * late-arriving event can INSERT a change mid-history and renumber
    * every later version, so events cannot be folded in arrival order.
    * Same discipline as [[funnelChangelog]]: buffer per key until the
    * watermark seals an event, fold the ripe prefix in (ts, event_id)
    * order — the batch op's exact ordering — through O(1) state
    * (last attribute value + next version number), and emit one
    * changelog row per CHANGE. Each version row is emitted exactly once
    * (its opening event folds at the single watermark advance that
    * seals it) and is FINAL: nothing older than the watermark can
    * arrive, so no later event can precede it. valid_to deliberately
    * does not appear in the changelog — it IS the next version's
    * valid_from (the batch op derives it with lead()), and emitting a
    * closing row would state the same fact twice.
    */
  def scd2Changelog(events: Dataset[Event],
      watermarkDelay: String = "1 hour"): Dataset[ScdOut] = {
    import events.sparkSession.implicits._
    foldRipeEvents[ScdState, ScdOut](events, watermarkDelay,
      ScdState(Nil, None, 1), _.buf, (s, b) => s.copy(buf = b),
      (userId, st, ripe) => {
        var lastAttr = st.lastAttr
        var version = st.nextVersion
        val out = List.newBuilder[ScdOut]
        ripe.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
          // != on Options, not .contains: Some(null) == Some(null) keeps
          // the batch op's null-safe compare (consecutive null attrs
          // collapse into one version)
          if (lastAttr != Some(e.event_type)) {
            out += ScdOut(userId, e.event_type, e.ts, version)
            version += 1
            lastAttr = Some(e.event_type)
          }
        }
        (st.copy(lastAttr = lastAttr, nextVersion = version),
          out.result().iterator)
      })
  }

  case class TransState(buf: List[Event], lastType: Option[String])
  case class TransOut(user_id: Long, cur_type: String, next_type: String,
      ts: Timestamp)

  /** Streaming twin of JourneyQueries.qMarkovTransitions: the per-user
    * (current → next) event-type transition feed. A transition is
    * order-DEFINED — "next" means next in event time, not next to arrive —
    * so arrival-order folding would fabricate transitions that never
    * happened and lose ones that did. Same discipline as
    * [[funnelChangelog]]/[[scd2Changelog]]: buffer per user until the
    * watermark seals an event, fold the ripe prefix in (ts, event_id)
    * order through O(1) state (the last sealed event type), and emit one
    * row per consumed transition — exactly once and final, since nothing
    * older than the watermark can arrive to change what "next" was. The
    * transition MATRIX is then a plain count aggregate of this changelog
    * (q_markov_transitions' groupBy), maintained incrementally by any
    * downstream sink; null event types are dropped up front, mirroring
    * the batch filter (a typed transition out of an untyped event is
    * undefined).
    */
  def transitionChangelog(events: Dataset[Event],
      watermarkDelay: String = "1 hour"): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    foldRipeEvents[TransState, TransOut](
      events.filter(_.event_type != null), watermarkDelay,
      TransState(Nil, None), _.buf, (s, b) => s.copy(buf = b),
      (userId, st, ripe) => {
        var last = st.lastType
        val out = List.newBuilder[TransOut]
        ripe.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
          last.foreach(l => out += TransOut(userId, l, e.event_type, e.ts))
          last = Some(e.event_type)
        }
        (st.copy(lastType = last), out.result().iterator)
      })
  }

  case class RetentionState(buf: List[Event], cohortDay: Option[Long])
  case class RetentionActivity(user_id: Long, cohort_day: java.time.LocalDate,
      day: java.time.LocalDate, day_offset: Long)

  private val DayMs = 86400000L
  private def epochDayOf(e: Event): Long = math.floorDiv(e.ts.getTime, DayMs)

  /** THE one copy of the buffer-until-watermark mechanics every
    * order-sensitive changelog op here shares: buffer per user (prepend —
    * appending is O(buf) per batch and O(buf²) across a watermark
    * window), partition on the op's ripeness rule at every invocation
    * (data batches INCLUDED — Spark never fires a timeout for a key that
    * just received data, so a key folding only on timeout would starve),
    * fold the ripe slice through the op's state, and re-arm the
    * event-time timeout one past the watermark while anything is pending.
    * Day-sealed ops ([[foldSealedDays]]) ripen whole days; event-level
    * ops ([[foldRipeEvents]]) ripen events strictly older than the
    * watermark (an event in the watermark's own millisecond could still
    * be followed by a same-millisecond earlier-micros arrival).
    */
  private def foldBuffered[S, O](events: Dataset[Event],
      watermarkDelay: String, isRipe: (Event, Long) => Boolean,
      empty: S, buf: S => List[Event],
      withBuf: (S, List[Event]) => S,
      fold: (Long, S, List[Event]) => (S, Iterator[O]))(
      implicit se: org.apache.spark.sql.Encoder[S],
      oe: org.apache.spark.sql.Encoder[O]): Dataset[O] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[S, O](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[S]) =>
          val prev = state.getOption.getOrElse(empty)
          val wm = state.getCurrentWatermarkMs
          val buffered =
            if (state.hasTimedOut) buf(prev)
            else evs.toList ::: buf(prev)
          val (ripe, rest) = buffered.partition(e => isRipe(e, wm))
          val (next, out) =
            if (ripe.isEmpty) (withBuf(prev, rest), Iterator.empty[O])
            else fold(userId, withBuf(prev, rest), ripe)
          state.update(next)
          if (rest.nonEmpty || !state.hasTimedOut)
            state.setTimeoutTimestamp(wm + 1)
          out
      }
  }

  private def foldSealedDays[S, O](events: Dataset[Event],
      watermarkDelay: String, empty: S, buf: S => List[Event],
      withBuf: (S, List[Event]) => S,
      fold: (Long, S, List[Event]) => (S, Iterator[O]))(
      implicit se: org.apache.spark.sql.Encoder[S],
      oe: org.apache.spark.sql.Encoder[O]): Dataset[O] =
    foldBuffered(events, watermarkDelay,
      (e, wm) => (epochDayOf(e) + 1) * DayMs <= wm,
      empty, buf, withBuf, fold)

  private def foldRipeEvents[S, O](events: Dataset[Event],
      watermarkDelay: String, empty: S, buf: S => List[Event],
      withBuf: (S, List[Event]) => S,
      fold: (Long, S, List[Event]) => (S, Iterator[O]))(
      implicit se: org.apache.spark.sql.Encoder[S],
      oe: org.apache.spark.sql.Encoder[O]): Dataset[O] =
    foldBuffered(events, watermarkDelay, (e, wm) => e.ts.getTime < wm,
      empty, buf, withBuf, fold)

  /** Streaming twin of JourneyQueries.qRetentionCohort — the second
    * operator on the buffer-until-watermark pattern [[funnelChangelog]]
    * proved out. Retention is order-sensitive the same way the funnel is:
    * a LATE-arriving earlier event moves the user's cohort day backward,
    * which would re-label every matrix cell the user ever contributed to —
    * so nothing may be emitted until it can no longer change.
    *
    * The sealing rule that makes emissions final: an activity DAY is
    * emitted only once the watermark passes the day's END — after which no
    * event of that day can still arrive (the late filter drops it), so
    * (a) every (user, day) cell is emitted EXACTLY once (all of a day's
    * events ripen in the same fold), and (b) the cohort day is final at
    * the user's first fold: ripe days seal earliest-first, and every
    * still-buffered or future event has a day ≥ every sealed day.
    *
    * State per user = the O(1) cohort day + a buffer bounded by the
    * watermark delay. Output is an append changelog of per-user activity
    * cells (user, cohort_day, day, day_offset); the retention MATRIX is a
    * plain aggregate over it — count(cells) per (cohort_day, offset) —
    * which StreamingSpec proves equal to the batch qRetentionCohort on
    * shuffled, straggler-delayed real events.
    */
  def retentionActivity(events: Dataset[Event],
      watermarkDelay: String = "1 hour"): Dataset[RetentionActivity] = {
    import events.sparkSession.implicits._
    foldSealedDays[RetentionState, RetentionActivity](
      events, watermarkDelay, RetentionState(Nil, None), _.buf,
      (s, b) => s.copy(buf = b),
      (userId, st, ripe) => {
        val ripeDays = ripe.map(epochDayOf).distinct.sorted
        val cohort = (st.cohortDay.toList ++ ripeDays).reduceOption(_ min _)
        val c = cohort.getOrElse(0L) // ripe nonEmpty => cohort defined
        (st.copy(cohortDay = cohort),
          ripeDays.iterator.map { d =>
            RetentionActivity(userId, java.time.LocalDate.ofEpochDay(c),
              java.time.LocalDate.ofEpochDay(d), d - c)
          })
      })
  }

  case class GapFillState(buf: List[Event],
      cursor: Option[(Long, Long, Double)]) // (lastEmittedDay, lastActiveDay, filledTotal)
  case class GapFillOut(user_id: Long, day: java.time.LocalDate,
      n_events: Long, filled_total: Double, days_since_active: Long,
      is_active: Boolean)

  /** Streaming twin of JourneyQueries.gapFill — the third operator on the
    * day-sealed buffer-until-watermark pattern. The batch query densifies
    * each user's calendar between first and last activity day and
    * forward-fills the last observed daily total; the stream emits those
    * SAME dense rows incrementally as days seal (watermark past the day's
    * end), including the empty gap days between sealed activity days.
    *
    * Why sealing matters here: a day's n_events / day_total and whether a
    * calendar day is a gap at all are only final once no event of that day
    * can still arrive; emitting earlier would need retractions. Once an
    * activity day seals, every earlier calendar day is also sealed, so the
    * dense range (previous cursor, newest sealed activity day] is emitted
    * in one pass and the cursor advances — exactly-once per (user, day).
    * Trailing gap days after the newest sealed ACTIVITY day are not
    * emitted, matching the batch densify's min..max day range.
    *
    * State per user = O(1) cursor (last emitted day, last active day,
    * running filled total) + the watermark-bounded buffer. Daily totals
    * fold in the exact decimal domain (each value rounded to cents, summed
    * exactly — the ops.Agg.decSum2 contract), so the changelog converges
    * bit-for-bit to the batch densify over the SAME input — StreamingSpec
    * proves it on shuffled, straggler-delayed real events.
    *
    * Value contract: Event.value is a primitive Double, so a feed must
    * coalesce NULL values (to 0.0) BEFORE this operator. The registered
    * batch q_gap_fill reads raw nullable values, where an all-NULL
    * activity day leaves day_total NULL and the forward-fill carries the
    * previous total — a coalesced feed sums such a day to 0.0 instead.
    * Stream==batch therefore holds against the batch densify over the
    * coalesced frame (what the spec compares), not against the raw-null
    * variant.
    */
  def gapFillChangelog(events: Dataset[Event],
      watermarkDelay: String = "1 hour"): Dataset[GapFillOut] = {
    import events.sparkSession.implicits._
    foldSealedDays[GapFillState, GapFillOut](
      events, watermarkDelay, GapFillState(Nil, None), _.buf,
      (s, b) => s.copy(buf = b),
      (userId, st, ripe) => {
        val byDay = ripe.groupBy(epochDayOf)
        // exact decimal fold: round each value to cents, sum exactly,
        // ONE double conversion — order-independent and equal to the
        // batch plan's sum(cast(value as DECIMAL(18,2))) cast double
        def decSum(es: List[Event]): Double =
          es.map(e => BigDecimal(e.value)
              .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble
        val maxActive = byDay.keys.max
        var (cursor, lastActive, filled) = st.cursor match {
          case Some((c, a, f)) => (c, a, f)
          case None =>
            val first = byDay.keys.min
            (first - 1, first, 0.0) // emission starts at the first day
        }
        val out = List.newBuilder[GapFillOut]
        var d = cursor + 1
        while (d <= maxActive) {
          byDay.get(d) match {
            case Some(es) =>
              filled = decSum(es); lastActive = d
              out += GapFillOut(userId, java.time.LocalDate.ofEpochDay(d),
                es.length.toLong, filled, 0L, is_active = true)
            case None =>
              out += GapFillOut(userId, java.time.LocalDate.ofEpochDay(d),
                0L, filled, d - lastActive, is_active = false)
          }
          d += 1
        }
        (st.copy(cursor = Some((maxActive, lastActive, filled))),
          out.result().iterator)
      })
  }

  /** Gap-based sessionization (30 min) with typed per-key state +
    * event-time timeout: the streaming twin of EventQueries.qSessionize.
    * State per user is O(1); a session emits when a later event arrives past
    * the gap, or when the WATERMARK passes last_event + gap (event-time
    * timeout — deterministic under replay/backfill, unlike wall-clock
    * timeouts, and it lets the engine reach quiescence between triggers).
    * Memory is bounded by active users, not history.
    *
    * Exactness (the q_stream_sessionize contract): all arithmetic runs in
    * the domains the batch twin proves hash-exact in DuckDB — gap checks
    * and boundaries in MICROS (`getTime` is millis and truncates the
    * microsecond part the events carry, which can flip a gap decision that
    * straddles a millisecond edge), totals in integer CENTS (the events'
    * values are 2-decimal; the emitted double is one IEEE division of an
    * exact integer — bit-identical to the batch side's
    * decimal(18,2)-sum-then-cast on both engines).
    */
  def sessionize(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          def close(s: SessionState): SessionOut =
            SessionOut(userId, tsOf(s.start), tsOf(s.last), s.n,
              s.totalCents / 100.0)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(s))
          } else {
            val sorted = evs.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = usOf(e.ts)
              val cents = math.rint(e.value * 100).toLong
              cur match {
                case Some(s) if t - s.last > gapUs =>
                  out += close(s)
                  cur = Some(SessionState(t, t, 1, cents))
                case Some(s) =>
                  cur = Some(s.copy(last = t, n = s.n + 1,
                    totalCents = s.totalCents + cents))
                case None =>
                  cur = Some(SessionState(t, t, 1, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must stay ahead of the watermark or Spark rejects it; the
              // +1999 ceil keeps the millis timeout at-or-after the micros
              // session end + gap, so a timeout can never fire early
              state.setTimeoutTimestamp(
                math.max((s.last + gapUs + 1999L) / 1000L,
                  state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
  }
}
