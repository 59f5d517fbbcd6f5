package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.ops.AsOf
import graft.sources.Tables
import graft.ops.Agg._

/** Event-stream analytics (batch form; streaming versions live in
  * graft.streaming). The reference's incremental lbc fetch state
  * (lbc_fetcher.py watermark file) maps to the watermark filter; its hourly
  * DAG schedule maps to the tumbling window.
  */
object EventQueries {

  /** Gap-based sessionization (30 min): the classic two-window plan —
    * lag to mark session starts, running sum to number sessions, then one
    * groupBy. Shuffles once on user_id; at 100 TB events would be
    * pre-bucketed by user_id making this shuffle-free.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    graft.ops.Sessionize
      .withSessionSeq(e, col("user_id"), col("ts"), col("event_id"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        decSum2(col("value")).cast("double").as("total_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Tumbling 1-hour window aggregate per event type. */
  def qWindowTumbling(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(
        date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        decSum2(col("value")).cast("double").as("total_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** Incremental read past a watermark (reference keeps last_fetched in a
    * state file; at scale this is a partition-pruned predicate on event
    * time, not a full scan).
    */
  def qIncrementalWatermark(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.filter(col("ts") > lit("2024-01-15 00:00:00"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_new_events"),
        max(col("ts")).as("latest_ts"))
      .orderBy(col("user_id"))
  }

  /** Range join: every click inside the hour BEFORE each purchase of the
    * same user ("pre-purchase window" attribution, many-to-many). The
    * bucketized equi-join form — see ops.RangeJoin for why the naive
    * inequality join degenerates to a nested loop.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame =
    rangeJoinPairs(spark, dir)
      .select(col("click_id"), col("purchase_id"), col("user_id"))
      .orderBy(col("click_id"), col("purchase_id"))

  /** The ONE definition of the pre-purchase-hour pair set (clicks within
    * the hour before each same-user purchase, `>= start && < end`) —
    * shared by q_range_join and q_attribution_linear so the window
    * convention cannot drift between them. Carries `p_value` for the
    * attribution row; q_range_join projects it away.
    */
  private def rangeJoinPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("value").as("p_value"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("win_start"),
        col("ts").as("win_end"))
    graft.ops.RangeJoin.pointInInterval(clicks, purchases, "user_id",
      col("click_ts"), col("win_start"), col("win_end"))
  }

  /** Linear multi-touch attribution: each purchase's value split EQUALLY
    * across its in-window clicks (the q_range_join pairs) — the standard
    * upgrade from last-touch (q_asof_attribution) when several touchpoints
    * share credit. One count-window partitioned by purchase_id over the
    * bucketized range join assigns the denominator; credit stays a SINGLE
    * IEEE division of the exact 2-decimal purchase value by an exact int,
    * so the driver hash-checks it with no snapping. Emitted at pair grain
    * (click, purchase, credit): per-click credit SUMS are deliberately NOT
    * aggregated here — summing inexact quotients is reduction-order-
    * dependent; a consumer rolls up in whatever decimal policy it owns.
    */
  def qAttributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val perPurchase = Window.partitionBy(col("purchase_id"))
    rangeJoinPairs(spark, dir)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (col("p_value") / count(lit(1)).over(perPurchase).cast("double"))
          .as("credit"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** TIME-DECAY attribution (round 15): the third credit model beside
    * as-of last-touch (q_asof_attribution) and equal-split linear
    * (q_attribution_linear) — each purchase credits its last four
    * preceding touches with geometrically decaying weight 2^-k (nearest
    * touch k=1 → 1/2, then 1/4, 1/8, 1/16). Engine shape: NO pair join
    * at all — one user-partitioned window with four fixed-offset lags,
    * then a scan-side explode of the (touch, k) pairs; the fan-out is
    * bounded at 4 rows per purchase by construction, so at 100 TB the
    * cost is the one user_id exchange the journey family already shares.
    * Exactness: 2^-k weights are exact dyadics and credit = value · 2^-k
    * is one IEEE multiply — engine-exact, no snapping; per-pair rows are
    * emitted (no cross-row double sum).
    */
  def qAttributionDecay(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val lagged = e.select(col("event_id").as("purchase_id"),
      col("user_id"), col("event_type"), col("value").as("p_value"),
      array((1 to 4).map { k =>
        // the weight is a compile-time exact dyadic LITERAL (1/2^k) —
        // never a runtime pow, whose rounding is engine-private
        struct(lag(col("event_id"), k).over(w).as("touch_id"),
          lag(col("event_type"), k).over(w).as("touch_type"),
          lit(k.toLong).as("k"), lit(1.0 / (1L << k)).as("weight"))
      }: _*).as("touches"))
    lagged.filter(col("event_type") === "purchase")
      .select(col("purchase_id"), col("user_id"), col("p_value"),
        explode(col("touches")).as("t"))
      .filter(col("t.touch_id").isNotNull)
      .select(col("purchase_id"), col("user_id"),
        col("t.touch_id").as("touch_id"),
        col("t.touch_type").as("touch_type"),
        col("t.k").as("k"), col("t.weight").as("weight"),
        (col("p_value") * col("t.weight")).as("credit"))
      .orderBy(col("purchase_id"), col("k"))
  }

  /** Per-user event-sequence features: lead/lag gaps, running rank
    * position, quartile bucket — the standard window-function toolbox in
    * one pass. ONE shuffle on user_id serves every window (same
    * partitioning, Spark plans a single WindowExec group); gap seconds
    * stay in exact long arithmetic.
    */
  def qLeadLag(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    e.select(
        col("event_id"), col("user_id"), col("ts"),
        (unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(w))).as("us_since_prev"),
        (unix_micros(lead(col("ts"), 1).over(w)) -
          unix_micros(col("ts"))).as("us_to_next"),
        ntile(4).over(w).as("quartile"),
        first(col("event_id")).over(w).as("first_event"))
      .orderBy(col("event_id"))
  }

  /** Rolling-FRAME features per user (the piece qLeadLag's offset
    * functions don't cover): 5-event trailing count/sum/min/max plus the
    * running total — the standard online feature-engineering shapes
    * (trailing spend, activity burst detection). ROWS frames, not RANGE:
    * row frames over the unique (ts, event_id) order are deterministic and
    * cheaper (no peer-group scan). Sums run in exact decimal → one double
    * cast; min/max pick existing doubles. Same single user_id shuffle
    * serves every frame.
    */
  def qRollingFeatures(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val w5 = order.rowsBetween(-4, 0)
    val cum = order.rowsBetween(Window.unboundedPreceding, 0)
    e.select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w5).as("roll_n"),
        decSum2(col("value")).over(w5).cast("double").as("roll_sum"),
        min(col("value")).over(w5).as("roll_min"),
        max(col("value")).over(w5).as("roll_max"),
        decSum2(col("value")).over(cum).cast("double").as("cum_value"))
      .orderBy(col("event_id"))
  }

  /** Time-based trailing window — the RANGE-frame sibling of
    * qRollingFeatures: trailing-ONE-HOUR event count and exact decimal
    * sum per user, the time-decayed-feature shape a ROWS frame cannot
    * express (last N events ≠ last hour). Frame key = epoch micros on
    * both engines; the decimal sum keeps the frame aggregation
    * order-exact (equal-micros rows share one frame, so a raw double
    * sum would depend on their sort order). Same single user-keyed
    * exchange as every other window query.
    */
  def qRollingTime(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        decSum2(col("value")).over(w).cast("double").as("sum_1h"))
      .orderBy(col("event_id"))
  }

  /** Join-key skew profile: the top-10 heaviest user_id keys with their
    * share of all events — the diagnostic that decides whether a join
    * needs salting/AQE skew handling BEFORE it melts a reducer at 100 TB.
    * Shape: partial-agg count per key (one shuffle), 1-row total broadcast,
    * global top-10 via TakeOrderedAndProject (sort-limit pushed to the
    * partials — never an unpartitioned window). share = exact-int ÷
    * exact-int, deterministic.
    */
  def qSkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id")
    val per = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val total = e.agg(count(lit(1)).as("total"))
    per.crossJoin(broadcast(total))
      .select(col("user_id"), col("n_events"),
        (col("n_events").cast("double") / col("total")).as("share"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(10)
  }

  /** Enrichment join on a PATHOLOGICALLY skewed key: `event_type` has 5
    * values over the whole table, so an unsalted shuffle join can use at
    * most 5 reducers no matter how many executors exist. The salted form
    * (ops.Salting) turns each hot key into `salts` even partitions; the
    * stats side is exploded ×salts and hinted shuffle_hash so the salt
    * actually governs partitioning (a broadcast would hide the
    * demonstration — and at 100 TB the non-fact side isn't always
    * broadcastable). Results are identical to the plain join: the oracle
    * is the unsalted SQL.
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val stats = e.groupBy(col("event_type"))
      .agg(decAvg(col("value")).as("type_avg"))
    graft.ops.Salting.saltedJoin(
        e.select(col("event_id"), col("event_type"), col("value")),
        stats.hint("shuffle_hash"),
        "event_type", salts = 8)
      .select(col("event_id"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"),
        col("type_avg"),
        (coalesce(col("value"), lit(0.0)) > col("type_avg")).as("above_avg"))
      .orderBy(col("event_id"))
  }

  /** Attribution via as-of join: each purchase matched to the user's most
    * recent click at-or-before it. Clicks are pre-deduped to one per
    * (user, ts) so the match is deterministic; the oracle is DuckDB's
    * native ASOF LEFT JOIN.
    */
  def qAsofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("event_id")).as("click_event_id"))
    AsOf.asOfJoin(purchases, clicks, "user_id", "purchase_ts", "click_ts")
      .orderBy(col("purchase_id"))
  }

  /** As-of attribution with MAX STALENESS (pandas merge_asof `tolerance`):
    * a click older than one hour before the purchase no longer gets the
    * credit — the realistic attribution-window rule. Same single-shuffle
    * as-of plan; the tolerance is a post-window null-out.
    */
  def qAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("event_id")).as("click_event_id"))
    AsOf.asOfJoin(purchases, clicks, "user_id", "purchase_ts", "click_ts",
        tolerance = Some("1 HOUR"))
      .orderBy(col("purchase_id"))
  }

  /** SCD2 dimension history from the event stream (ops.Scd): per user, the
    * event_type attribute collapsed to change rows with versioned validity
    * intervals — the CDC→warehouse history build. One user-keyed shuffle
    * serves change detection, interval close and version numbering.
    */
  def qScd2History(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Scd.scd2History(Tables.events(spark, dir), col("user_id"),
        col("ts"), col("event_type"), col("event_id"))
      .select(col("key").as("user_id"), col("attr").as("event_type"),
        col("valid_from"), col("valid_to"),
        col("version").cast("long").as("version"), col("is_current"))
      .orderBy(col("user_id"), col("version"))

  /** POINT-IN-TIME enrichment against SCD2 dimension history (r13 — the
    * feature-store correctness primitive: training labels must join the
    * dimension version that was CURRENT at event time, never today's —
    * the classic label-leakage bug): each purchase picks up the user's
    * last non-purchase activity state and its dimension version as of
    * the purchase timestamp. Composition of two existing scale shapes —
    * the one-shuffle SCD2 build and the one-shuffle union-form as-of
    * join — so PIT costs two key shuffles total, never the |facts| ×
    * |versions| range-join blow-up. A user whose first event is the
    * purchase has no prior state → nulls, replayed by the oracle's ASOF
    * LEFT JOIN.
    */
  def qPitJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hist = graft.ops.Scd.scd2History(
        e.filter(col("event_type") =!= "purchase"),
        col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .select(col("key").as("user_id"),
        col("attr").as("state_at_purchase"), col("valid_from"),
        col("version").cast("long").as("dim_version"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    AsOf.asOfJoin(purchases, hist, "user_id", "purchase_ts", "valid_from")
      .select(col("purchase_id"), col("user_id"),
        col("state_at_purchase"), col("dim_version"))
      .orderBy(col("purchase_id"))
  }

  /** Interval concurrency profile by SWEEP-LINE (round 8): each event
    * opens a 30-minute activity interval [ts, ts+30min); the query finds
    * the peak number of simultaneously open intervals per event type and
    * when it first occurs — the "max concurrent sessions" question every
    * capacity dashboard asks, answered without materializing any
    * point-in-time state. Plan: each interval emits two boundary rows
    * (+1 at start, −1 at end), boundaries combine per (type, timestamp)
    * map-side, and ONE type-keyed window computes the running active
    * count — concurrency at t is exactly count(start ≤ t) − count(end ≤
    * t) under the closed-open convention, so equal-timestamp ordering
    * can't introduce nondeterminism. Both window passes (running sum,
    * max) share the one exchange. At 100 TB: 2 boundary rows per event,
    * partial-aggregated to ≤ distinct timestamps per type before the
    * shuffle; the window runs over boundary rows, never events.
    */
  def qConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val iv = e.select(col("event_type"), col("ts").as("s"),
      (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
    val bounds = iv.select(col("event_type"), col("s").as("t"), lit(1L).as("d"))
      .unionByName(iv.select(col("event_type"), col("en").as("t"),
        lit(-1L).as("d")))
      .groupBy(col("event_type"), col("t"))
      .agg(sum(col("d")).as("net"))
    val byType = Window.partitionBy(col("event_type"))
    val run = bounds
      .withColumn("active", sum(col("net")).over(byType.orderBy(col("t"))))
      .withColumn("mx", max(col("active")).over(byType))
    val peaks = run.filter(col("active") === col("mx"))
      .groupBy(col("event_type"))
      .agg(max(col("mx")).as("max_concurrent"), min(col("t")).as("peak_ts"))
    e.groupBy(col("event_type")).agg(count(lit(1)).as("n_intervals"))
      .join(peaks, "event_type")
      .select(col("event_type"), col("n_intervals"), col("max_concurrent"),
        col("peak_ts"))
      .orderBy(col("event_type"))
  }

  /** DISTRIBUTION-DRIFT monitor: Population Stability Index per event
    * type between a baseline cohort (first half of the month) and a
    * current cohort (second half), the standard pre-training gate on a
    * refreshed data snapshot ("did this source's value distribution move
    * since the last crawl?"). To make detection demonstrable on the
    * drift-free synthetic feed, the current cohort is CONSTRUCTED with a
    * deliberate shift (the q_entity_resolution dirty-input pattern):
    * purchase values inflate ×1.5 — the monitor must read ≈0.15
    * ("moderate drift" on the standard PSI scale) for purchase and the
    * ~0.006 noise floor elsewhere, and the oracle hash-pins both.
    *
    * Numerics: values bin into 10 fixed-width buckets (floor(v/50),
    * clamped — binning via IEEE divide+floor is bit-deterministic across
    * engines); +1 Laplace smoothing keeps every bin's ln finite; each
    * PSI term (p−q)·ln(p/q) snaps to the 2^-16 dyadic grid BEFORE the
    * sum (the BM25 ln discipline — the snap makes the 10-term sum exact
    * order-free arithmetic, cross-engine ln agreement is the ~2^-35
    * residual risk). All divisions are exact-int-over-exact-int single
    * IEEE ops. Plan: one scan, one (type, bin)-keyed partial-aggregated
    * shuffle, a 50-row bins×counts join — nothing scales with rows but
    * the first aggregate; at 100 TB per-bin counts partial-combine
    * map-side and only type×bin×2 cells cross the wire.
    */
  def qDriftPsi(spark: SparkSession, dir: String): DataFrame =
    driftPsiFromCounts(
      driftBinned(Tables.events(spark, dir))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(when(col("cohort") === 0L, 1)).as("n0"),
          count(when(col("cohort") === 1L, 1)).as("n1")))

  /** The drift monitor's BINNING head — (event_type, cohort, bin) per
    * event, shared verbatim by the batch row and the streaming store
    * builder so the two can't drift: cohort by the cutoff timestamp,
    * the constructed ×1.5 purchase shift on the current cohort, then
    * the fixed-width IEEE divide+floor bin.
    */
  private[graft] def driftBinned(e: DataFrame): DataFrame =
    driftBinnedTs(e).drop("ts")

  /** [[driftBinned]] keeping the event timestamp — the form the
    * WATERMARKED drift monitor needs, where the cohorts are event-time
    * windows rather than a per-row cutoff flag. One definition serves
    * both so batch and stream cannot disagree on the shift or the bin
    * grid.
    */
  private[graft] def driftBinnedTs(e: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val keep = carry.map(col)
    e.select(Seq(col("ts"), col("event_type"),
        when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"), 0L)
          .otherwise(1L).as("cohort"), col("value")) ++ keep: _*)
      .select(Seq(col("ts"), col("event_type"), col("cohort"),
        when(col("cohort") === 1L && col("event_type") === "purchase",
          col("value") * 1.5).otherwise(col("value")).as("v")) ++ keep: _*)
      .select(Seq(col("ts"), col("event_type"), col("cohort"),
        least(floor(col("v") / 50.0), lit(9.0)).cast("long").as("bin")) ++
        keep: _*)
  }

  /** The drift monitor's PSI TAIL over a (event_type, bin, n0, n1)
    * counts table — dense bins, Laplace smoothing, snapped ln terms
    * (numerics documented on [[qDriftPsi]]). Shared by the batch row and
    * the streaming fold, whose counts are equal by count linearity.
    */
  private[graft] def driftPsiFromCounts(counts: DataFrame): DataFrame = {
    val nBins = 10
    // dense bin frame: empty bins still carry their smoothed mass
    val bins = counts.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(sequence(lit(0L), lit(nBins - 1L))).as("bin"))
    // both joins are bookkeeping-sized (types × bins cells) but sit
    // downstream of aggregates whose size estimates are unknown — without
    // the explicit hints a narrow session plans them sort-merge (caught by
    // the PlanAuditSpec pin)
    val f = bins.join(broadcast(counts), Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        coalesce(col("n0"), lit(0L)).as("n0"),
        coalesce(col("n1"), lit(0L)).as("n1"))
    val tot = f.groupBy(col("event_type"))
      .agg(sum(col("n0")).as("t0"), sum(col("n1")).as("t1"))
    val G = 65536.0 // 2^16
    val terms = f.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("t0"), col("t1"),
        ((col("n0") + 1L).cast("double") / (col("t0") + lit(nBins.toLong)))
          .as("p"),
        ((col("n1") + 1L).cast("double") / (col("t1") + lit(nBins.toLong)))
          .as("q"))
    terms.groupBy(col("event_type"))
      .agg(max(col("t0")).as("n_before"), max(col("t1")).as("n_after"),
        sum(floor((col("p") - col("q")) * log(col("p") / col("q")) * G) / G)
          .as("psi"))
      .orderBy(col("event_type"))
  }

  /** SLIDING (hopping) windows — 2-hour windows every hour, so each
    * event lands in exactly two overlapping windows (r13; the tumbling
    * row's overlap twin): the smoothing shape monitoring dashboards use.
    * Same partial-aggregated one-shuffle plan as tumbling — the window
    * expression expands each row to its two buckets map-side.
    */
  def qWindowSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        decSum2(col("value")).cast("double").as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy(col("bucket"), col("event_type"))

  /** Kolmogorov–Smirnov drift statistic over the binned ECDF (r13 — the
    * PSI monitor's nonparametric sibling): D = max over the 10-bin grid
    * of |F0(bin) − F1(bin)| between the baseline and current cohorts,
    * same constructed ×1.5 purchase shift, same dense-bin discipline.
    * Numerics: each CDF value is ONE IEEE long/long division (correctly
    * rounded in both engines), the difference and max are exact — no
    * snapping needed, unlike PSI's ln terms. Plan: the (type, bin)
    * partial-agg shuffle plus a 50-row window over the dense grid —
    * bookkeeping-sized, rows never sort.
    */
  def qDriftKs(spark: SparkSession, dir: String): DataFrame = {
    val counts = driftBinned(Tables.events(spark, dir))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(when(col("cohort") === 0L, 1)).as("n0"),
        count(when(col("cohort") === 1L, 1)).as("n1"))
    val bins = counts.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(sequence(lit(0L), lit(9L))).as("bin"))
    val f = bins.join(broadcast(counts), Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        coalesce(col("n0"), lit(0L)).as("n0"),
        coalesce(col("n1"), lit(0L)).as("n1"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = f.select(col("event_type"), col("n0"), col("n1"),
      sum(col("n0")).over(w).as("c0"), sum(col("n1")).over(w).as("c1"))
    val tot = f.groupBy(col("event_type"))
      .agg(sum(col("n0")).as("t0"), sum(col("n1")).as("t1"))
    cum.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("t0"), col("t1"),
        abs(col("c0").cast("double") / col("t0") -
          col("c1").cast("double") / col("t1")).as("d"))
      .groupBy(col("event_type"))
      .agg(max(col("t0")).as("n_before"), max(col("t1")).as("n_after"),
        max(col("d")).as("ks"))
      .orderBy(col("event_type"))
  }

  /** SKEW-MITIGATION EVIDENCE (round-11 verdict #5) — the
    * q_zorder_skipping discipline applied to shuffle skew: for the
    * pathological 5-value `event_type` join key, COMPUTE what each
    * mitigation's reduce-side distribution would be, as pure functions of
    * the data the oracle replays exactly:
    *
    *   - `1_unsalted`   — one reduce unit per key: at most 5 active
    *     reducers on any cluster, max unit = the hottest key's rows.
    *   - `2_aqe_split`  — AQE's OptimizeSkewedJoin splits an oversized
    *     partition into advisory-sized chunks and replicates the matching
    *     build side; modeled as ceil(rows/65536)-way chunking per key
    *     (the row-domain image of the byte-domain advisory split).
    *   - `3_salted_8`   — explicit 8-way salting (ops.Salting): every key
    *     becomes 8 units; modeled with the deterministic salt
    *     event_id % 8 so the oracle can replay the exact distribution.
    *
    * `skew_ratio` = max_unit_rows × units ÷ total — 1.0 is perfect
    * balance; the unsalted row's ratio is the slowest-reducer multiplier
    * an unmitigated 100 TB join would pay. Alongside the simulated
    * distributions, the row also EXECUTES the real salted join
    * (shuffle_hash, so the salt governs partitioning) and carries its
    * result aggregate — mitigation must be invisible in values, so the
    * oracle's n_rows/n_above come from the plain unsalted join. The
    * RUNTIME half of the evidence (AQE actually splitting a skewed
    * partition into more tasks) is pinned by SkewSpec, where executed-plan
    * markers are observable; task timings aren't hash-stable, simulated
    * distributions are.
    */
  def qSkewEvidence(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = e.groupBy(col("event_type"))
      .agg(decAvg(col("value")).as("type_avg"))
    val res = graft.ops.Salting.saltedJoin(
        e, stats.hint("shuffle_hash"), "event_type", salts = 8)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(coalesce(col("value"), lit(0.0)) > col("type_avg"), 1L)
          .otherwise(0L)).as("n_above"))
    val perKey = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val total = perKey.agg(sum(col("n")).as("total"))
    val u1 = perKey
      .agg(count(lit(1)).as("units"), max(col("n")).as("max_unit_rows"))
      .select(lit("1_unsalted").as("strategy"), col("units"),
        col("max_unit_rows"))
    val u2 = perKey
      .select(col("n"), expr("(n - 1) div 65536 + 1").as("chunks"))
      .agg(sum(col("chunks")).as("units"),
        max(expr("(n + chunks - 1) div chunks")).as("max_unit_rows"))
      .select(lit("2_aqe_split").as("strategy"), col("units"),
        col("max_unit_rows"))
    val u3 = e
      .groupBy(col("event_type"), pmod(col("event_id"), lit(8L)).as("salt"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("units"), max(col("n")).as("max_unit_rows"))
      .select(lit("3_salted_8").as("strategy"), col("units"),
        col("max_unit_rows"))
    u1.unionByName(u2).unionByName(u3)
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(res))
      .select(col("strategy"), col("units"), col("max_unit_rows"),
        ((col("max_unit_rows") * col("units")).cast("double") / col("total"))
          .as("skew_ratio"),
        col("n_rows"), col("n_above"))
      .orderBy(col("strategy"))
  }

  /** FORECAST BACKTEST (round 15c — the evaluation op a forecasting
    * pipeline needs before any model earns production traffic: score a
    * baseline forecaster against history and report per-series error).
    * Forecaster = seasonal naive (tomorrow looks like the same weekday
    * last week, f_t = v_(t-7)) — THE baseline every paper scores against;
    * metric = sMAPE (symmetric, scale-free, defined when v and f differ
    * in magnitude). Day-grain per type, 7-day warmup dropped.
    *
    * Exactness: daily values are exact decimal sums cast once; each
    * day's sMAPE term 2·|v−f|/(v+f) is IEEE-deterministic but SUMMING
    * raw terms would be reduction-order-dependent — each term is snapped
    * to the 2^-16 grid first (the BM25/entropy discipline), making the
    * sum exact and the mean one final division. The worst day is an
    * argmax over (term, day) — comparison-only, bit-deterministic.
    * Same calendar-bounded window-safety argument as the EWMA row.
    */
  def qForecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(decSum2(col("value")).cast("double").as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val scored = daily
      .select(col("event_type"), col("day"), col("v"),
        lag(col("v"), 7).over(w).as("f"),
        row_number().over(w).as("rn"))
      .filter(col("rn") > 7)
      .select(col("event_type"), col("day"), col("v"), col("f"),
        (floor(lit(2.0) * abs(col("v") - col("f")) /
          (col("v") + col("f")) * lit(65536.0)) / lit(65536.0))
          .as("term"))
    val worst = Window.partitionBy(col("event_type"))
      .orderBy(col("term").desc, col("day"))
    scored
      .select(col("event_type"), col("day"), col("term"),
        row_number().over(worst).as("wrk"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"),
        (sum(col("term")) / count(lit(1)).cast("double")).as("smape"),
        max(when(col("wrk") === 1, col("day"))).as("worst_day"),
        max(when(col("wrk") === 1, col("term"))).as("worst_term"))
      .orderBy(col("event_type"))
  }

  /** INTERVAL MERGE (round 15c — the coverage-span operator beside the
    * sweep-line COUNT of q_concurrency: not "how many intervals overlap"
    * but "what is the merged footprint"): each event opens a 30-minute
    * activity interval; overlapping or touching intervals per user
    * coalesce into maximal spans (the classic stitching step before
    * computing true active time, SLA coverage, or visit blocks —
    * a naive SUM of interval lengths double-counts every overlap).
    *
    * One user-partitioned ordered window does it all: a span BREAK is a
    * start strictly greater than the running max of all previous ends
    * (running max, not lag — an early long interval can swallow several
    * later short ones), and a running sum of break flags numbers the
    * spans; one groupBy then emits (start, end, events, exact seconds).
    * All timestamps stay in exact long microseconds — no float anywhere.
    * Scale: the one user_id exchange the journey family shares; at
    * 100 TB events are pre-bucketed by user and this is shuffle-free.
    */
  def qIntervalMerge(spark: SparkSession, dir: String): DataFrame = {
    val winMicros = 30L * 60 * 1000000
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + lit(winMicros))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
    val prevMaxEnd = max(col("e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = e.select(col("user_id"), col("event_id"), col("s"),
      col("e"),
      when(prevMaxEnd.isNull || col("s") > prevMaxEnd, 1L)
        .otherwise(0L).as("brk"))
    flagged
      .select(col("user_id"), col("s"), col("e"),
        sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)).as("span_id"))
      .groupBy(col("user_id"), col("span_id"))
      .agg(min(col("s")).as("span_start_us"),
        max(col("e")).as("span_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("span_id"),
        timestamp_micros(col("span_start_us")).as("span_start"),
        timestamp_micros(col("span_end_us")).as("span_end"),
        col("n_events"),
        expr("(span_end_us - span_start_us) div 1000000")
          .as("span_seconds"))
      .orderBy(col("user_id"), col("span_id"))
  }

  /** CUSUM change-point detection (round 15c — the sequential sibling of
    * the EWMA chart: EWMA flags single-day spikes, CUSUM accumulates
    * SMALL persistent shifts until they cross a decision threshold — the
    * classic upward-shift detector for "the metric quietly drifted up
    * 10% a week ago"). The recurrence S_t = max(0, S_(t-1) + d_t) is not
    * window-expressible directly, but the classical identity
    *
    *   S_t = P_t − min(0, min_(j≤t) P_j),   P = prefix sum of d
    *
    * turns it into TWO stock windows (running sum + running min) over
    * the day-grain frame. Exactness discipline: deviations are SCALED to
    * stay integral — d_t = n·v_t − T (n = days in the series, T = the
    * series total), so prefix sums, running mins and the alarm
    * comparison 2·S > n·h̃ all run in the EXACT decimal domain with NO
    * division or ln anywhere; the one double cast happens at emission.
    * Alarm threshold h̃ = T/2 in scaled units (2·S_t > n·... folded to
    * the division-free form 2·S_t > T·1, i.e. S exceeds half the grand
    * mean × n). Same calendar-bounded window-safety argument as the
    * EWMA row.
    */
  def qCusumShift(spark: SparkSession, dir: String): DataFrame =
    cusumFromDaily(Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(decSum2(col("value")).as("v")))

  /** The CUSUM tail over a (event_type, day, v: decimal(18,2)) frame —
    * shared VERBATIM by the batch row and [[graft.queries.StreamQueries
    * .qStreamCusum]]'s store fold, so stream and batch cannot disagree
    * on the recurrence, the scaling, or the alarm rule.
    */
  def cusumFromDaily(daily: DataFrame): DataFrame = {
    val perType = Window.partitionBy(col("event_type"))
    val ordered = perType.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scaled = daily.select(col("event_type"), col("day"), col("v"),
      count(lit(1)).over(perType).as("n_days"),
      sum(col("v")).over(perType).as("total"))
    val p = (sum(col("v") * col("n_days")).over(ordered) -
      col("total") * row_number().over(perType.orderBy(col("day"))))
    val withP = scaled.select(col("event_type"), col("day"), col("v"),
      col("total"), p.as("p"))
    val runMin = min(col("p")).over(
      Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    withP.select(col("event_type"), col("day"),
        col("v").cast("double").as("v"),
        (col("p") - least(lit(0), runMin)).cast("double").as("cusum_scaled"),
        ((col("p") - least(lit(0), runMin)) * lit(2) > col("total"))
          .cast("long").as("alarm"))
      .orderBy(col("event_type"), col("day"))
  }

  /** EWMA control chart over a metric time series (round 15c): the
    * monitoring op that watches a pipeline's own health — forecast each
    * day's per-type event value as a truncated exponentially-weighted
    * average of the previous eight days and flag the days whose actuals
    * deviate past a tolerance band (the data-quality/drift alert shape:
    * volume collapse, value spike).
    *
    * Engine shape: the chart runs over the AGGREGATED day-grain series,
    * never the raw fact — the groupBy collapses the firehose in one
    * shuffled pass (exact decimal partial sums), and the per-type window
    * then orders a calendar-bounded frame (≤ days × types rows at ANY
    * scale factor; the q_period_over_period argument for why an
    * unsalted per-type window is safe here and nowhere else).
    *
    * Exactness: daily value = exact DECIMAL(18,2) sum cast once; the
    * forecast's weights are compile-time dyadic literals 2^-1..2^-7 plus
    * a tail 2^-7 (they sum to exactly 1), each product is an exact
    * power-of-two scaling, and the eight-term sum is written as one
    * fixed LEFT-ASSOCIATIVE expression tree — IEEE addition is
    * deterministic, so both engines round identically at every node.
    * Deviation is one subtract; the alert flag compares |dev| against
    * an exact 2^-2 multiple of the forecast. No snapping needed.
    */
  def qEwmaAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(decSum2(col("value")).cast("double").as("v"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    // w_k = 2^-k for k=1..7, tail w_8 = 2^-7: Σ w_k = 1 exactly
    val terms = (1 to 8).map { k =>
      val wk = 1.0 / (1L << math.min(k, 7))
      lag(col("v"), k).over(w) * lit(wk)
    }
    val forecast = terms.reduceLeft(_ + _) // left-assoc, mirrored in SQL
    daily
      .select(col("event_type"), col("day"), col("v"), col("n_events"),
        forecast.as("forecast"),
        row_number().over(w).as("rn"))
      .filter(col("rn") > 8)
      .select(col("event_type"), col("day"), col("v"), col("n_events"),
        col("forecast"),
        (col("v") - col("forecast")).as("deviation"),
        (abs(col("v") - col("forecast")) >
          col("forecast") * lit(0.25)).cast("long").as("is_alert"))
      .orderBy(col("event_type"), col("day"))
  }
}
