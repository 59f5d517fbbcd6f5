package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.Agg._
import graft.sources.Tables

/** User-journey analytics over the events stream: ordered-step funnels,
  * cohort retention, and calendar gap-fill — the product-analytics layer the
  * reference's Kibana dashboards imply (index_to_es.py feeds dashboards;
  * these are the standard queries behind them, re-expressed as Spark plans).
  *
  * Scale shape shared by all three: everything is keyed by `user_id`, so ONE
  * shuffle on user_id serves every window/aggregate; at 100 TB an events
  * table bucketed by user_id makes the whole family exchange-free.
  */
object JourneyQueries {

  /** Ordered three-step funnel signup → click → purchase: each step must
    * happen at-or-after the previous step's FIRST occurrence (the strict
    * product-funnel rule, not mere set membership). Three chained
    * whole-partition window minima over the SAME user_id partitioning —
    * Catalyst plans one exchange and three WindowExec passes, no joins, no
    * second shuffle. The final per-user collapse reuses the partitioning.
    */
  def qFunnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
    val staged = e
      .withColumn("signup_ts",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("first_click_ts",
        min(when(col("event_type") === "click" &&
          col("ts") >= col("signup_ts"), col("ts"))).over(w))
      .withColumn("first_purchase_ts",
        min(when(col("event_type") === "purchase" &&
          col("ts") >= col("first_click_ts"), col("ts"))).over(w))
    staged
      .groupBy(col("user_id"))
      .agg(
        max(col("signup_ts")).as("signup_ts"),
        max(col("first_click_ts")).as("first_click_ts"),
        max(col("first_purchase_ts")).as("first_purchase_ts"))
      .filter(col("signup_ts").isNotNull)
      .withColumn("stage",
        when(col("first_purchase_ts").isNotNull, "purchased")
          .when(col("first_click_ts").isNotNull, "clicked")
          .otherwise("signed_up"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention matrix: users grouped by their first-activity day,
    * counted on each later day they return. retention = exact-int ÷
    * exact-int. The cohort-size side is tiny (one row per cohort day) →
    * broadcast.
    *
    * Plan shape: the fact path rides ONE user_id shuffle — an explicit
    * `repartition(user_id)` whose HashPartitioning satisfies the clustered
    * distribution of the (user_id, day) distinct, the per-user window
    * minimum AND the day-0 size derivation (vs the naive
    * distinct→groupBy→self-join form: three differently-keyed exchanges of
    * the full grid). The only other full-grid exchange is the final
    * (cohort, offset) cell aggregate, which partial-aggregates map-side
    * into #cohorts×#offsets groups. cohort = window min over the
    * partitioning; sizes = the grid rows where day == cohort_day (exactly
    * one per user — their first day), a branch that re-reads the scan but
    * counts only #cohorts rows.
    */
  def qRetentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .repartition(col("user_id"))
      .distinct()
    val w = Window.partitionBy(col("user_id"))
    val grid = ud.withColumn("cohort_day", min(col("day")).over(w))
    val sizes = grid.filter(col("day") === col("cohort_day"))
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    grid
      // BIGINT offset: Spark's datediff is INT, DuckDB's is BIGINT — the
      // driver hash is type-sensitive (SURVEY §4), so widen here
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Calendar gap-fill + forward-fill: densify each user's daily activity to
    * a full date range (`sequence` explode — scan-side, no shuffle), then
    * carry the last observed daily total forward across the gaps
    * (`last(..., ignoreNulls)` over a running frame) and measure staleness.
    * This is the standard feature-store preparation for time-series models
    * (no gaps, explicit staleness). The explode fans out ~span rows per
    * user BEFORE the window shuffle, so reducers see the dense grid evenly.
    */
  def qGapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables.events(spark, dir))

  /** Hard cap on the per-user densified span. The `sequence(d0, d1)`
    * explode emits span+1 rows per user with NO inherent bound: one user
    * with a 30-year span emits ~11k rows; ONE corrupt millennium timestamp
    * emits millions and can OOM a task. ~20 years of daily activity is the
    * ceiling of plausible real data — beyond it the cause is data
    * corruption, and the right behavior is the vec_quantize pattern: fail
    * LOUDLY at the offending row, not silently densify garbage.
    */
  val MaxGapFillSpanDays = 7305 // 20 years

  private[graft] def gapFill(events: DataFrame,
      maxSpanDays: Int = MaxGapFillSpanDays): DataFrame = {
    // ONE explicit user_id shuffle feeds everything: the daily aggregate,
    // the per-user span, the densify join (both sides co-partitioned from
    // the same exchange) and the forward-fill window. At small SF the
    // optimizer still broadcasts the daily side (fine — it fits); the
    // repartition's point is the 100 TB shape, where daily cannot
    // broadcast and the co-partitioned join needs NO additional exchange
    // — pinned in JourneySpec with broadcast disabled.
    val daily = events
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"),
        decSum2(col("value")).cast("double").as("day_total"))
    // span guard: raise_error sits in the dead branch of the cap check, so
    // the happy path costs one datediff comparison per user and a corrupt
    // span kills the job with the offending user in the message
    val calendar = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"),
          when(datediff(col("d1"), col("d0")) <= maxSpanDays, col("d1"))
            .otherwise(raise_error(concat(
              lit("gap-fill span overflow: user "), col("user_id"),
              lit(" spans "), datediff(col("d1"), col("d0")),
              lit(s" days (cap $maxSpanDays) — corrupt timestamp?")))
              .cast("date")))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    calendar.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("day_total"), ignoreNulls = true).over(w).as("filled_total"),
        datediff(col("day"),
          last(when(col("n").isNotNull, col("day")), ignoreNulls = true)
            .over(w)).cast("long").as("days_since_active"),
        col("n").isNotNull.as("is_active"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Typed JSON extraction from the semi-structured `props` column:
    * `from_json` with an explicit schema (codegen'd Jackson parse, one pass
    * per row — the idiomatic Spark form; get_json_object re-parses per
    * field). Pure projection: no shuffle, prunes to two columns at the
    * scan. Malformed/missing keys become NULL (PERMISSIVE), flagged not
    * dropped — the data-lake contract for schema-on-read.
    */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(col("event_id"),
        from_json(col("props"), StructType.fromDDL("k INT")).getField("k").as("k"))
      .select(col("event_id"), col("k"),
        col("k").isNotNull.as("has_k"),
        // decade bucket in pure int arithmetic (k - k%10): identical
        // semantics in both engines (double-divide-then-cast is not —
        // DuckDB CAST rounds where Spark truncates)
        (col("k") - (col("k") % lit(10))).as("k_decade"))
      .orderBy(col("event_id"))
  }

  /** First-order Markov transition matrix over event types (round 8):
    * P(next | current) per user journey. One `lead` window on the family's
    * shared user_id partitioning (ordered by ts, event_id — the unique
    * deterministic order), then a groupBy onto the tiny (#types²)-row
    * transition table; the row-normalizing total is a second window over
    * THAT table, so the only corpus-sized exchange is the user_id shuffle
    * every Journey query already pays (zero with a user_id-bucketed
    * table). Null event types are filtered before the window on BOTH
    * engines — a typed transition out of an untyped event is undefined.
    * p = exact-int / exact-int in double: reduction-order-free, so the
    * driver hash-checks it without any snapping.
    */
  def qMarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur_type"))
      .withColumn("next_type", lead(col("cur_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = steps.groupBy(col("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("cur_type"))).cast("double"))
      .orderBy(col("cur_type"), col("next_type"))
  }

  /** Top-20 session journeys: gap-30min sessions (the shared
    * [[graft.ops.Sessionize]] numbering), each session's ordered
    * event-type sequence joined into a path string, ranked by session
    * count. The session window, the per-session position cap, and the
    * ordered path collect all ride the ONE user_id exchange; the path
    * count is a second (tiny — #distinct paths) shuffle, and the top-20 is
    * TakeOrderedAndProject, never a global sort.
    *
    * Scale honesty: paths are capped at the first 64 events per session
    * (mirrored in the oracle) — bot sessions are unbounded, and an uncapped
    * collect_list is exactly the skew trap the 100 TB design must refuse.
    */
  def qTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val sess = graft.ops.Sessionize
      .withSessionSeq(e, col("user_id"), col("ts"), col("event_id"))
    val bySess = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val paths = sess
      .withColumn("pos", row_number().over(bySess))
      .filter(col("pos") <= 64 && col("event_type").isNotNull)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(unix_micros(col("ts")).as("u"),
            col("event_id").as("i"), col("event_type").as("t")))),
          s => s.getField("t")), ">").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }
}
