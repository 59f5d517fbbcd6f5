package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line.
  *
  * Each query is forced through the built-in `noop` sink so the FULL result
  * (every column, every row) is materialized on the executors — `count()`
  * would let Catalyst prune projections and undercount real work.
  *
  * Each query's headline time is the MIN of `SPARK_GRAFT_BENCH_PASSES`
  * (default 3) in-process passes: a single timed pass on a shared box
  * records whatever contention spike happened to coincide with it (round 5's
  * artifact carried a 9.1s reading for a query whose steady state is 1.6s),
  * whereas the per-query min over a few passes converges on the plan's real
  * cost — which is what the cluster-capacity question actually needs.
  *
  * Decision-grade artifact (round-7 verdict): the min alone can't
  * distinguish "one good pass among noise" from "stable" — the JSON line
  * therefore also carries per-query MEDIANS (`queries_median`), the box's
  * load average before/after, and pass count, so a reader can judge how
  * contended the run was without re-running it. Solo-run discipline still
  * applies (BASELINE.md notes); `nice`/`taskset` pinning must wrap the JVM
  * from the shell — in-process renice needs privileges this sandbox lacks.
  */
object Bench {

  /** Median over the successful pass times (average-of-middle-two for even
    * counts — stable and unsurprising for the 3-5 pass runs we do).
    */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) Double.NaN
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Round-over-round artifacts must stay comparable: warn loudly (stderr,
    * plus a field in the JSON line) when the contiguous BENCH_r{N}.json
    * series on disk has holes — the round-6 gap made the r6/r7 comparison
    * partially unreconstructable (round-7 verdict #4).
    */
  private def missingRounds(): Seq[Int] = {
    val here = new java.io.File(".").listFiles()
    if (here == null) return Nil
    val rounds = here.flatMap { f =>
      "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(f.getName).map(_.group(1).toInt)
    }.sorted
    if (rounds.isEmpty) Nil
    else (rounds.min to rounds.max).filterNot(rounds.contains)
  }

  /** Name prefix for the floor-calibration probes interleaved into each
    * round-robin pass; excluded from `queries` totals, aggregated into the
    * `floor` field instead.
    */
  private val CalibPrefix = "_calib_"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = os.getSystemLoadAverage
    val gaps = missingRounds()
    if (gaps.nonEmpty)
      System.err.println(s"BENCH WARNING: missing round artifacts: " +
        gaps.map(n => f"BENCH_r$n%02d.json").mkString(", ") +
        " — round-over-round comparison has holes")
    val spark: SparkSession = GraftSession.get("graft-bench")
    org.apache.spark.sql.graft.JobCounter.install(spark.sparkContext)
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run for local perf
    // iteration on specific queries. A restricted run writes its summary
    // to BENCH_SUMMARY_PARTIAL.json (see below) so it can never replace
    // the full-registry round artifact.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val base = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Untimed warmup at the smallest SF: compiles every plan shape's
    // generated code and initializes shuffle/broadcast/write machinery, so
    // the timed passes below measure steady-state throughput (what a long-
    // running cluster job sees), not one-time JVM costs.
    base.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    try calibFn(spark, warmDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Round-robin pass interleaving (round-10 verdict #1): run pass 1 of
    // EVERY query, then pass 2 of every query, and so on — instead of a
    // query's N passes back-to-back. A box-level contention window (or a
    // session degraded by the preceding streaming block) then poisons at
    // most ONE pass of each query, and min-of-N recovers; back-to-back
    // passes let a single bad window poison all N readings of the queries
    // that happened to run inside it (r9/r10 both produced spurious ≥2×
    // outliers in the alphabetical tail right after the 13-query
    // q_stream_* block for exactly this reason).
    //
    // Floor calibration (round-11 verdict #1): the driver box intermittently
    // adds a fixed ~0.2s tax to EVERY job submission, which reads as a 2×
    // "regression" on sub-second queries while the plans are unchanged. To
    // let the artifact itself separate the two, a trivial probe (range(1)
    // through the same noop sink — one job, near-zero work) is interleaved
    // every ~25 queries of every pass, timed exactly like a query. Its
    // per-job median IS the floor under the run's actual conditions, and
    // each query's measured job-submission count then yields a
    // floor-adjusted time: max(0, min − jobs×floor).
    val ordered = base.zipWithIndex.flatMap { case (q, i) =>
      if (i % 25 == 0) Seq(f"$CalibPrefix$i%03d" -> calibFn, q) else Seq(q)
    }
    val attemptsByQuery =
      Array.fill(ordered.length)(Vector.empty[(Double, Boolean, Long)])
    val sc = spark.sparkContext
    for (pass <- 1 to passes; (((name, fn), i)) <- ordered.zipWithIndex) {
      val j0 = org.apache.spark.sql.graft.JobCounter.settledCount(sc)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAIL $name (pass $pass): ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      val jobs = org.apache.spark.sql.graft.JobCounter.settledCount(sc) - j0
      attemptsByQuery(i) = attemptsByQuery(i) :+ ((dt, ok, jobs))
      streamHygiene(spark, name)
    }
    // Floor = median over all calibration samples of (probe time / probe
    // jobs). Median, not min: the floor is an ADDITIVE tax whose typical
    // (not best-case) value is what inflates every other query's reading.
    val calibSamples = ordered.zipWithIndex.collect {
      case ((name, _), i) if name.startsWith(CalibPrefix) =>
        attemptsByQuery(i).collect { case (t, true, j) => t / j.max(1L) }
    }.flatten
    val floor = if (calibSamples.nonEmpty) median(calibSamples) else 0.0
    val results = ordered.zipWithIndex.collect {
      case ((name, _), i) if !name.startsWith(CalibPrefix) =>
      val attempts = attemptsByQuery(i)
      // only SUCCESSFUL passes compete for the min: a fast-failing pass
      // (say 0.05s on a transient error) must not record an artificially
      // small time no honest run can match. All passes failed → record the
      // slowest attempt so the number reads as a penalty, never a win.
      val good = attempts.collect { case (t, true, _) => t }
      val dt = if (good.nonEmpty) good.min else attempts.map(_._1).max
      val med = if (good.nonEmpty) median(good) else attempts.map(_._1).max
      // jobs from the pass that achieved the min (job counts are stable
      // across passes; the min pass is the one the headline time describes)
      val jobs =
        attempts.collect { case (t, true, j) => (t, j) }
          .sortBy(_._1).headOption.map(_._2).getOrElse(0L)
      val adj = (dt - jobs * floor).max(0.0)
      System.err.println(
        f"BENCH $name: $dt%.2fs min / $med%.2fs median / $adj%.2fs floor-adj " +
          s"($jobs jobs, ${good.length}/${attempts.length} ok, " +
          s"of ${attempts.map(a => f"${a._1}%.2f").mkString("/")})")
      (name, dt, med, jobs, adj)
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val meds = results.map { case (k, _, m, _, _) => "\"" + k + "\":" + f"$m%.3f" }
      .mkString("{", ",", "}")
    val jobsJson = results.map { case (k, _, _, j, _) => "\"" + k + "\":" + j }
      .mkString("{", ",", "}")
    val adjs = results.map { case (k, _, _, _, a) => "\"" + k + "\":" + f"$a%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalMed = results.map(_._3).sum
    val totalAdj = results.map(_._5).sum
    val loadEnd = os.getSystemLoadAverage
    // drain_timeouts: settledCount's listener-bus drain fell back to a
    // sleep-and-read N times — per-query job counts (and thus the
    // floor-adjusted column) from such a run are lower-confidence, and the
    // artifact must say so rather than let a degraded-box reading pass as
    // clean evidence (r12 ADVICE).
    val drainTimeouts = org.apache.spark.sql.graft.JobCounter.drainTimeouts
    val floorMeta = f""""floor":{"sec_per_job":$floor%.4f,""" +
      f""""samples":${calibSamples.length},""" +
      f""""min":${if (calibSamples.nonEmpty) calibSamples.min else 0.0}%.4f,""" +
      f""""max":${if (calibSamples.nonEmpty) calibSamples.max else 0.0}%.4f,""" +
      f""""drain_timeouts":$drainTimeouts}"""
    val meta = f"""{"passes":$passes,"load_avg_start":$loadStart%.2f,""" +
      f""""load_avg_end":$loadEnd%.2f,"cpus":${os.getAvailableProcessors},""" +
      floorMeta + "," +
      s""""missing_artifacts":${gaps.map(n => f""""BENCH_r$n%02d.json"""").mkString("[", ",", "]")}}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_median":$meds,"queries_jobs":$jobsJson,"queries_floor_adj":$adjs,"total_median":$totalMed%.3f,"total_floor_adj":$totalAdj%.3f,"meta":$meta,"sf":"$sfDir"}""")
    // The driver's artifact keeps only the LAST ~2,000 stdout chars, so the
    // full per-query line above gets truncated mid-key (BENCH_r07/r08 both
    // recorded "parsed": null). The FINAL line is therefore a compact
    // summary (≤ ~500 chars) that always survives the tail capture:
    // totals + the worst query vs its BASELINE.md best-ever column, both
    // raw and floor-adjusted.
    // update_baseline.py keys on '"queries"' so it still reads the full
    // line; both lines carry the same totals.
    val worst = worstVsBaseline(
      results.map { case (k, v, _, _, _) => k -> v }, "worst_vs_baseline")
    val worstAdj = worstVsBaseline(
      results.map { case (k, _, _, _, a) => k -> a }, "worst_vs_baseline_adj",
      excludeAdditiveFloor = true)
    val summary = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.length},"sf":"$sfDir","total_min":$total%.3f,"total_median":$totalMed%.3f,"total_floor_adj":$totalAdj%.3f,"floor_sec_per_job":$floor%.4f,"passes":$passes,"load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f$worst$worstAdj}"""
    println(summary)
    // Belt-and-braces for the stdout parse (round-9 verdict #2): the same
    // summary lands on disk, so even a future harness change that trails
    // extra stdout after the run leaves a machine-readable artifact.
    // A RESTRICTED run (SPARK_GRAFT_BENCH_ONLY set) must never overwrite
    // the round artifact: an n=4 summary replacing the 150-query one makes
    // every round-over-round total comparison meaningless (r12 ADVICE) —
    // partial runs land in a clearly-named side file instead.
    val summaryFile =
      if (only.isDefined) "BENCH_SUMMARY_PARTIAL.json" else "BENCH_SUMMARY.json"
    if (only.isDefined)
      System.err.println("BENCH NOTE: restricted run (SPARK_GRAFT_BENCH_ONLY)" +
        s" — summary written to $summaryFile, round artifact untouched")
    try java.nio.file.Files.write(java.nio.file.Paths.get(summaryFile),
      (summary + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"BENCH WARNING: $summaryFile not written: $e") }
    spark.stop()
  }

  /** Post-query session-hygiene check (round-10 verdict #1b): a streaming
    * query that leaks its StreamingQuery (or its RocksDB state-store
    * maintenance threads) keeps burning CPU under every LATER timed pass,
    * silently inflating unrelated queries. After each pass of a
    * `q_stream_*` row, assert the session is quiescent — and REMEDIATE
    * (stop leaked streams) so one leak can't poison the rest of the run.
    * Violations print loudly to stderr; the bench keeps going because the
    * artifact with a flagged warning beats no artifact.
    */
  private def streamHygiene(spark: SparkSession, after: String): Unit = {
    if (!after.startsWith("q_stream")) return
    // across ALL sessions: StreamingQueryManager is per-session state and
    // every stream row runs on a StreamReplay.subSession — the root
    // session's `streams.active` is empty BY CONSTRUCTION and auditing
    // only it made this check dead code (review finding)
    val active = graft.streaming.StreamReplay.activeStreamsAnywhere(spark)
    if (active.nonEmpty) {
      System.err.println(
        s"BENCH HYGIENE VIOLATION after $after: ${active.length} stream(s) " +
          s"still active (${active.map(_.name).mkString(", ")}) — stopping them")
      active.foreach { q => try q.stop() catch { case _: Throwable => () } }
    }
    // RocksDB/HDFS state-store maintenance threads: Spark keeps ONE shared
    // (idle) maintenance pool alive after the first stateful query — that
    // is legitimate. What indicates a leak is GROWTH: every stream query
    // adding threads that never retire. Track the high-water mark and flag
    // only increases beyond it.
    // Thread.getAllStackTraces.keySet sees EVERY live thread; Thread
    // .enumerate only walks the calling thread's group and subgroups, so
    // state-store pools created in other groups were invisible and the
    // high-water comparison could under-count (round-11 ADVICE).
    import scala.jdk.CollectionConverters._
    val maint = Thread.getAllStackTraces.keySet.asScala.count { t =>
      t != null && t.isAlive && {
        val nm = t.getName.toLowerCase
        nm.contains("state-store-maintenance") || nm.contains("rocksdb")
      }
    }
    if (maint > maintHighWater && maintHighWater > 0)
      System.err.println(
        s"BENCH HYGIENE WARNING after $after: state-store maintenance " +
          s"threads grew $maintHighWater -> $maint (possible leak)")
    maintHighWater = maintHighWater.max(maint)
  }

  /** High-water mark of live state-store maintenance threads; see
    * [[streamHygiene]].
    */
  private var maintHighWater = 0

  /** The trivial floor probe: one job submission, near-zero work, through
    * the SAME noop sink as every real query — so its time is the fixed
    * per-job-submission cost under the run's actual conditions.
    */
  private val calibFn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, _) => s.range(1).toDF("calib")

  /** `,"<key>":{...}` for the compact summary line: the registered query
    * with the highest value/baseline ratio against BASELINE.md's best-ever
    * column — the per-query regression gate the judge applies, surfaced in
    * the artifact itself. Called twice: raw mins (`worst_vs_baseline`) and
    * floor-adjusted (`worst_vs_baseline_adj`). Empty string when BASELINE.md
    * (or any comparable row) is absent so the bench never fails on a
    * missing file.
    */
  /** Delta (seconds) under which a ≥2× ratio on a sub-second query is the
    * documented ADDITIVE PER-JOB FLOOR, not a data-path regression: the
    * r11-adjudicated signature is +0.1–0.2s per job that vanishes on
    * heavier queries (BASELINE.md floor notes; r13 verdict #8 asked for
    * the adjudication to be machine-readable instead of re-argued each
    * round). update_baseline.py stamps the same threshold as `ƒ` tags.
    */
  private val FloorDeltaSec = 0.25

  private def worstVsBaseline(mins: Seq[(String, Double)], key: String,
      excludeAdditiveFloor: Boolean = false): String = try {
    val path = java.nio.file.Paths.get("BASELINE.md")
    if (!java.nio.file.Files.exists(path)) "" else {
    val cell = "([0-9.]+)[†‡*]?".r
    // explicit UTF-8: the footnote glyphs are multi-byte and the JVM
    // default charset under sbt is not guaranteed to decode them
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files
      .readAllLines(path, java.nio.charset.StandardCharsets.UTF_8)
      .asScala.iterator
      .filter(_.startsWith("| q"))
      .flatMap { l =>
        val cs = l.stripPrefix("|").split("\\|").map(_.trim)
        cs.last match {
          case cell(v) => Some(cs.head.stripPrefix("`").stripSuffix("`") -> v.toDouble)
          case _ => None
        }
      }.toMap
    val all = mins.flatMap { case (k, v) =>
      base.get(k).filter(_ > 0).map(b => (k, v, b, v / b)) }
    // the floor-adjusted ranking drops rows whose regression is additive-
    // small: a 0.1s query reading 0.3s is the box's per-job floor (the
    // `ƒ` tag class), and letting it top worst_vs_baseline_adj buries the
    // real signal every round (r13 verdict #8)
    val rated =
      if (excludeAdditiveFloor) all.filterNot {
        case (_, v, b, r) => r >= 2.0 && v - b <= FloorDeltaSec }
      else all
    // name every excluded query, not just a count (r14 review): the
    // floor class is an adjudication, and an adjudication the artifact
    // doesn't itemize can't be audited against the ƒ-tagged baseline —
    // update_baseline.py additionally gates each tag on the PLANDUMP
    // plan line being unchanged, so a named row here that is NOT ƒ-tagged
    // there is exactly the plan-changed genuine regression to chase.
    val excluded =
      if (excludeAdditiveFloor) {
        val names = all.filterNot(rated.contains).map(_._1).sorted
        val arr =
          if (names.isEmpty) "[]"
          else names.mkString("[\"", "\",\"", "\"]")
        s""","floor_excluded":${names.length}""" +
          s""","floor_excluded_queries":$arr"""
      } else ""
    if (rated.isEmpty) ""
    else {
      val (k, v, b, r) = rated.maxBy(_._4)
      f""","$key":{"query":"$k","min":$v%.3f,"baseline":$b%.3f,"ratio":$r%.2f$excluded}"""
    }
    }
  } catch {
    // the summary line must ALWAYS print — a malformed baseline table
    // degrades the artifact, never kills the run after 100+ timed queries
    case e: Throwable =>
      System.err.println(s"BENCH WARNING: baseline compare skipped: $e")
      ""
  }
}
