package graft.ops

/** Bounded task-retry orchestration (r15 — closes r14 "missing" #2): the
  * reference wraps every DAG task in `retries: 1, retry_delay`
  * (DAG_Project.py:17-20) so a transient failure re-runs the task once
  * before the run fails loudly. The engine's batch compositions
  * (q_datalake_pipeline chains extract→format→usage→export) had
  * transactional publishes but no retry-then-fail-loudly wrapper — a
  * flaky stage either killed the job on its first hiccup or (worse, if a
  * caller swallowed it) left a silent half-pipeline.
  *
  * Contract, matching the scheduler semantics it stands in for:
  *  - a stage body must be IDEMPOTENT under re-run — every Datalake
  *    write path already is (overwrite staging + atomic manifest swap),
  *    which is exactly why retry composes with the lake instead of
  *    needing its own rollback;
  *  - exhausted retries throw [[Pipeline.StageFailed]] naming the stage
  *    and attempt count, never a bare cause — the fail-loudly half;
  *  - the attempt count is RETURNED so pipelines can surface retry
  *    evidence (a stage quietly succeeding on attempt 3 every night is
  *    an incident report, not a success).
  */
object Pipeline {

  /** A stage exhausted its retry budget. Carries the LAST cause; earlier
    * attempts' causes are addSuppressed-chained for the post-mortem.
    */
  final class StageFailed(val stage: String, val attempts: Int,
      cause: Throwable)
    extends RuntimeException(
      s"pipeline stage '$stage' failed after $attempts attempt(s): " +
        s"${cause.getMessage}", cause)

  /** Run `body`, retrying up to `retries` additional times on any
    * non-fatal failure, sleeping `delayMs` between attempts (the
    * reference's retry_delay; 0 in tests). Returns (result, attempts
    * actually used — 1 means first try succeeded).
    */
  def retry[T](stage: String, retries: Int, delayMs: Long = 0L)(
      body: => T): (T, Int) = {
    require(retries >= 0, s"retries must be >= 0, got $retries")
    require(delayMs >= 0, s"delayMs must be >= 0, got $delayMs")
    var attempt = 0
    var earlier: List[Throwable] = Nil
    while (true) {
      attempt += 1
      try return (body, attempt)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt > retries) {
            val f = new StageFailed(stage, attempt, e)
            earlier.foreach(f.addSuppressed)
            throw f
          }
          earlier = e :: earlier
          if (delayMs > 0) Thread.sleep(delayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
