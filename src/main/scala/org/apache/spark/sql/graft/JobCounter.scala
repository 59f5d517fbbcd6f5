package org.apache.spark.sql.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Counts Spark job submissions on a SparkContext, for the bench's
  * floor-calibration evidence (round-11 verdict #1): the driver box shows an
  * ADDITIVE per-job-submission floor (~0.2s in degraded regimes) that
  * dominates sub-second queries, and the artifact must be able to separate
  * "plan got slower" from "box adds a fixed tax per job". The bench measures
  * the floor with trivial calibration probes and divides each query's time
  * into `jobs × floor + work` — which needs an exact count of how many jobs
  * each timed query submitted.
  *
  * Lives under `org.apache.spark` because draining the async listener bus
  * (`SparkContext.listenerBus.waitUntilEmpty`) is `private[spark]`: listener
  * events post asynchronously, so reading the counter without a drain could
  * attribute a query's last jobs to the NEXT query. Counting is global per
  * context — correct here because the bench runs queries strictly
  * sequentially and all `StreamReplay.subSession`s share the root context.
  */
object JobCounter {
  private val count = new AtomicLong(0L)
  private val drainTimeoutCount = new AtomicLong(0L)
  @volatile private var installed = false

  /** Idempotent: one listener per JVM no matter how often the bench calls. */
  def install(sc: SparkContext): Unit = synchronized {
    if (!installed) {
      sc.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          count.incrementAndGet(); ()
        }
      })
      installed = true
    }
  }

  /** Drain pending listener events, then read the cumulative job count.
    * The drain can time out under extreme load (10s default) — fall back to
    * a short sleep and read anyway: an off-by-a-few jobs count degrades one
    * evidence column, never the timed result itself.
    */
  def settledCount(sc: SparkContext): Long = {
    try sc.listenerBus.waitUntilEmpty()
    catch {
      case _: java.util.concurrent.TimeoutException =>
        // the fallback read can attribute a query's trailing job-start
        // events to the NEXT query — silent skew in exactly the degraded
        // regimes the floor calibration targets. Count every timeout so
        // the bench can surface it in the floor meta (r12 ADVICE): a
        // floor-adjusted reading from a run with drain timeouts is
        // lower-confidence and must say so in the artifact. ONLY a real
        // drain timeout lands here (r13 ADVICE: the old catch-all
        // swallowed InterruptedException, delaying cancellation and
        // inflating the counter with non-timeout causes).
        drainTimeoutCount.incrementAndGet()
        Thread.sleep(100)
      case _: InterruptedException =>
        // restore the interrupt for the caller's cancellation machinery;
        // the count read below is still best-effort-correct
        Thread.currentThread().interrupt()
    }
    count.get()
  }

  /** How many [[settledCount]] calls fell back on a drain timeout since
    * JVM start — 0 on a healthy run.
    */
  def drainTimeouts: Long = drainTimeoutCount.get()
}
