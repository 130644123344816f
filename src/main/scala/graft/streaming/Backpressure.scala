package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.sources.RateLimitRegistry

/** PID rows-per-trigger controller — the reference system's raison d'être
  * (PID rate estimation for backpressure), re-expressed for Structured
  * Streaming: instead of a receiver rate limit, the controller steers the
  * admission-control row cap of the plan-gen source through
  * [[RateLimitRegistry]].
  * (reference behavior: SimpleStreamingApp.scala:42-44 enables the
  * estimator; SubscriberInputDStream.scala:101-137 turns rate into demand.)
  *
  * Classic PID on processing rate: after each batch, error = how far the
  * batch overran (or underran) the trigger interval, normalized. The
  * control output multiplies the current limit. Pure core
  * ([[PidController.next]]) for unit testing; the listener is wiring.
  */
final class PidController(
    val kp: Double = 0.5,
    val ki: Double = 0.1,
    val kd: Double = 0.0,
    val minRows: Long = 100L,
    val maxRows: Long = 10000000L) extends Serializable {

  private var integral = 0.0
  private var lastError = 0.0

  /** New row limit given the last batch's size and duration vs the trigger
    * interval. err > 0 ⇒ batch too slow ⇒ shrink. */
  def next(currentLimit: Long, numRows: Long, batchMs: Long, triggerMs: Long): Long = {
    if (numRows <= 0 || batchMs <= 0) return currentLimit
    val err = (batchMs.toDouble - triggerMs) / triggerMs
    integral = (integral * 0.9) + err // leaky integral, bounded history
    val deriv = err - lastError
    lastError = err
    val factor = 1.0 - (kp * err + ki * integral + kd * deriv)
    val bounded = math.max(0.2, math.min(2.0, factor)) // sane step bounds
    math.max(minRows, math.min(maxRows, (currentLimit * bounded).toLong))
  }

  def reset(): Unit = { integral = 0.0; lastError = 0.0 }
}

/** Rate-based PID estimator with the semantics of Spark Streaming's
  * `PIDRateEstimator` — the estimator the reference system's experiments
  * steer and compare (reference `test-runs-004/README.md` documents spike
  * runs at PID(-1, -0.2, 0) vs PID(-1, 0, 0); enabled via
  * `SimpleStreamingApp.scala:42-44`, receiver plumbing
  * `SubscriberInputDStream.scala:43-48`). Unlike [[PidController]] (a
  * factor controller on batch overrun), this computes a target ingest RATE
  * (rows/s) from three terms:
  *
  *  - proportional: the change in processing rate since the last batch —
  *    how far the current admitted rate overshoots what the system just
  *    demonstrated it can process;
  *  - integral: the accumulated backlog, expressed as scheduling delay —
  *    rows queued behind schedule, converted to a rate via
  *    `schedulingDelay * processingRate / batchInterval`. This is the term
  *    whose absence the reference's P-only runs document: without it the
  *    rate converges to the sustainable level but the backlog accumulated
  *    during a spike is never drained — the query runs permanently late;
  *  - derivative: the error slope, damping the first reaction to a sudden
  *    capacity change.
  *
  * Pure and deterministic (time is a parameter) for unit testing; the
  * listener wiring is [[PidRateListener]] with an `estimator` mode.
  */
final class PidRateEstimator(
    val batchIntervalMs: Long,
    val proportional: Double = 1.0,
    val integral: Double = 0.2,
    val derivative: Double = 0.0,
    val minRate: Double = 100.0) extends Serializable {

  private var firstRun = true
  private var latestTimeMs = -1L
  private var latestRate = -1.0
  private var latestError = -1.0

  /** Target rate (rows/s) after a batch of `numElements` rows that took
    * `processingDelayMs` to process and started `schedulingDelayMs` behind
    * schedule. None until the SECOND valid batch: the first valid batch
    * only seeds `latestRate = processingRate` with `latestError = 0` and
    * emits nothing — the upstream estimator's contract. Seeding the error
    * from the -1.0 sentinel instead (the round-6 bug) made the second
    * batch's dError a huge spurious positive, so any derivative gain
    * slashed the rate toward minRate with no capacity change. */
  def compute(
      timeMs: Long,
      numElements: Long,
      processingDelayMs: Long,
      schedulingDelayMs: Long): Option[Double] = this.synchronized {
    if (timeMs <= latestTimeMs || numElements == 0 || processingDelayMs == 0) None
    else {
      val dtSec = (timeMs - latestTimeMs).toDouble / 1000
      val processingRate = numElements.toDouble / processingDelayMs * 1000
      val error = latestRate - processingRate
      val historicalError = schedulingDelayMs.toDouble * processingRate / batchIntervalMs
      val dError = (error - latestError) / dtSec
      latestTimeMs = timeMs
      if (firstRun) {
        firstRun = false
        latestRate = processingRate
        latestError = 0.0
        None
      } else {
        val newRate = math.max(minRate,
          latestRate - proportional * error - integral * historicalError - derivative * dError)
        latestRate = newRate
        latestError = error
        Some(newRate)
      }
    }
  }

  def reset(): Unit = this.synchronized {
    firstRun = true; latestTimeMs = -1L; latestRate = -1.0; latestError = -1.0
  }
}

/** Streaming listener applying a [[PidController]] to a rate-limit key.
  *
  * Listeners are session-global, so the listener must be pinned to ONE
  * query: call [[attach]] with the started query (or its id) — progress
  * and termination events from every other query (warmups, fan-out
  * siblings) are ignored. Until attached, the first query whose progress
  * arrives self-attaches, preserving the start-listener-then-query flow
  * for single-query callers. */
final class PidRateListener(
    key: String,
    triggerMs: Long,
    initialLimit: Long,
    controller: PidController = new PidController(),
    estimator: Option[PidRateEstimator] = None,
    runLog: Option[RunLogWriter] = None,
    streamId: Int = 0)
    extends StreamingQueryListener {

  @volatile private var limit: Long = initialLimit
  @volatile private var queryId: java.util.UUID = _
  // estimator-mode cadence tracking: scheduling delay = how far behind the
  // trigger cadence the batch completed (the DStream schedulingDelay analog)
  private var cadenceStartMs = -1L
  private var nBatches = 0L
  RateLimitRegistry.set(key, initialLimit)

  def currentLimit: Long = limit

  /** Pin this controller to the query it should steer. */
  def attach(query: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    queryId = query.id
  def attach(id: java.util.UUID): Unit = queryId = id

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    if (queryId == null || queryId == e.id) RateLimitRegistry.clear(key)
  override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    if (queryId == null) queryId = p.id // self-attach to the first reporter
    if (queryId != p.id) return
    val batchMs = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
    val now = System.currentTimeMillis()
    if (cadenceStartMs < 0) cadenceStartMs = now
    nBatches += 1
    val schedDelay = math.max(0L, now - (cadenceStartMs + nBatches * triggerMs))
    val prevLimit = limit
    estimator match {
      case Some(est) =>
        est.compute(now, p.numInputRows, batchMs, schedDelay).foreach { rate =>
          limit = math.max(1L, (rate * triggerMs / 1000).toLong)
        }
      case None =>
        limit = controller.next(limit, p.numInputRows, batchMs, triggerMs)
    }
    RateLimitRegistry.set(key, limit)
    // self-analytics: the reference's PID trace + rate-limit feedback lines
    runLog.foreach { w =>
      if (p.numInputRows > 0) w.pid(now, p.numInputRows, batchMs, schedDelay)
      if (limit != prevLimit) w.feedback(streamId, limit)
    }
  }
}
