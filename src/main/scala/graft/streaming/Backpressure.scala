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
    controller: PidController = new PidController())
    extends StreamingQueryListener {

  @volatile private var limit: Long = initialLimit
  @volatile private var queryId: java.util.UUID = _
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
    limit = controller.next(limit, p.numInputRows, batchMs, triggerMs)
    RateLimitRegistry.set(key, limit)
  }
}
