package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch streaming sessionization: gap-based sessions maintained in
  * keyed state with `flatMapGroupsWithState` + event-time timeout.
  *
  * The batch analog (`q_sessionize`, window-function gap flags) needs the
  * whole history per key; this operator carries only ONE open-session
  * buffer per key across micro-batches and emits a session exactly once,
  * when it closes — either a later event arrives past the gap, or the
  * watermark passes session end + gap (timeout). That is the state shape
  * that survives unbounded streams: O(keys) state, not O(events).
  *
  * Scale: state is hash-partitioned by key (user), so state size and
  * per-trigger work distribute across executors; the watermark bounds
  * state lifetime. (reference has no stateful ops — SURVEY §2.9 T7 — this
  * is the engine's capability the testbed pipeline would need next.)
  */
object Sessionize {

  /** One input event. */
  final case class Event(user_id: Long, ts: java.sql.Timestamp)

  /** Open-session state carried across batches. */
  final case class SessionState(startMs: Long, lastMs: Long, events: Long)

  /** A closed session. */
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** Sessionize a (possibly streaming) dataset of events. The caller sets
    * the watermark on `ts` before grouping (required for event-time
    * timeouts). Events inside one batch are sorted in-memory per key —
    * per-key per-trigger volumes are micro-batch-sized. */
  def apply(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed lastMs + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, new java.sql.Timestamp(s.startMs),
                new java.sql.Timestamp(s.lastMs), s.events))
          } else {
            val sorted = it.map(_.ts.getTime).toArray.sorted
            val closed = Vector.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t), events = s.events + 1))
                case Some(s) =>
                  closed += Session(userId, new java.sql.Timestamp(s.startMs),
                    new java.sql.Timestamp(s.lastMs), s.events)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // close via watermark once no event can extend the session
                state.setTimeoutTimestamp(s.lastMs + gapMs)
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }

  /** Batch-mode entry over the events table shape (`user_id`, `ts`).
    *
    * NOT the stateful operator: in batch execution
    * `flatMapGroupsWithState` never fires timeouts, so each key's final
    * open session would silently vanish. Batch mode has the whole history
    * anyway, so the gap-flag window formulation (one shuffle + one
    * in-partition sort) is both correct and cheaper; the spec pins it to
    * the streaming operator's output on identical data. */
  def onBatch(df: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    df.select(col("user_id"), col("ts"))
      .withColumn("_prev", lag("ts", 1).over(w))
      .withColumn("_new", when(col("_prev").isNull ||
        (unix_millis(col("ts")) - unix_millis(col("_prev"))) > gapMs, 1L).otherwise(0L))
      .withColumn("_sid", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("_sid"))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
  }
}
