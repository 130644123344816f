package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionizeSpec extends SparkSpec {
  import Sessionize._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("cross-batch sessions close on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[Event]
    val sessions = Sessionize(
      in.toDS().withWatermark("ts", "1 second"), gapMs = 5000L)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 1 has two events in one session; user 2 one event
      in.addData(Event(1, ts(1000)), Event(1, ts(2000)), Event(2, ts(1000)))
      q.processAllAvailable()
      // batch 2: user 1 jumps past the gap → closes the first session AND
      // advances the watermark to 19000, past user 2's timeout (6000)
      in.addData(Event(1, ts(20000)))
      q.processAllAvailable()
      // batch 3: any new batch lets the pending timeout fire
      in.addData(Event(3, ts(21000)))
      q.processAllAvailable()

      val got = spark.table("sessions_out")
        .as[Session].collect().map(s =>
          (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
        .toSet
      assert(got.contains((1L, 1000L, 2000L, 2L)), s"gap-closed session missing: $got")
      assert(got.contains((2L, 1000L, 1000L, 1L)), s"timeout-closed session missing: $got")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sessions_out")
    }
  }

  test("in-batch events split into multiple sessions by gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[Event]
    val q = Sessionize(in.toDS().withWatermark("ts", "1 second"), gapMs = 1000L)
      .writeStream.format("memory").queryName("sessions_split")
      .outputMode(OutputMode.Append()).start()
    try {
      // one batch, one user, three sessions' worth of events (unsorted on
      // purpose — the operator sorts within the batch)
      in.addData(
        Event(7, ts(5000)), Event(7, ts(100)), Event(7, ts(600)),
        Event(7, ts(3000)))
      q.processAllAvailable()
      in.addData(Event(8, ts(50000))) // push watermark far ahead
      q.processAllAvailable()
      in.addData(Event(9, ts(51000))) // let the timeout batch fire
      q.processAllAvailable()

      val got = spark.table("sessions_split")
        .as[Session].collect()
        .filter(_.user_id == 7L)
        .map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events))
        .toSet
      assert(got === Set((100L, 600L, 2L), (3000L, 3000L, 1L), (5000L, 5000L, 1L)),
        s"got $got")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sessions_split")
    }
  }

  test("onBatch (window formulation) matches the streaming operator, including each key's final open session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val events = Seq(
      Event(1, ts(1000)), Event(1, ts(2000)), Event(1, ts(20000)),
      Event(2, ts(1000)),
      Event(7, ts(5000)), Event(7, ts(100)), Event(7, ts(600)), Event(7, ts(3000)))

    val batch = Sessionize.onBatch(events.toDF(), gapMs = 1000L)
      .as[Session].collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
      .toSet

    // streaming ground truth: feed everything, then push the watermark far
    // past every timeout so all sessions close
    val in = MemoryStream[Event]
    val q = Sessionize(in.toDS().withWatermark("ts", "1 second"), gapMs = 1000L)
      .writeStream.format("memory").queryName("sessions_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(Event(99, ts(500000)))
      q.processAllAvailable()
      in.addData(Event(98, ts(501000)))
      q.processAllAvailable()

      val streamed = spark.table("sessions_parity")
        .as[Session].collect()
        .filter(s => s.user_id != 99L && s.user_id != 98L)
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
        .toSet
      assert(batch === streamed, s"batch=$batch streamed=$streamed")
      // the final open session per key must be present in batch mode (the
      // old flatMapGroupsWithState delegation silently lost these)
      assert(batch.contains((1L, 20000L, 20000L, 1L)))
      assert(batch.contains((2L, 1000L, 1000L, 1L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sessions_parity")
    }
  }
}
