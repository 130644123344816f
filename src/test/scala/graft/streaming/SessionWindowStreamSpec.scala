package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The batch gate `q_session_window` claims its operator "powers
  * streaming session aggregation" — this spec is that claim: the same
  * `session_window()` call on a live stream, sessions emitted exactly
  * once when the watermark passes their close. */
class SessionWindowStreamSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("streaming session_window emits merged sessions on watermark close") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[Ev]
    val q = in.toDF()
      .withWatermark("ts", "0 seconds")
      .groupBy(col("event_type"), session_window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"),
        col("session_window.start").as("s"), col("session_window.end").as("e"),
        col("n_events"))
      .writeStream.format("memory").queryName("sw_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // two bursts 5 s apart merge (gap < 10 s); nothing can emit yet
      in.addData(Ev("click", ts(100), 1.0), Ev("click", ts(105), 1.0))
      q.processAllAvailable()
      assert(spark.table("sw_out").isEmpty, "session emitted before close")

      // an event far past the gap advances the watermark beyond the
      // first session's end → exactly that session is finalized
      in.addData(Ev("click", ts(200), 1.0))
      q.processAllAvailable()

      val rows = spark.table("sw_out").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(rows.toSeq == Seq(("click", ts(100), ts(115), 2L)),
        s"got ${rows.toSeq}")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sw_out")
    }
  }
}
