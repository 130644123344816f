package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Click(user_id: Long, click_ts: Timestamp)
case class Purchase(p_user: Long, p_ts: Timestamp, amount: Double)

class StreamJoinSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  test("purchases join the clicks inside their attribution window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val q = StreamJoin.attribution(clicks.toDF(), purchases.toDF(), "10 seconds")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: two clicks, one in-window, one too old for the purchase at
      // t=15s; user 2: click AFTER the purchase (must not attribute);
      // cross-user pairs must not leak
      clicks.addData(
        Click(1, ts(1000)), Click(1, ts(9000)), Click(2, ts(20000)))
      purchases.addData(
        Purchase(1, ts(15000), 9.99), Purchase(2, ts(15000), 5.0))
      q.processAllAvailable()

      val got = spark.table("attr_out")
        .select("user_id", "click_ts", "p_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSet
      assert(got === Set((1L, 9000L)),
        s"only user 1's in-window click attributes, got $got")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS attr_out")
    }
  }
}
