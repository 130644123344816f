package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1 end-to-end: the reference's primary ingestion path —
  * `format("socket")` text lines → tolerant int parse → per-batch stats
  * (reference SimpleStreamingApp.scala:66-81: socketTextStream +
  * Try(parseInt) + stats). */
class SocketSourceSpec extends SparkSpec {

  test("socket source feeds the parse → per-batch stats pipeline") {
    val server = new java.net.ServerSocket(0)
    val feeder = new Thread(() => {
      try {
        val s = server.accept()
        val out = new java.io.PrintWriter(s.getOutputStream, true)
        (1 to 120).foreach(i => out.println(((i % 4) + 5).toString))
        out.println("not-a-number") // P1 parse tolerance
        out.flush()
        Thread.sleep(60000) // hold the connection until the spec finishes
      } catch { case _: Throwable => () }
    }, "socket-feeder")
    feeder.setDaemon(true)
    feeder.start()

    val total = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .format("socket")
      .option("host", "localhost")
      .option("port", server.getLocalPort)
      .load()
      .select(expr("try_cast(value AS int)").as("value"))
      .filter(col("value").isNotNull)
      .withColumn("stream_id", lit(0))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val stats = StreamingStats.batchStats(
          batch.withColumn("hanoi_ms", col("value").cast("long")))
        val s = stats.agg(sum("cnt")).head
        if (!s.isNullAt(0)) { total.addAndGet(s.getLong(0)); () }
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (total.get() < 120L && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(total.get() === 120L) // the bad line was filtered, ints counted
    } finally {
      q.stop()
      server.close()
    }
  }
}
