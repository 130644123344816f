package graft.streaming

import graft.SparkSpec
import graft.operators.LogAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

/** S7/T4 end-to-end: generator → [[FanOutServer]] TCP delivery with real
  * demand-capped drops → DROP/REQ log lines → LogAnalytics tables →
  * per-second sums, all reconciled against the server's live counters and
  * the bytes actually received on the client sockets.
  */
class FanOutDropSpec extends SparkSpec {

  private def readInts(s: Socket, n: Int): Seq[Int] = {
    s.setSoTimeout(10000)
    val r = new BufferedReader(new InputStreamReader(s.getInputStream))
    (1 to n).map(_ => r.readLine().toInt)
  }

  test("a disconnected client is unregistered; the fan-out survives") {
    val server = new FanOutServer(_ => ())
    val alive = new Socket("localhost", server.port)
    val dying = new Socket("localhost", server.port)
    try {
      new PrintWriter(alive.getOutputStream, true).println("REQ 100")
      new PrintWriter(dying.getOutputStream, true).println("REQ 100")
      val deadline = System.currentTimeMillis() + 10000
      while (server.demands.values.sum < 200L &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(server.clientCount === 2)

      dying.close()
      // the TCP stack may swallow the first write after a peer close —
      // keep sending until the server notices the broken pipe
      val gone = System.currentTimeMillis() + 10000
      while (server.clientCount > 1 && System.currentTimeMillis() < gone) {
        server.send(Seq(1, 2, 3)); Thread.sleep(20)
      }
      assert(server.clientCount === 1, "dead client still registered")
      // the surviving client kept receiving
      val (delivered, _) = server.stats.values.head
      assert(delivered >= 3L)
      val got = readInts(alive, 3)
      assert(got === Seq(1, 2, 3))
    } finally {
      alive.close(); dying.close(); server.close()
    }
  }

  test("a zero-credit disconnect is unregistered too (reader-EOF path)") {
    val server = new FanOutServer(_ => ())
    val alive = new Socket("localhost", server.port)
    // never sends REQ: zero credit means the write path never touches its
    // socket, so only the demand reader's EOF can notice the disconnect —
    // without the dead flag this client would sit registered forever,
    // inflating its dropped counter on every burst
    val silent = new Socket("localhost", server.port)
    try {
      new PrintWriter(alive.getOutputStream, true).println("REQ 100")
      val deadline = System.currentTimeMillis() + 10000
      while (server.demands.values.sum < 100L &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(server.clientCount === 2)

      silent.close()
      val gone = System.currentTimeMillis() + 10000
      while (server.clientCount > 1 && System.currentTimeMillis() < gone) {
        server.send(Seq(7)); Thread.sleep(20)
      }
      assert(server.clientCount === 1, "zero-credit dead client still registered")
      assert(readInts(alive, 1) === Seq(7))
    } finally {
      alive.close(); silent.close(); server.close()
    }
  }

  test("producer drop accounting closes the loop: run → logs → tables → sums match") {
    val logLines = scala.collection.mutable.ArrayBuffer.empty[String]
    val server = new FanOutServer(l => logLines.synchronized { logLines += l; () })
    val c0 = new Socket("localhost", server.port)
    val c1 = new Socket("localhost", server.port)
    try {
      new PrintWriter(c0.getOutputStream, true).println("REQ 10000")
      new PrintWriter(c1.getOutputStream, true).println("REQ 150")
      val deadline = System.currentTimeMillis() + 10000
      while ((server.clientCount < 2 || server.demands.values.sum < 10150L) &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(server.demands.values.sum === 10150L, s"demand registration: ${server.demands}")

      // 3 plan-seconds × 100 values of 7; one burst per trigger second
      val q = spark.readStream.format("plan-gen")
        .option("plan", "sequence = [ { type = fixed, value = 7, rate = 100, duration = 3 } ]")
        .option("numPartitions", 2)
        .load()
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) => server.batchSink(batch, id) }
        .start()
      q.processAllAvailable()
      q.stop()

      // live counters: client 0 has credit for everything; client 1's 150
      // credit caps delivery regardless of burst boundaries
      val stats = server.stats
      assert(stats(0) === ((300L, 0L)), s"client 0: $stats")
      assert(stats(1) === ((150L, 150L)), s"client 1: $stats")

      // the wire really carried the values (reference newline format)
      assert(readInts(c0, 300).forall(_ == 7))
      assert(readInts(c1, 150).forall(_ == 7))

      // log → table loop (LogAnalytics droppedValues/requestedValues)
      import spark.implicits._
      val lines = logLines.synchronized { logLines.toSeq }.toDF("value")
      val drops = LogAnalytics.droppedValues(lines)
      val reqs = LogAnalytics.requestedValues(lines)
      val dropByClient = drops.groupBy("clientId").agg(sum("count").as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(dropByClient === Map(1 -> 150L), s"drop table: $dropByClient")
      assert(reqs.agg(sum("count")).head.getLong(0) === 10150L)
      // per-second rollup preserves totals (reference TestData.scala:20-26)
      assert(LogAnalytics.perSecond(drops).agg(sum("count")).head.getLong(0) === 150L)
    } finally {
      c0.close(); c1.close(); server.close()
    }
  }
}
