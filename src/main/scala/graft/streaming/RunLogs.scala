package graft.streaming

import java.io.PrintWriter
import java.nio.file.{Files, Path}
import java.text.SimpleDateFormat
import java.util.Date

import org.apache.spark.sql.DataFrame

/** Self-emitted run logs in the reference testbed's line formats, closing
  * the reference's full analysis loop over the NEW engine's own runs:
  * run → log files → log parsers ([[graft.operators.RefLogs]]) →
  * per-second tables → gnuplot graph synthesis. Previously the loop only
  * closed over the reference repo's archived runs; with this writer a
  * fresh streaming run produces the same artifacts.
  *
  * Line formats (must stay parseable by both RefLogs and the reference's
  * own log-processor):
  *  - `run.log`
  *    - "batch result: <ms>\t<batchTime>\t<value>\t<streamId>\t<count>\t<sum>\t<mean>\t<stddev>"
  *      (reference SimpleStreamingApp.scala:106-108, parsed by
  *      RunLogData.scala:68,86-91)
  *    - "time = <t>, # records = <n>, processing time = <ms>, scheduling
  *      delay = <ms>" (reference streaming PID trace, RunLogData.scala:69,93-98)
  *  - `receiver_0.log`
  *    - "<ts> INFO BlockGenerator: Received a new rate limit for <stream> : <limit>."
  *      (reference ReceiverLogData.scala:21)
  *    - "<ts> INFO ReceiverSupervisorImpl: stream <id> congestion: dropping
  *      with ratio of <r>." (reference ReceiverLogData.scala:22)
  *
  * Driver-side by design: these are the reference's driver/executor log
  * prints — a few lines per batch over already-aggregated stats, never
  * per-row data. Thread-safe; flushes per line so a crashed run still
  * leaves parseable logs.
  */
final class RunLogWriter(val dir: Path) extends AutoCloseable {
  Files.createDirectories(dir)
  private val runLog = new PrintWriter(
    Files.newBufferedWriter(dir.resolve("run.log")), true)
  private val receiverLog = new PrintWriter(
    Files.newBufferedWriter(dir.resolve("receiver_0.log")), true)

  /** log4j timestamp the reference parsers expect (RefLogs.TsComma). */
  private val tsFmt = new SimpleDateFormat("yyyy-MM-dd HH:mm:ss,SSSZ")
  private def ts: String = tsFmt.synchronized { tsFmt.format(new Date) }

  def batchResult(
      batchEpochMs: Long, value: Int, streamId: Int,
      count: Long, sumMs: Long, meanMs: Double, stddevMs: Double): Unit =
    runLog.synchronized {
      runLog.println(
        f"$ts INFO batch result: ${System.currentTimeMillis()}%d\t$batchEpochMs%d\t$value%d\t$streamId%d\t$count%d\t$sumMs%d\t$meanMs%.3f\t$stddevMs%.3f")
    }

  def pid(timeMs: Long, records: Long, processingMs: Long, delayMs: Long): Unit =
    runLog.synchronized {
      runLog.println(
        s"$ts INFO time = $timeMs, # records = $records, processing time = $processingMs, scheduling delay = $delayMs")
    }

  def feedback(streamId: Int, limit: Long): Unit =
    receiverLog.synchronized {
      receiverLog.println(
        s"$ts INFO BlockGenerator: Received a new rate limit for $streamId : $limit.")
    }

  def ratio(streamId: Int, r: Double): Unit =
    receiverLog.synchronized {
      receiverLog.println(
        s"$ts INFO ReceiverSupervisorImpl: stream $streamId congestion: dropping with ratio of $r.")
    }

  override def close(): Unit = { runLog.close(); receiverLog.close() }
}

object RunLogs {
  /** Wrap a [[StreamingStats.run]] sink so each batch's aggregated stats
    * rows are also logged as reference-format "batch result:" lines. The
    * collect is over the per-batch (value, stream) aggregate — a handful
    * of rows, the same driver-side print the reference app does. */
  def loggingSink(
      writer: RunLogWriter,
      inner: (DataFrame, Long) => Unit = (_, _) => ()): (DataFrame, Long) => Unit =
    (stats, batchId) => {
      val now = System.currentTimeMillis()
      stats.collect().foreach { r =>
        writer.batchResult(
          now,
          r.getAs[Number]("value").intValue,
          r.getAs[Number]("stream_id").intValue,
          r.getAs[Number]("cnt").longValue,
          r.getAs[Number]("sum_ms").longValue,
          r.getAs[Number]("mean_ms").doubleValue,
          Option(r.getAs[Number]("stddev_ms")).map(_.doubleValue).getOrElse(0.0))
      }
      inner(stats, batchId)
    }
}
