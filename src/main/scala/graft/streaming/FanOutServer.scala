package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import graft.operators.LogAnalytics.formatters

/** The reference testbed's demand-driven TCP fan-out delivery server —
  * the PRODUCER egress with real per-client drop accounting
  * (reference DataGeneratorActor.scala:241-284, SubscriberActor semantics):
  *
  *  - clients connect over TCP and extend credit with `REQ <n>` lines
  *    (logged as the reference's "received request" events);
  *  - each burst fans out to every client: delivered up to the client's
  *    credit, remainder DROPPED and logged ("unable to deliver"), credit
  *    zeroed on a partial delivery — exactly the reference's
  *    `SendInts` branch structure;
  *  - delivered values stream to the socket newline-joined, the
  *    reference's wire format (ConnectionManagerActor.scala:209).
  *
  * Drop/request events emit through [[formatters]] so
  * [[graft.operators.LogAnalytics.droppedValues]]/`requestedValues` close
  * the loop: run → logs → tables → per-second sums equal live counters.
  *
  * This is deliberately a single-node service, like the reference's actor
  * system: it models the testbed (load-generator) side, not a Spark
  * operator. The Spark side connects via [[batchSink]], which streams each
  * micro-batch through `toLocalIterator` — admission control bounds the
  * per-trigger volume, so the driver never holds more than one trigger's
  * data. Cluster-scale egress to MANY sinks is the per-partition fan-out
  * covered by FanOutSpec (T10); a single TCP endpoint is a funnel by
  * definition.
  */
final class FanOutServer(log: String => Unit,
    runLog: Option[RunLogWriter] = None) {

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  private final class Client(val id: Int, socket: Socket) {
    val demand = new AtomicLong(0L)
    val delivered = new AtomicLong(0L)
    val dropped = new AtomicLong(0L)
    private val out = socket.getOutputStream

    // set when the demand reader sees EOF or an error: the peer is gone
    // even if it never extended credit, so the next burst unregisters it
    // instead of inflating its dropped counter forever (the write path
    // alone never notices a zero-credit disconnect — it never writes)
    @volatile private var dead = false

    private val reader = new Thread(() => {
      try {
        val in = new BufferedReader(new InputStreamReader(socket.getInputStream))
        var line = in.readLine()
        while (line != null) {
          val n = line.trim.stripPrefix("REQ").trim
          if (n.nonEmpty && n.forall(_.isDigit)) {
            demand.addAndGet(n.toLong)
            log(formatters.req(System.currentTimeMillis(), n.toLong, id))
          }
          line = in.readLine()
        }
      } catch { case _: Throwable => () } // client hung up
      finally dead = true
    }, s"fanout-client-$id-demand")
    reader.setDaemon(true)
    reader.start()

    /** One burst, reference semantics (DataGeneratorActor.scala:259-276).
      * Returns false when the client's socket is gone (caller unregisters
      * it — a dead peer must not fail the whole fan-out, and leaving it
      * registered would inflate drop counters forever).
      *
      * Credit is consumed with `addAndGet(-credit)`, never `set(0)`: the
      * reader thread registers new `REQ` credit concurrently, and a blind
      * zero would erase (already-logged) credit that arrived between the
      * read and the write — the counters↔log reconciliation
      * FanOutDropSpec asserts would diverge permanently. */
    def send(values: Seq[Int], timeMs: Long): Boolean = synchronized {
      if (dead) { close(); return false }
      val credit = demand.get()
      try {
        if (credit == 0L) {
          dropped.addAndGet(values.size.toLong)
          log(formatters.drop(timeMs, values.size.toLong, id))
          // reference receiver congestion-strategy line: full drop, ratio 1.0
          runLog.foreach(_.ratio(id, 1.0))
        } else if (values.size > credit) {
          write(values.take(credit.toInt))
          delivered.addAndGet(credit)
          dropped.addAndGet(values.size - credit)
          log(formatters.drop(timeMs, values.size - credit, id))
          runLog.foreach(_.ratio(id,
            math.rint((values.size - credit).toDouble / values.size * 1000) / 1000))
          demand.addAndGet(-credit)
        } else {
          write(values)
          delivered.addAndGet(values.size.toLong)
          demand.addAndGet(-values.size.toLong)
        }
        true
      } catch {
        case _: java.io.IOException => close(); false
      }
    }

    private def write(vs: Seq[Int]): Unit = {
      out.write(vs.mkString("", "\n", "\n").getBytes)
      out.flush()
    }

    def close(): Unit = try socket.close() catch { case _: Throwable => () }
  }

  private val clients = new ConcurrentHashMap[Int, Client]()
  private val nextId = new AtomicInteger(0)
  private val running = new AtomicBoolean(true)

  private val acceptor = new Thread(() => {
    try while (running.get()) {
      val s = server.accept()
      val c = new Client(nextId.getAndIncrement(), s)
      clients.put(c.id, c)
    } catch { case _: Throwable => () } // closed
  }, "fanout-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Fan one burst out to every connected client (stable id order);
    * clients whose sockets are gone are unregistered, not fatal. */
  def send(values: Seq[Int], timeMs: Long = System.currentTimeMillis()): Unit =
    clients.values.asScala.toSeq.sortBy(_.id).foreach { c =>
      if (!c.send(values, timeMs)) clients.remove(c.id)
    }

  /** client id → (delivered, dropped) live counters. */
  def stats: Map[Int, (Long, Long)] =
    clients.asScala.map { case (id, c) => id -> (c.delivered.get, c.dropped.get) }.toMap

  /** client id → outstanding credit (spec synchronization). */
  def demands: Map[Int, Long] =
    clients.asScala.map { case (id, c) => id -> c.demand.get }.toMap

  def clientCount: Int = clients.size

  /** foreachBatch adapter: deliver each micro-batch's `value` column as one
    * burst. `toLocalIterator` keeps driver memory at one partition, and the
    * source's admission control bounds the trigger volume. */
  def batchSink: (DataFrame, Long) => Unit = (batch, _) => {
    val values = batch
      .select(org.apache.spark.sql.functions.col("value").cast("int"))
      .toLocalIterator().asScala.map(_.getInt(0)).toSeq
    if (values.nonEmpty) send(values)
  }

  def close(): Unit = {
    running.set(false)
    try server.close() catch { case _: Throwable => () }
    clients.values.asScala.foreach(_.close())
  }
}
