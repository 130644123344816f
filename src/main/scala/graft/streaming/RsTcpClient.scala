package graft.streaming

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Wire-compatible subscriber client for the reference's RS-over-TCP
  * protocol (reference toy-rs-tcp TcpPublisher.scala:18-79,
  * internal/Subscription.scala:12-16, TcpSubscriber.scala:47-65):
  *
  *  - downstream data: newline-terminated value lines, publisher → client;
  *  - demand back-channel: newline-terminated BARE longs, client →
  *    publisher (`request(n)` extends credit by n — reactive-streams
  *    demand semantics over a raw socket).
  *
  * [[FanOutServer]] speaks the superset of this protocol (its demand
  * reader takes bare longs as well as the `REQ n` form), so this client
  * interoperates with both graft's fan-out delivery and the original
  * testbed's publisher side. Synchronous reads — the client is a test/
  * tooling surface, like the reference's toy project, not a Spark
  * operator; Spark-side ingest of this wire format is the socket source
  * (S1) plus admission control (S2).
  */
final class RsTcpClient(host: String, port: Int) extends AutoCloseable {

  private val socket = new Socket(host, port)
  socket.setSoTimeout(15000)
  private val out: OutputStream = socket.getOutputStream
  private val in = new BufferedReader(
    new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))

  /** Extend demand by `n` (reactive-streams `Subscription.request`): the
    * wire form is the bare long, newline-terminated. */
  def request(n: Long): Unit = {
    require(n > 0, s"demand must be positive, got $n")
    out.write(s"$n\n".getBytes(StandardCharsets.UTF_8))
    out.flush()
  }

  /** Blocking read of the next value line; None on publisher EOF
    * (`onComplete` in the RS mapping). */
  def next(): Option[String] = Option(in.readLine())

  /** Read exactly `n` values (blocking); shorter only on EOF. */
  def take(n: Int): Seq[String] =
    Iterator.continually(next()).take(n).takeWhile(_.isDefined).flatten.toSeq

  /** `Subscription.cancel`: just close the socket, like the reference. */
  def cancel(): Unit = close()

  override def close(): Unit = {
    try socket.close() catch { case _: Throwable => () }
  }
}
