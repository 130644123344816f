package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket
import org.scalatest.funsuite.AnyFunSuite

/** RS-over-TCP wire parity: the client must speak the reference protocol
  * (bare-long demand lines upstream, newline values downstream) against
  * both a raw publisher socket and graft's [[FanOutServer]]. */
class RsTcpClientSpec extends AnyFunSuite {

  test("demand lines arrive as bare longs; values stream back newline-framed") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(new InputStreamReader(s.getInputStream))
      val out = new PrintWriter(s.getOutputStream, true)
      // reference publisher loop: read demand, emit that many values
      val demand = in.readLine()
      assert(demand.matches("\\d+"), s"demand must be a bare long, got '$demand'")
      (1 to demand.toInt).foreach(i => out.println(i * 10))
      s.close()
    })
    t.setDaemon(true); t.start()
    val client = new RsTcpClient("localhost", server.getLocalPort)
    try {
      client.request(4)
      assert(client.take(4) === Seq("10", "20", "30", "40"))
      assert(client.next() === None) // publisher closed → onComplete
    } finally { client.close(); server.close() }
  }

  test("interop with FanOutServer: credit-capped delivery, remainder dropped") {
    val server = new FanOutServer(_ => ())
    val client = new RsTcpClient("localhost", server.port)
    try {
      client.request(5)
      val deadline = System.currentTimeMillis() + 10000
      while (server.demands.values.sum < 5L &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)

      server.send(Seq(1, 2, 3, 4, 5, 6, 7, 8)) // burst > credit
      assert(client.take(5).map(_.toInt) === Seq(1, 2, 3, 4, 5))
      val (delivered, dropped) = server.stats.values.head
      assert(delivered === 5L && dropped === 3L)
      assert(server.demands.values.head === 0L) // credit consumed
    } finally { client.close(); server.close() }
  }
}
