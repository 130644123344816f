package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.plans.{PlanParser, TestPlan}

/** S11 — the reference testbed's HTTP control plane (its Play app's
  * `POST /plan` accepting HOCON plan text, reference
  * `Application.postPlan`), re-expressed on the JDK's built-in HTTP
  * server: no framework, no extra dependency, same contract.
  *
  *   - `POST /plan` with a plan body → parse; on success hand the
  *     [[TestPlan]] (and the raw text, which [[StreamingStats.run]]
  *     takes verbatim) to the supplied callback and reply `202 <id>`;
  *     a parse failure replies `400` with the error.
  *   - `GET /plans` → the ids accepted so far, one per line.
  *
  * Control plane only — data never flows through HTTP. The callback runs
  * on the serving thread; callers that start Spark queries should hand
  * off to their own executor if submission must not block the endpoint.
  */
final class PlanEndpoint(onPlan: (Long, TestPlan, String) => Unit) {

  private val ids = new AtomicLong(0L)
  private val accepted = scala.collection.mutable.ArrayBuffer.empty[Long]

  private val server = HttpServer.create(new InetSocketAddress(0), 0)
  def port: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/plan", (ex: HttpExchange) =>
    if (ex.getRequestMethod != "POST") respond(ex, 405, "POST only\n")
    else {
      val text = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      scala.util.Try(PlanParser.parse(text)) match {
        case scala.util.Success(plan) =>
          val id = ids.incrementAndGet()
          // the callback runs on the serving thread: a throw (e.g. query
          // start failure) must still produce an HTTP response, and the id
          // is only listed once the hand-off succeeded
          scala.util.Try(onPlan(id, plan, text)) match {
            case scala.util.Success(_) =>
              accepted.synchronized { accepted += id; () }
              respond(ex, 202, s"$id\n")
            case scala.util.Failure(e) =>
              respond(ex, 500, s"plan rejected: ${e.getMessage}\n")
          }
        case scala.util.Failure(e) =>
          respond(ex, 400, s"bad plan: ${e.getMessage}\n")
      }
    })

  server.createContext("/plans", (ex: HttpExchange) =>
    respond(ex, 200, accepted.synchronized(accepted.mkString("", "\n", "\n"))))

  // the Play app's index page (reference testbed Application.index /
  // ApplicationSpec.scala:14-30): a minimal HTML surface naming the app
  // and linking the plan listing
  server.createContext("/", (ex: HttpExchange) =>
    if (ex.getRequestURI.getPath != "/") respond(ex, 404, "not found\n")
    else {
      val ids = accepted.synchronized(accepted.toList)
      val items = ids.map(id => s"<li>plan $id</li>").mkString
      respond(ex, 200,
        s"""<!DOCTYPE html><html><head><title>graft testbed</title></head>
           |<body><h1>graft streaming testbed</h1>
           |<p>POST a plan to <code>/plan</code>; accepted plans: ${ids.size}</p>
           |<ul>$items</ul>
           |<p><a href="/plans">plain-text plan list</a></p></body></html>
           |""".stripMargin)
    })

  server.start()

  def close(): Unit = server.stop(0)
}
