package graft.streaming

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TestPlan

class PlanEndpointSpec extends AnyFunSuite {

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val c = new URL(s"http://localhost:$port$path").openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    (code, new String(in.readAllBytes(), StandardCharsets.UTF_8))
  }

  test("POST /plan parses, assigns ids, hands the plan to the callback; bad plans 400") {
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, TestPlan)]
    val ep = new PlanEndpoint((id, p, _) => got.synchronized { got += ((id, p)); () })
    try {
      val (c1, b1) = post(ep.port, "/plan",
        "sequence = [ { type = fixed, value = 7, rate = 100, duration = 2 } ]")
      assert(c1 === 202 && b1.trim === "1")
      val (c2, _) = post(ep.port, "/plan",
        "sequence = [ { type = noop, duration = 1 } ]")
      assert(c2 === 202)
      assert(got.size === 2)
      assert(got.head._2.phases.nonEmpty)

      val (c3, b3) = post(ep.port, "/plan", "this is not a plan")
      assert(c3 === 400 && b3.startsWith("bad plan:"))
      assert(got.size === 2)

      val list = new URL(s"http://localhost:${ep.port}/plans").openStream()
      assert(new String(list.readAllBytes(), StandardCharsets.UTF_8).trim === "1\n2")
    } finally ep.close()
  }

  test("index page serves HTML naming the app and the accepted plan count") {
    val ep = new PlanEndpoint((_, _, _) => ())
    try {
      post(ep.port, "/plan", "sequence = [ { type = noop, duration = 1 } ]")
      val html = new String(
        new URL(s"http://localhost:${ep.port}/").openStream().readAllBytes(),
        StandardCharsets.UTF_8)
      assert(html.contains("<title>graft testbed</title>"))
      assert(html.contains("accepted plans: 1"))
      assert(html.contains("<li>plan 1</li>"))
      val c = new URL(s"http://localhost:${ep.port}/nope").openConnection()
        .asInstanceOf[HttpURLConnection]
      assert(c.getResponseCode === 404)
    } finally ep.close()
  }

  test("a throwing callback yields 500, not a hung client, and the id is not listed") {
    val ep = new PlanEndpoint((_, _, _) => throw new IllegalStateException("query start failed"))
    try {
      val (code, body) = post(ep.port, "/plan",
        "sequence = [ { type = noop, duration = 1 } ]")
      assert(code === 500 && body.contains("query start failed"))
      val list = new URL(s"http://localhost:${ep.port}/plans").openStream()
      assert(new String(list.readAllBytes(), StandardCharsets.UTF_8).trim.isEmpty,
        "a rejected plan must not appear in /plans")
    } finally ep.close()
  }
}
