package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.functions.Hanoi
import graft.plans.PlanParser

class StreamingStatsSpec extends SparkSpec {

  test("hanoi solve enumerates 2^n - 1 moves") {
    assert(Hanoi.solve(1) == 1)
    assert(Hanoi.solve(3) == 7)
    assert(Hanoi.solve(10) == 1023)
    assert(Hanoi.solve(0) == 0)
  }

  test("end-to-end streaming stats match the plan's closed form") {
    val planText =
      """sequence = [
        |  { type = fixed, value = 4, rate = 50, duration = 2 }
        |  { type = cycle, values = [6, 7], rate = 20, duration = 2 }
        |]""".stripMargin
    val plan = PlanParser.parse(planText)
    val expectedCounts = (0 until plan.duration.get)
      .flatMap(plan.rowsFor).groupBy(_._2)
      .map { case (v, l) => v -> l.size.toLong }

    val acc = mutable.Map.empty[Int, (Long, Long)] // value -> (cnt, sum)
    // metric = the value itself: deterministic, so sum/mean are checkable
    val q = StreamingStats.run(
      spark, planText,
      numStreams = 2,
      triggerMs = 50L,
      metricCol = df => df.withColumn("hanoi_ms",
        org.apache.spark.sql.functions.col("value").cast("long")),
      sink = (stats, _) =>
        stats.collect().foreach { r: Row =>
          val v = r.getInt(0)
          val (c0, s0) = acc.getOrElse(v, (0L, 0L))
          acc(v) = (c0 + r.getLong(2), s0 + r.getLong(3))
          assert(r.getDouble(4) == v.toDouble) // mean of constant metric
          assert(r.getDouble(5) == 0.0)        // stddev_pop of constant
        })
    try {
      q.processAllAvailable()
    } finally q.stop()
    val perValue = acc.view.mapValues(_._1).toMap
    val expectedBoth = expectedCounts.map { case (v, c) => v -> c * 2 } // 2 streams
    assert(perValue == expectedBoth)
    acc.foreach { case (v, (c, s)) => assert(s == c * v) }
  }

  test("event-time windowed stats partition the plan by 5 s window") {
    val planText =
      "sequence = [ { type = fixed, value = 3, rate = 40, duration = 12 } ]"
    val plan = PlanParser.parse(planText)
    val totalRows = (0 until plan.duration.get).map(plan.rowCountFor).sum

    val src = spark.readStream.format("plan-gen")
      .option("plan", planText).option("secondsPerTrigger", 4)
      .option("numPartitions", 2).load()
    val stats = StreamingStats.windowedStats(
      src.withColumn("hanoi_ms",
        org.apache.spark.sql.functions.col("value").cast("long")),
      windowLength = "5 seconds")
    val q = stats.writeStream.outputMode("complete")
      .format("memory").queryName("win_stats").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_stats").collect()
      // 12 plan-seconds → 5s windows [0,5) [5,10) [10,15): 3 windows
      assert(rows.length == 3, s"expected 3 windows, got ${rows.toSeq}")
      assert(rows.map(_.getLong(3)).sum == totalRows)
      // full windows carry 5 s × 40 rows/s
      assert(rows.map(_.getLong(3)).max == 200L)
      rows.foreach { r =>
        assert(r.getDouble(5) == 3.0) // mean of constant metric
        assert(r.getDouble(6) == 0.0) // stddev_pop of constant
      }
    } finally q.stop()
  }

  test("PID controller shrinks on slow batches, grows on fast ones") {
    val pid = new PidController(minRows = 10, maxRows = 100000)
    val slow = pid.next(1000, numRows = 1000, batchMs = 2000, triggerMs = 1000)
    assert(slow < 1000, s"slow batch should shrink limit, got $slow")
    pid.reset()
    val fast = pid.next(1000, numRows = 1000, batchMs = 200, triggerMs = 1000)
    assert(fast > 1000, s"fast batch should grow limit, got $fast")
    // convergence: repeatedly slow halves until floor, never below min
    pid.reset()
    var lim = 100000L
    (1 to 50).foreach { _ => lim = pid.next(lim, 1000, 5000, 1000) }
    assert(lim >= 10)
    assert(lim < 1000)
  }
}
