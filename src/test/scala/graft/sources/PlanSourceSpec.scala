package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.PlanParser

class PlanSourceSpec extends SparkSpec {

  private val planText =
    """sequence = [
      |  { type = fixed, value = 3, rate = 100, duration = 2 }
      |  { type = ramp, startRate = 10, endRate = 50, value = 5, duration = 3 }
      |  { type = cycle, values = [1, 2], rate = 10, duration = 2 }
      |]""".stripMargin
  private val plan = PlanParser.parse(planText)
  private val expectedTotal =
    (0 until plan.duration.get).map(s => plan.rowsFor(s).size).sum

  test("batch read through the DSv2 source matches the direct generator") {
    val viaSource = spark.read.format("plan-gen").option("plan", planText).load()
    val direct = PlanGenerator.generate(spark, plan)
    assert(viaSource.count() == expectedTotal)
    assert(viaSource.count() == direct.count())
    val a = viaSource.groupBy("value").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = direct.groupBy("value").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a == b)
    // event_time parity too (FixedPhase at rate 100 ⇒ first bucket at 0ms)
    assert(viaSource.agg(min("event_time")).head.getTimestamp(0).getTime ==
      direct.agg(min("event_time")).head.getTimestamp(0).getTime)
  }

  test("streaming read delivers the whole plan exactly once") {
    val q = spark.readStream.format("plan-gen")
      .option("plan", planText)
      .option("secondsPerTrigger", "2")
      .load()
      .writeStream.format("memory").queryName("plan_all").start()
    try {
      q.processAllAvailable()
      val got = spark.table("plan_all")
      assert(got.count() == expectedTotal)
      val perValue = got.groupBy("value").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val expected = (0 until plan.duration.get)
        .flatMap(plan.rowsFor).groupBy(_._2).map { case (v, l) => v -> l.size.toLong }
      assert(perValue == expected)
    } finally q.stop()
  }

  test("maxRowsPerTrigger caps micro-batch size (admission control)") {
    val q = spark.readStream.format("plan-gen")
      .option("plan", planText)
      .option("secondsPerTrigger", "10") // would take everything without cap
      .option("maxRowsPerTrigger", "120")
      .load()
      .writeStream.format("memory").queryName("plan_capped").start()
    try {
      q.processAllAvailable()
      assert(spark.table("plan_capped").count() == expectedTotal)
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(sizes.length >= 3, s"expected several capped batches, got ${sizes.toSeq}")
      // one second may overshoot the cap (second = offset granularity);
      // rate is ≤100/s here so the bound is cap + 100
      assert(sizes.forall(_ <= 220), s"batch exceeded cap+slack: ${sizes.toSeq}")
    } finally q.stop()
  }

  test("dynamic rate limit from the registry is honored") {
    RateLimitRegistry.set("spec-key", 50)
    try {
      val q = spark.readStream.format("plan-gen")
        .option("plan", planText)
        .option("secondsPerTrigger", "10")
        .option("rateLimitKey", "spec-key")
        .load()
        .writeStream.format("memory").queryName("plan_dyn").start()
      try {
        q.processAllAvailable()
        assert(spark.table("plan_dyn").count() == expectedTotal)
        val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
        assert(sizes.forall(_ <= 150), s"dynamic cap ignored: ${sizes.toSeq}")
      } finally q.stop()
    } finally RateLimitRegistry.clear("spec-key")
  }
}
