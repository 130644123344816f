package graft.streaming

import graft.SparkSpec

/** T10 delivery fan-out: the same generated stream feeds N independent
  * output queries (the reference sends identical data to every connected
  * client; here each writeStream query is a "client" with its own offsets
  * — one lagging client never blocks another).
  */
class FanOutSpec extends SparkSpec {

  test("two sinks over one source receive identical, complete data") {
    val planText =
      "sequence = [ { type = fixed, value = 5, rate = 300, duration = 3 } ]"
    val src = spark.readStream.format("plan-gen")
      .option("plan", planText).load()
    val q1 = src.writeStream.format("memory").queryName("fan_a").start()
    val q2 = src.groupBy("value").count()
      .writeStream.format("memory").queryName("fan_b")
      .outputMode("complete").start()
    try {
      q1.processAllAvailable()
      q2.processAllAvailable()
      val a = spark.table("fan_a").count()
      val b = spark.table("fan_b").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(a == 900L, s"raw sink got $a")
      assert(b == Map(5 -> 900L), s"agg sink got $b")
    } finally { q1.stop(); q2.stop() }
  }
}
