package graft.streaming

import scala.collection.mutable
import graft.SparkSpec
import graft.sources.RateLimitRegistry

/** The reference's signature experiment (scenario 2, test-runs-004): a
  * per-element cost spike mid-run, with PID backpressure adapting the
  * ingest limit so the query survives and recovers.
  */
class SpikeRecoverySpec extends SparkSpec {

  test("PID limit dips under a 4x cost spike and total delivery stays exact") {
    // value 7 sustainable, value 9 ≈ 4x cost (O(2^n) workload)
    val planText =
      """sequence = [
        |  { type = fixed, value = 7, rate = 2000, duration = 4 }
        |  { type = fixed, value = 9, rate = 2000, duration = 4 }
        |  { type = fixed, value = 7, rate = 2000, duration = 4 }
        |]""".stripMargin
    val key = "spike-spec"
    val pid = new PidController(kp = 0.5, ki = 0.1, minRows = 200, maxRows = 100000)
    val listener = new PidRateListener(key, triggerMs = 100L, initialLimit = 8000L, pid)
    spark.streams.addListener(listener)
    val limitTrace = mutable.ArrayBuffer.empty[Long]
    var processed = 0L
    try {
      val q = StreamingStats.run(
        spark, planText,
        triggerMs = 100L,
        rateLimitKey = Some(key),
        secondsPerTrigger = 4,
        sink = (stats, _) => {
          limitTrace += listener.currentLimit
          processed += stats.collect().map(_.getLong(2)).sum
        })
      q.processAllAvailable()
      q.stop()
    } finally {
      spark.streams.removeListener(listener)
      RateLimitRegistry.clear(key)
    }
    assert(processed == 3 * 4 * 2000L, s"lost or duplicated rows: $processed")
    // the controller reacted: the limit moved below its initial value at
    // some point (batches at 100 ms triggers always overrun with this
    // workload, so the PID must shrink)
    assert(limitTrace.nonEmpty)
    assert(limitTrace.min < 8000L, s"PID never adapted: $limitTrace")
  }
}
