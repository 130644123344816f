package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.TestPlan

/** Batch materialization of a test plan: the deterministic generator as a
  * DataFrame. Each plan-second is a pure function of the plan, so the
  * seconds range distributes across executors with no coordination and no
  * shuffle — at any scale the generator is embarrassingly parallel.
  * (reference: testbed DataGenerator.scala:16-23, PhaseContainer.scala:12-21)
  */
object PlanGenerator {

  /** (event_time TIMESTAMP, value INT, stream_id INT) for the whole plan.
    * `startEpochMs` anchors plan-relative times to an absolute clock.
    * Unbounded plans must pass `maxSeconds`. */
  def generate(
      spark: SparkSession,
      plan: TestPlan,
      streamId: Int = 0,
      startEpochMs: Long = 0L,
      maxSeconds: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val seconds = plan.duration.orElse(maxSeconds).getOrElse(
      throw new IllegalArgumentException("unbounded plan needs maxSeconds"))
    val rows: Dataset[(Long, Int)] = spark.range(0, seconds.toLong)
      .as[Long]
      .flatMap(s => plan.rowsFor(s.toInt))
    rows.toDF("time_ms", "value")
      .select(
        timestamp_millis(col("time_ms") + startEpochMs).as("event_time"),
        col("value").cast("int").as("value"),
        lit(streamId).as("stream_id"))
  }
}
