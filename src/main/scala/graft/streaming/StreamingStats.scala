package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.Hanoi

/** The reference's one streaming query, Spark-first: ingest integers, run
  * the CPU-bound Hanoi workload per element, aggregate per-(value, stream)
  * per-micro-batch stats, emit TSV.
  * (reference: SimpleStreamingApp.scala:26-108)
  *
  * Per-batch (processing-time) semantics are exact-parity via foreachBatch:
  * the reference aggregates whatever arrived in the batch, not an
  * event-time window. stddev must be population stddev.
  */
object StreamingStats {

  /** The per-batch aggregation: count/sum/mean/stddev_pop of the measured
    * per-element cost, grouped by (value, stream_id).
    * (reference: SimpleStreamingApp.scala:81,114-122) */
  def batchStats(batch: DataFrame, metric: String = "hanoi_ms"): DataFrame =
    batch.groupBy("value", "stream_id")
      .agg(
        count(metric).as("cnt"),
        sum(metric).as("sum_ms"),
        avg(metric).as("mean_ms"),
        stddev_pop(metric).as("stddev_ms"))

  /** Attach the measured Hanoi cost column. */
  def withHanoiCost(df: DataFrame): DataFrame =
    df.withColumn("hanoi_ms", Hanoi.hanoiTime(col("value")))

  /** Reference output line: millis, batchTime, value, streamId, count,
    * sum, mean, stdDev (tab-separated).
    * (reference: SimpleStreamingApp.scala:106-108) */
  def toTsv(stats: DataFrame, batchEpochMs: Long): DataFrame =
    stats.select(format_string(
      "%d\t%d\t%d\t%d\t%d\t%d\t%.3f\t%.3f",
      unix_millis(current_timestamp()), lit(batchEpochMs),
      col("value"), col("stream_id"), col("cnt"), col("sum_ms"),
      col("mean_ms"), col("stddev_ms")).as("line"))

  /** Idiomatic event-time variant of [[batchStats]]: tumbling event-time
    * windows + watermark instead of processing-time batch scope. Not
    * bit-identical to the reference under lag (SURVEY §7.3) — this is the
    * declarative mode; [[run]] is the parity mode. Stateful aggregation:
    * Spark keeps per-window partial state until the watermark passes, so
    * the shuffle carries partial aggregates, never raw rows. */
  def windowedStats(
      df: DataFrame,
      windowLength: String = "5 seconds",
      watermarkDelay: String = "10 seconds",
      metric: String = "hanoi_ms"): DataFrame =
    df.withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowLength), col("value"), col("stream_id"))
      .agg(
        count(metric).as("cnt"),
        sum(metric).as("sum_ms"),
        avg(metric).as("mean_ms"),
        stddev_pop(metric).as("stddev_ms"))
      .select(col("window.start").as("window_start"), col("value"),
        col("stream_id"), col("cnt"), col("sum_ms"), col("mean_ms"), col("stddev_ms"))

  /** Full pipeline on N generator streams, unioned, exact per-batch
    * semantics. `sink` receives (statsDF, batchId) per micro-batch. */
  def run(
      spark: SparkSession,
      planText: String,
      numStreams: Int = 1,
      triggerMs: Long = 1000L,
      maxRowsPerTrigger: Option[Long] = None,
      rateLimitKey: Option[String] = None,
      secondsPerTrigger: Int = 1,
      numPartitions: Option[Int] = None,
      metricCol: DataFrame => DataFrame = withHanoiCost,
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val genParts = numPartitions.getOrElse(spark.sparkContext.defaultParallelism)
    val streams = (0 until numStreams).map { id =>
      var r = spark.readStream.format("plan-gen")
        .option("plan", planText)
        .option("streamId", id)
        .option("secondsPerTrigger", secondsPerTrigger)
        .option("numPartitions", genParts)
      maxRowsPerTrigger.foreach(m => r = r.option("maxRowsPerTrigger", m))
      rateLimitKey.foreach(k => r = r.option("rateLimitKey", k))
      r.load()
    }
    val unioned = streams.reduce(_ unionByName _) // reference U1 stream union
    metricCol(unioned).writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchStats(batch), batchId)
      }
      .start()
  }
}
