package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over run logs — the reference's log-processor module as
  * a pure DataFrame program: substring prefilter → regex extraction into
  * typed tables → time-shift → pivots / bucketed sums / cumulative sums →
  * CSV dump. (reference: log-processor TestData.scala, RunLogData.scala,
  * ApplicationLogData.scala, ReceiverLogData.scala)
  *
  * Line formats are this engine's own (emitted by [[graft.streaming]] and
  * [[LogAnalytics.formatters]]); the *tables* match the reference's
  * schemas (§1.2 of SURVEY.md). The contains-prefilter before the regex is
  * the reference's hand-rolled pushdown — Catalyst orders it for free, we
  * keep it explicit for scan pruning.
  */
object LogAnalytics {

  private val Ts = "(\\d+)" // epoch millis prefix on every line

  /** memory(time, freeMemoryKb) — `<ms> MEMORY free=<kb>KB` (MB normalized
    * ×1024, the reference's unit conditional P7/F16). */
  def memory(lines: DataFrame): DataFrame =
    lines.filter(col("value").contains("MEMORY"))
      .select(
        regexp_extract(col("value"), s"^$Ts MEMORY free=([0-9.]+)(KB|MB)", 1).cast("long").as("time"),
        regexp_extract(col("value"), s"^$Ts MEMORY free=([0-9.]+)(KB|MB)", 2).cast("double").as("raw"),
        regexp_extract(col("value"), s"^$Ts MEMORY free=([0-9.]+)(KB|MB)", 3).as("unit"))
      .select(col("time"),
        when(col("unit") === "MB", col("raw") * 1024).otherwise(col("raw")).as("freeMemoryKb"))

  /** execution(time, batchTime, value, streamId, count) —
    * `<ms> EXEC batch=<ms> value=<v> stream=<id> count=<n>`. */
  def execution(lines: DataFrame): DataFrame = {
    val p = s"^$Ts EXEC batch=(\\d+) value=(-?\\d+) stream=(\\d+) count=(\\d+)"
    lines.filter(col("value").contains("EXEC"))
      .select(
        regexp_extract(col("value"), p, 1).cast("long").as("time"),
        regexp_extract(col("value"), p, 2).cast("long").as("batchTime"),
        regexp_extract(col("value"), p, 3).cast("int").as("value"),
        regexp_extract(col("value"), p, 4).cast("int").as("streamId"),
        regexp_extract(col("value"), p, 5).cast("int").as("count"))
      .filter(col("time").isNotNull)
  }

  /** pid(time, records, processing, delay) —
    * `<ms> PID records=<n> processing=<ms> delay=<ms>`, zero-record
    * batches dropped (reference P3 filterNot). */
  def pid(lines: DataFrame): DataFrame = {
    val p = s"^$Ts PID records=(\\d+) processing=(\\d+) delay=(\\d+)"
    lines.filter(col("value").contains("PID"))
      .select(
        regexp_extract(col("value"), p, 1).cast("long").as("time"),
        regexp_extract(col("value"), p, 2).cast("int").as("records"),
        regexp_extract(col("value"), p, 3).cast("int").as("processing"),
        regexp_extract(col("value"), p, 4).cast("int").as("delay"))
      .filter(col("records") =!= 0)
  }

  /** tick(time, value, count) — `<ms> TICK value=<v> count=<n>`. */
  def tick(lines: DataFrame): DataFrame = {
    val p = s"^$Ts TICK value=(-?\\d+) count=(\\d+)"
    lines.filter(col("value").contains("TICK"))
      .select(
        regexp_extract(col("value"), p, 1).cast("long").as("time"),
        regexp_extract(col("value"), p, 2).cast("int").as("value"),
        regexp_extract(col("value"), p, 3).cast("int").as("count"))
  }

  /** droppedValues(time, count, clientId) — `<ms> DROP count=<n> client=<c>`. */
  def droppedValues(lines: DataFrame): DataFrame = clientCount(lines, "DROP")
  /** requestedValues(time, count, clientId) — `<ms> REQ count=<n> client=<c>`. */
  def requestedValues(lines: DataFrame): DataFrame = clientCount(lines, "REQ")

  private def clientCount(lines: DataFrame, tag: String): DataFrame = {
    val p = s"^$Ts $tag count=(\\d+) client=(\\d+)"
    lines.filter(col("value").contains(tag))
      .select(
        regexp_extract(col("value"), p, 1).cast("long").as("time"),
        regexp_extract(col("value"), p, 2).cast("int").as("count"),
        regexp_extract(col("value"), p, 3).cast("int").as("clientId"))
  }

  /** feedback(time, streamId, limit) — `<ms> FEEDBACK stream=<id> limit=<n>`,
    * zero limits dropped. */
  def feedback(lines: DataFrame): DataFrame = {
    val p = s"^$Ts FEEDBACK stream=(\\d+) limit=(\\d+)"
    lines.filter(col("value").contains("FEEDBACK"))
      .select(
        regexp_extract(col("value"), p, 1).cast("long").as("time"),
        regexp_extract(col("value"), p, 2).cast("int").as("streamId"),
        regexp_extract(col("value"), p, 3).cast("int").as("limit"))
      .filter(col("limit") =!= 0)
  }

  /** ratio(time, streamId, ratio) — `<ms> RATIO stream=<id> ratio=<r>`. */
  def ratio(lines: DataFrame): DataFrame = {
    val p = s"^$Ts RATIO stream=(\\d+) ratio=([0-9.]+)"
    lines.filter(col("value").contains("RATIO"))
      .select(
        regexp_extract(col("value"), p, 1).cast("long").as("time"),
        regexp_extract(col("value"), p, 2).cast("int").as("streamId"),
        regexp_extract(col("value"), p, 3).cast("double").as("ratio"))
  }

  /** Shift every table's time column so the anchor (first execution
    * batchTime) is zero. (reference: TestData.scala:81-92) */
  def timeShift(table: DataFrame, baseMs: Long, cols: Seq[String] = Seq("time")): DataFrame =
    cols.foldLeft(table)((df, c) => df.withColumn(c, col(c) - lit(baseMs)))

  /** The anchor: minimum execution batchTime. (reference: TestData.scala:83) */
  def baseTime(execution: DataFrame): Long =
    execution.agg(min("batchTime")).head().getLong(0)

  /** Per-batchTime pivot of counts by value — missing combos stay null
    * (the reference's `?` cells). (reference: RunLogData.scala:40-54) */
  def executionPivot(execution: DataFrame, values: Seq[Int]): DataFrame =
    execution.groupBy("batchTime")
      .pivot("value", values.map(_.toString))
      .agg(first("count"))
      .orderBy("batchTime")

  /** 1-second tumbling bucketed sums per client.
    * (reference: TestData.scala:20-34) */
  def perSecond(clientTable: DataFrame): DataFrame =
    clientTable
      .groupBy((col("time").cast("long") - pmod(col("time"), lit(1000L))).as("time"), col("clientId"))
      .agg(sum("count").cast("int").as("count"))
      .orderBy("time")

  /** Horizontal running sum across pivoted value columns, null-preserving:
    * a null cell renders as null but does not advance the accumulator.
    * (reference: TestData.scala:155-168) */
  def cumulativeAcrossValues(pivoted: DataFrame, values: Seq[Int]): DataFrame =
    cumulativeAcrossValues(pivoted, values, Seq("batchTime"))

  /** As above, keeping arbitrary leading id columns. */
  def cumulativeAcrossValues(
      pivoted: DataFrame, values: Seq[Int], idCols: Seq[String]): DataFrame = {
    val acc = values.scanLeft(lit(0L): org.apache.spark.sql.Column) {
      case (a, v) => a + coalesce(col(v.toString).cast("long"), lit(0L))
    }.tail
    pivoted.select(
      idCols.map(col) ++ values.zip(acc).map { case (v, a) =>
        when(col(v.toString).isNotNull, a).as(s"acc_$v")
      }: _*)
  }

  /** Gap-marked ordered dump rows: flag rows whose gap to the previous row
    * exceeds 10× the previous interval (the reference inserts a blank line
    * there for gnuplot). (reference: TestData.scala:241-260) */
  def withGapMarkers(table: DataFrame): DataFrame = {
    // unpartitioned window is safe HERE only: gap markers decorate dump
    // FILES — post-aggregation per-second/per-batch tables, small by
    // contract (the raw-log tables never pass through this)
    val w = Window.orderBy("time")
    table
      .withColumn("_prev", lag("time", 1).over(w))
      .withColumn("_prevInterval", col("_prev") - lag("time", 2).over(w))
      .withColumn("gap_break",
        coalesce((col("time") - col("_prev")) > col("_prevInterval") * 10, lit(false)))
      .drop("_prev", "_prevInterval")
  }

  /** Space-separated CSV dump of a table, sorted by time.
    * (reference: TestData.scala:97-114) */
  def dump(table: DataFrame, path: String): Unit =
    table.orderBy("time").write.mode("overwrite")
      .option("sep", " ").option("header", "false").csv(path)

  /** Line formatters for the emitting side (streaming pipeline/listener). */
  object formatters {
    def exec(timeMs: Long, batchMs: Long, value: Int, streamId: Int, count: Long): String =
      s"$timeMs EXEC batch=$batchMs value=$value stream=$streamId count=$count"
    def feedback(timeMs: Long, streamId: Int, limit: Long): String =
      s"$timeMs FEEDBACK stream=$streamId limit=$limit"
    def pid(timeMs: Long, records: Long, processingMs: Long, delayMs: Long): String =
      s"$timeMs PID records=$records processing=$processingMs delay=$delayMs"
    def tick(timeMs: Long, value: Int, count: Long): String =
      s"$timeMs TICK value=$value count=$count"
    def memory(timeMs: Long, freeKb: Double): String =
      s"$timeMs MEMORY free=${freeKb}KB"
    def drop(timeMs: Long, count: Long, clientId: Int): String =
      s"$timeMs DROP count=$count client=$clientId"
    def req(timeMs: Long, count: Long, clientId: Int): String =
      s"$timeMs REQ count=$count client=$clientId"
    def ratio(timeMs: Long, streamId: Int, r: Double): String =
      s"$timeMs RATIO stream=$streamId ratio=$r"
  }

  /** Load all eight tables from a directory of `run.log`/`application.log`/
    * `receiver*.log` files (glob scan, S3/S4). */
  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    def read(glob: String): DataFrame = spark.read.text(s"$dir/$glob")
    val run = read("run.log")
    val app = read("application.log")
    val recv = read("receiver*.log")
    Map(
      "memory" -> memory(run),
      "execution" -> execution(run),
      "pid" -> pid(run),
      "tick" -> tick(app),
      "droppedValues" -> droppedValues(app),
      "requestedValues" -> requestedValues(app),
      "feedback" -> feedback(recv),
      "ratio" -> ratio(recv))
  }
}
