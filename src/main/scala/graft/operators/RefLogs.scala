package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q

/** Ingestion of the reference testbed's RAW run logs — the line formats the
  * reference's log-processor parses (reference log-processor/…/
  * RunLogData.scala:65-98, ApplicationLogData.scala:48-77,
  * ReceiverLogData.scala:17-38, TestData.scala:178-236):
  *
  *  - `run.log` — the streaming app's driver log: "Added input" memory
  *    lines (`yyyy-MM-dd HH:mm:ss,SSSZ` timestamps, `free: N MB)`),
  *    "batch result:" tab-separated stats rows
  *    (SimpleStreamingApp.scala:107), and PID rate-estimator
  *    "processing time" lines;
  *  - `application.log` — the testbed's Play log: "At tick", "unable to
  *    deliver", "received request" (dot-millis timestamps
  *    `yyyy-MM-dd HH:mm:ss.SSSZ` — the reference needs two distinct
  *    SimpleDateFormat patterns, F7);
  *  - `receiver*.log` — executor logs: "Received a new rate limit"
  *    (feedback) and "ratio of" (congestion-strategy drop ratio; older
  *    runs omit the `stream N` token, so the stream id is optional).
  *
  * Scale shape: every parser is a narrow map (substring filter +
  * regexp_extract, all codegen'd) over `spark.read.text` — no shuffle, no
  * UDFs; a 100 TB log corpus parses embarrassingly parallel at scan
  * speed. The per-second rollups are single hash aggregates on
  * `(client_id, second)` (reference TestData.scala:20-34).
  *
  * Correctness gates parse the reference repo's own committed run logs
  * and compare against DuckDB parsing the same files (q_reflog_feedback,
  * q_reflog_ratio) and against the reference log-processor's own
  * committed output dump (q_reflog_drop_persec — our rollup of
  * droppedValues_0.log must reproduce droppedValuesPerSecond_0.log
  * byte-for-byte).
  */
object RefLogs {

  /** log4j pattern in run.log / receiver.log (RunLogData.scala:65). */
  val TsComma = "yyyy-MM-dd HH:mm:ss,SSSZ"
  /** Play pattern in application.log (ApplicationLogData.scala:50). */
  val TsDot = "yyyy-MM-dd HH:mm:ss.SSSZ"

  /** Committed reference runs used by the oracle gates. */
  val Run006Pid =
    "/root/reference/test-runs-006/1.5.0-rc3-7-25000.60-8-25000.100-7-25000.150_pid"
  val Run003Drop = "/root/reference/test-runs-003/streaming-t006-7-50000-drop"

  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  private def emptyLines(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[String].toDF("value")
  }

  /** Leading `<date> <time>` → epoch millis; null (filtered) if unparseable
    * rather than failing the whole scan in ANSI mode. */
  private def tsMillis(fmt: String): Column =
    unix_millis(try_to_timestamp(
      regexp_extract(col("value"), "^([^ ]+ [^ ]+)", 1), lit(fmt)))

  /** "Received a new rate limit for <stream> : <limit>." → feedback rows;
    * zero limits dropped (reference TestData.scala:224-228). */
  def feedback(lines: DataFrame): DataFrame = {
    val re = "a new rate limit for (\\d+) : (\\d+)\\."
    lines.filter(col("value").contains("Received a new rate limit for"))
      .select(
        tsMillis(TsComma).as("time"),
        regexp_extract(col("value"), re, 1).cast("int").as("stream_id"),
        regexp_extract(col("value"), re, 2).cast("long").as("rate_limit"))
      .filter(col("rate_limit") =!= 0 && col("time").isNotNull)
  }

  /** "… with ratio of <r>." congestion-strategy rows; `stream <id>` is
    * absent in pre-1.5 logs → 0 (reference ReceiverLogData.scala:22). */
  def ratio(lines: DataFrame): DataFrame = {
    val sid = regexp_extract(col("value"), "stream (\\d+)", 1)
    lines.filter(col("value").contains("ratio of"))
      .select(
        tsMillis(TsComma).as("time"),
        when(sid === "", 0).otherwise(sid.cast("int")).as("stream_id"),
        regexp_extract(col("value"), "with ratio of ([0-9.]+)\\.", 1)
          .cast("double").as("ratio"))
      .filter(col("time").isNotNull)
  }

  /** "Added input … free: <n> <MB|KB>)" → free memory in KB
    * (reference RunLogData.scala:67,71-84). */
  def memory(lines: DataFrame): DataFrame = {
    val re = "free: ([^ ]+) (MB|KB)\\)"
    lines.filter(col("value").contains("Added input"))
      .select(
        tsMillis(TsComma).as("time"),
        (regexp_extract(col("value"), re, 1).cast("double") *
          when(regexp_extract(col("value"), re, 2) === "MB", 1024.0)
            .otherwise(1.0)).as("free_memory_kb"))
      .filter(col("time").isNotNull)
  }

  /** "batch result: <ms>\t<batchTime>\t<value>\t<streamId>\t<count>…"
    * (emitted by SimpleStreamingApp.scala:107, parsed by
    * RunLogData.scala:68,86-91). */
  def execution(lines: DataFrame): DataFrame = {
    val parts = split(col("value"), "\t")
    lines.filter(col("value").contains("batch result:"))
      .select(
        regexp_extract(element_at(parts, 1), "(\\d+)$", 1).cast("long").as("time"),
        element_at(parts, 2).cast("long").as("batch_time"),
        element_at(parts, 3).cast("int").as("value"),
        element_at(parts, 4).cast("int").as("stream_id"),
        element_at(parts, 5).cast("int").as("count"))
  }

  /** "time = …, # records = …, processing time = …, scheduling delay = …"
    * PID rows; zero-record rows dropped (RunLogData.scala:69,93-98;
    * TestData.scala:191-194). */
  def pid(lines: DataFrame): DataFrame = {
    val re = "time = (\\d+), # records = (\\d+), processing time = (\\d+), scheduling delay = (\\d+)"
    lines.filter(col("value").contains("processing time"))
      .select(
        regexp_extract(col("value"), re, 1).cast("long").as("time"),
        regexp_extract(col("value"), re, 2).cast("int").as("records"),
        regexp_extract(col("value"), re, 3).cast("int").as("processing"),
        regexp_extract(col("value"), re, 4).cast("int").as("delay"))
      .filter(col("records") =!= 0)
  }

  /** "At tick <t>, <count> times <value>" generator ticks
    * (DataGeneratorActor.scala:65; ApplicationLogData.scala:52,56-61). */
  def tick(lines: DataFrame): DataFrame = {
    val re = ", (\\d+) times (\\d+)"
    lines.filter(col("value").contains("At tick") &&
        col("value").contains("DataGeneratorActor"))
      .select(
        tsMillis(TsDot).as("time"),
        regexp_extract(col("value"), re, 2).cast("int").as("value"),
        regexp_extract(col("value"), re, 1).cast("int").as("count"))
      .filter(col("time").isNotNull)
  }

  /** "unable to deliver <n> values to client <id>" producer drops
    * (DataGeneratorActor.scala:229,262,268; ApplicationLogData.scala:53). */
  def droppedValues(lines: DataFrame): DataFrame = {
    val re = "to deliver (\\d+) values to client (\\d+)"
    lines.filter(col("value").contains("unable to deliver"))
      .select(
        tsMillis(TsDot).as("time"),
        regexp_extract(col("value"), re, 1).cast("int").as("count"),
        regexp_extract(col("value"), re, 2).cast("int").as("client_id"))
      .filter(col("time").isNotNull)
  }

  /** "received request for <n> values from client <id>" demand rows
    * (DataGeneratorActor.scala:257; ApplicationLogData.scala:54). */
  def requestedValues(lines: DataFrame): DataFrame = {
    val re = "received request for (\\d+) values from client (\\d+)"
    lines.filter(col("value").contains("received request"))
      .select(
        tsMillis(TsDot).as("time"),
        regexp_extract(col("value"), re, 1).cast("int").as("count"),
        regexp_extract(col("value"), re, 2).cast("int").as("client_id"))
      .filter(col("time").isNotNull)
  }

  /** Per-(client, second) rollup — the reference's
    * droppedValuesPerSecond/requestedValuesPerSecond
    * (TestData.scala:20-34): bucket = time/1000 (integer division),
    * reported at the bucket start. One hash aggregate. */
  def perSecond(df: DataFrame): DataFrame =
    df.groupBy(
        (col("time").cast("long") / 1000).cast("long").multiply(1000).as("time"),
        col("client_id"))
      .agg(sum("count").cast("long").as("count"))

  /** Shift all times so the first processed batch is t=0
    * (reference TestData.scala:81-92). */
  def timeShift(df: DataFrame, baseTime: Long, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) - lit(baseTime)))

  /** Load a full reference run directory into its eight tables, tolerating
    * absent files (reference TestData.load, TestData.scala:178-236). */
  def load(spark: SparkSession, runDir: String): Map[String, DataFrame] = {
    def linesOf(name: String): DataFrame = {
      val f = new java.io.File(runDir, name)
      if (f.exists) lines(spark, f.getPath) else emptyLines(spark)
    }
    val receiverFiles = Option(new java.io.File(runDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.matches("receiver(_\\d+)?\\.log"))
      .map(_.getPath)
    val receiverLines =
      if (receiverFiles.isEmpty) emptyLines(spark)
      else spark.read.text(receiverFiles.toIndexedSeq: _*)
    val run = linesOf("run.log")
    val app = linesOf("application.log")
    Map(
      "memory" -> memory(run),
      "execution" -> execution(run),
      "pid" -> pid(run),
      "tick" -> tick(app),
      "droppedValues" -> droppedValues(app),
      "requestedValues" -> requestedValues(app),
      "feedback" -> feedback(receiverLines),
      "ratio" -> ratio(receiverLines))
  }

  /** Reader for the log-processor's committed space-separated dumps
    * (TestData.dump, TestData.scala:241-260): numeric columns, blank
    * separator lines skipped. */
  def loadDump(spark: SparkSession, path: String, colNames: Seq[String]): DataFrame = {
    val parts = split(trim(col("value")), " +")
    val cols = colNames.zipWithIndex.map { case (n, i) =>
      element_at(parts, i + 1).cast("long").as(n)
    }
    lines(spark, path)
      .filter(length(trim(col("value"))) > 0)
      .select(cols: _*)
  }

  // ---------------------------------------------------------------- gates

  /** Raw receiver log → feedback rows, vs DuckDB parsing the same file. */
  val qReflogFeedback: Q = Q(
    "q_reflog_feedback",
    s"""SELECT epoch_ms(strptime(regexp_extract(line, '^([^ ]+ [^ ]+)', 1),
      |         '%Y-%m-%d %H:%M:%S,%g%z')) AS time,
      |  CAST(regexp_extract(line, 'a new rate limit for (\\d+) : (\\d+)\\.', 1) AS INT) AS stream_id,
      |  CAST(regexp_extract(line, 'a new rate limit for (\\d+) : (\\d+)\\.', 2) AS BIGINT) AS rate_limit
      |FROM read_csv('$Run006Pid/receiver_0.log',
      |  columns={'line': 'VARCHAR'}, header=false, delim=chr(1), quote='', escape='')
      |WHERE line LIKE '%Received a new rate limit for%'
      |  AND CAST(regexp_extract(line, 'a new rate limit for (\\d+) : (\\d+)\\.', 2) AS BIGINT) <> 0""".stripMargin) {
    (s, _) => feedback(lines(s, s"$Run006Pid/receiver_0.log"))
  }

  /** Raw pre-1.5 receiver log (no `stream N` token) → ratio rows, vs
    * DuckDB parsing the same file. */
  val qReflogRatio: Q = Q(
    "q_reflog_ratio",
    s"""SELECT epoch_ms(strptime(regexp_extract(line, '^([^ ]+ [^ ]+)', 1),
      |         '%Y-%m-%d %H:%M:%S,%g%z')) AS time,
      |  COALESCE(TRY_CAST(NULLIF(regexp_extract(line, 'stream (\\d+)', 1), '') AS INT), 0) AS stream_id,
      |  CAST(regexp_extract(line, 'with ratio of ([0-9.]+)\\.', 1) AS DOUBLE) AS ratio
      |FROM read_csv('$Run003Drop/receiver.log',
      |  columns={'line': 'VARCHAR'}, header=false, delim=chr(1), quote='', escape='')
      |WHERE line LIKE '%ratio of%'""".stripMargin) {
    (s, _) => ratio(lines(s, s"$Run003Drop/receiver.log"))
  }

  /** Our per-second rollup of the committed droppedValues_0.log dump must
    * reproduce the reference log-processor's OWN committed
    * droppedValuesPerSecond_0.log. */
  val qReflogDropPersec: Q = Q(
    "q_reflog_drop_persec",
    s"""SELECT CAST(c0 AS BIGINT) AS time, CAST(c1 AS BIGINT) AS drop_count
      |FROM read_csv('$Run006Pid/droppedValuesPerSecond_0.log',
      |  columns={'c0': 'BIGINT', 'c1': 'BIGINT'}, header=false, delim=' ')
      |WHERE c0 IS NOT NULL""".stripMargin) { (s, _) =>
    loadDump(s, s"$Run006Pid/droppedValues_0.log", Seq("time", "count"))
      .withColumn("client_id", lit(0))
      .transform(perSecond)
      .select(col("time"), col("count").as("drop_count"))
  }

  val all: Seq[Q] = Seq(qReflogFeedback, qReflogRatio, qReflogDropPersec)
}
