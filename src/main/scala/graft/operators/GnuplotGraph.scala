package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** S10, full parity — the reference log-processor's complete graph
  * synthesis (reference log-processor Main.scala:36-158, TestData.dump
  * TestData.scala:97-114,241-260): from a run directory's raw logs to the
  * multi-panel `graph.gnuplot` script plus every `.log` data file it
  * plots, byte-compatible with the artifacts the reference commits next
  * to its runs.
  *
  * Division of labor, Spark-first: parsing and every aggregation (pivots,
  * per-second rollups, time shift, min/max scans, null-preserving
  * horizontal cumsums) run as DataFrame plans over [[RefLogs]] tables —
  * that part scales to any log volume. Only the ARTIFACT rendering
  * (formatting a few hundred post-aggregation rows into gnuplot's
  * whitespace format, with the reference's gap-blank-line rule) collects
  * to the driver, exactly like [[GnuplotSink]]: plot files are small by
  * contract.
  *
  * Script layout (Main.scala:36-158): one memory/latency panel, one panel
  * per stream (drop-ratio lines when present, per-value filled execution
  * curves, the ×5 feedback bound when present), and one panel per client
  * (dropped-per-second boxes, requested-per-second lines when present,
  * per-value tick fillsteps with the y range scaled to 1.2× the tick
  * peak). All axis ranges are computed from the data (A9/A11 global
  * min/max over the union of tables).
  */
object GnuplotGraph {

  case class StreamPanel(id: Int, values: Seq[Int], hasFeedback: Boolean, hasRatio: Boolean)
  case class ClientPanel(id: Int, hasRequested: Boolean)
  case class GraphLayout(
      minTime: Long, maxTime: Long,
      streams: Seq[StreamPanel], clients: Seq[ClientPanel],
      tickValues: Seq[Int], maxTick: Long)

  /** The shifted tables (reference TestData.timeShift): all `time` columns
    * rebased so the first processed batch is t = 0; execution's batch_time
    * shifts too. */
  def shift(tables: Map[String, DataFrame]): Map[String, DataFrame] = {
    val base = baseTime(tables("execution"))
    tables.map {
      case ("execution", df) => "execution" -> RefLogs.timeShift(df, base, Seq("time", "batch_time"))
      case (name, df)        => name -> RefLogs.timeShift(df, base, Seq("time"))
    }
  }

  /** Anchor = batch time of the earliest execution row (reference
    * TestData.scala:83 takes the first parsed line; logs append in time
    * order, so the min-time row is that line, order-independently). */
  def baseTime(execution: DataFrame): Long =
    execution.orderBy("time", "batch_time").select("batch_time").head(1) match {
      case Array(row) => row.getLong(0)
      case _ => throw new IllegalArgumentException(
        "execution table is empty — no parsed execution log line to anchor the time axis " +
          "(check the run dir contains a non-empty app log)")
    }

  /** Everything the script generator needs, via small aggregates over the
    * shifted tables. */
  def layout(t: Map[String, DataFrame]): GraphLayout = {
    // global x range: min/max time over the union of the six plotted
    // tables (reference TestData.scala:119-140 — pid and requestedValues
    // excluded there too); empty tables contribute nothing
    val spans = Seq("memory", "execution", "tick", "droppedValues", "feedback", "ratio")
      .map(n => t(n).agg(min("time").as("mn"), max("time").as("mx")).head())
      .filter(!_.isNullAt(0))
    require(spans.nonEmpty, "no plottable data in any table")
    val minTime = spans.map(_.getLong(0)).min
    val maxTime = spans.map(_.getLong(1)).max

    val streamIds = t("execution").select("stream_id").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val feedbackIds = t("feedback").select("stream_id").distinct()
      .collect().map(_.getInt(0)).toSet
    val ratioIds = t("ratio").select("stream_id").distinct()
      .collect().map(_.getInt(0)).toSet
    val streams = streamIds.map { id =>
      val values = t("execution").filter(col("stream_id") === id)
        .select("value").distinct().collect().map(_.getInt(0)).sorted.toSeq
      StreamPanel(id, values, feedbackIds(id), ratioIds(id))
    }

    val droppedIds = t("droppedValues").select("client_id").distinct()
      .collect().map(_.getInt(0))
    val requestedIds = t("requestedValues").select("client_id").distinct()
      .collect().map(_.getInt(0))
    val clients = (droppedIds ++ requestedIds).distinct.sorted.toSeq
      .map(id => ClientPanel(id, requestedIds.contains(id)))

    val tickValues = t("tick").select("value").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val maxTick = t("tick").agg(coalesce(max("count"), lit(0))).head().getInt(0).toLong

    GraphLayout(minTime, maxTime, streams, clients, tickValues, maxTick)
  }

  /** The multi-panel script (reference Main.scala:36-158, byte-compatible
    * with the `graph.gnuplot` files committed beside the reference runs). */
  def script(l: GraphLayout, title: String): String = {
    val sb = new StringBuilder

    sb ++= s"""
set y2range [0:]
set y2tics
set yrange [0:]
set lmargin 12
set rmargin 10
set datafile missing "?"
set style fill transparent solid 0.25

set style arrow 1 nohead ls 1
set style arrow 2 nohead ls 1 lc 3
set ytics nomirror

set terminal pngcairo dashed enhanced font "arial,10" fontscale 1.0 size 1500,${l.streams.size * 333 + 666}

set output "graph.png"

set multiplot layout ${l.streams.size + 2}, 1 title "$title"

set xrange [ ${l.minTime - 5000} : ${l.maxTime + 5000} ]
set xtics format " "
set bmargin 1
set ylabel "execution time (in milliseconds)"
set y2label "memory (in MB)"

plot "memory.log" using 1:(5000) with line lt 0 lc 3 title "batch interval", \\
  "memory.log" using 1:($$2/1024) axes x1y2 with lines title "Spark - free memory to store the blocks" lt 1 lc 2, \\
  "pid.log" using ($$1-$$3-$$4):(0):3:3 with vector title "processing time" arrowstyle 2, \\
  "pid.log" using ($$1-$$4):3:4:4 with vector title "scheduling delay" arrowstyle 1


set tmargin 0
set ylabel "# of items"
set y2label "drop ratio"
set y2range [ 0 : 1.1 ]

"""

    l.streams.foreach { stream =>
      sb ++= "\nplot "
      if (stream.hasRatio) sb ++=
        s""""ratio_${stream.id}.log" using 1:2 axes x1y2 with lines title "Congestion strategie - drop ratio, for each block" lt 1 lc rgb "#DDDDDD", \\
  "ratio_${stream.id}.log" u 1:2 axes x1y2 smooth bezier title "smoothed drop ratio" lt 1 lc "black", \\
"""
      sb ++= stream.values.zipWithIndex.map { case (v, i) =>
        s""""execution_${stream.id}.log" using 2:($$${i + 3}) with filledcurve x1 title "Spark - # of items $v processed per batch" lt 1 lc ${i + 3}"""
      }.mkString(", \\\n")
      if (stream.hasFeedback) sb ++=
        s""", \\
  "feedback_${stream.id}.log" using 1:($$2 * 5) with lines title "Spark - feedback bound, max # of item per batch" lt 1 lc 2"""
      sb ++= "\n\n"
    }

    sb ++= s"""
set xlabel "timeline (in milliseconds)"


set xtics format "%.0f"
set bmargin 3
set ylabel "# of items"
unset y2label
unset y2tics
unset y2range


set yrange [ 0 : ${math.max(1L, (l.maxTick * 1.2).toLong)} ]

set boxwidth 1000

"""

    l.clients.zipWithIndex.foreach { case (client, ci) =>
      // the reference concatenates client plots directly (its runs have
      // one client); a separating newline keeps multi-client scripts valid
      // without changing the single-client bytes
      if (ci > 0) sb ++= "\n"
      sb ++= s"""plot "droppedValuesPerSecond_${client.id}.log" using 1:2 with boxes title "testbed, # of item dropped per second" lt 1 lc 1, \\
"""
      if (client.hasRequested) sb ++=
        s"""     "requestedValuesPerSecond_${client.id}.log" using 1:2 with lines title "testbed, # of item requested per second" lt 1 lc 2, \\
"""
      sb ++= l.tickValues.zipWithIndex.map { case (v, i) =>
        s""""tick.log" using 1:($$${i + 2}) with fillsteps title "testbed, # of item $v to send at each second" lt 1 lc ${i + 3}"""
      }.mkString(", \\\n")
    }

    sb ++= "\nunset multiplot\n"
    sb.toString
  }

  // ------------------------------------------------------------ data dumps

  /** One cell of a dump row: nulls are gnuplot's `?` missing marker
    * (reference MultipleItemsLogData.accCountsWithMissing). */
  private def cell(v: Any): String = if (v == null) "?" else v.toString

  /** Write time-sorted rows (column 0 = time) with the reference's
    * gap-blank-line rule: a blank separator line whenever the gap to the
    * previous row exceeds 10× the previous interval (TestData.scala:241-260
    * — gnuplot breaks the line there instead of drawing across the gap). */
  private def writeDump(rows: Seq[Row], path: Path): Unit = {
    val sb = new StringBuilder
    var prevTime = -20000L
    var prevInterval = 20000L
    rows.foreach { r =>
      val t = r.get(0) match { case l: Long => l; case i: Int => i.toLong }
      val interval = t - prevTime
      if (interval > prevInterval * 10) sb ++= "\n"
      sb ++= (0 until r.length).map(i => cell(r.get(i))).mkString(" ")
      sb ++= "\n"
      prevTime = t
      prevInterval = interval
    }
    Files.write(path, sb.toString.getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Per-batch pivot of execution counts by value, null holes preserved and
    * horizontally accumulated (ExecutionMultipleValuesData +
    * accCountsWithMissing): columns time, batch_time, acc per value. */
  private def executionWide(execution: DataFrame, values: Seq[Int]): DataFrame = {
    val times = execution.groupBy("batch_time").agg(min("time").as("time"))
    val pivoted = execution.groupBy("batch_time")
      .pivot("value", values.map(_.toString)).agg(first("count"))
    val joined = times.join(pivoted, Seq("batch_time"))
      .withColumnRenamed("batch_time", "batchTime")
    LogAnalytics.cumulativeAcrossValues(joined, values, Seq("time", "batchTime"))
  }

  /** Per-tick pivot of counts by value, accumulated with holes
    * (TickMultipleValuesData): columns time, acc per value. */
  private def tickWide(tick: DataFrame, values: Seq[Int]): DataFrame = {
    val pivoted = tick.groupBy("time")
      .pivot("value", values.map(_.toString)).agg(first("count"))
    LogAnalytics.cumulativeAcrossValues(pivoted, values, Seq("time"))
  }

  /** Full artifact render from a raw run dir ([[RefLogs.load]]). */
  def write(spark: SparkSession, runDir: String, title: String, outDir: String): Path =
    writeTables(RefLogs.load(spark, runDir), title, outDir)

  /** Full artifact render: shift the eight tables, dump every data file
    * the script references, and write `graph.gnuplot`. Returns the script
    * path. (Tables already at t=0 shift by zero — idempotent.) */
  def writeTables(tables: Map[String, DataFrame], title: String, outDir: String): Path = {
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    val t = shift(tables)
    val l = layout(t)

    def dump(df: DataFrame, name: String): Unit =
      writeDump(df.orderBy("time").collect().toIndexedSeq, out.resolve(name))

    dump(t("memory"), "memory.log")
    // execution.log: one (time, batch_time) row per batch (ExecutionTimeData)
    dump(t("execution").groupBy("batch_time").agg(min("time").as("time"))
      .select("time", "batch_time").orderBy("batch_time"), "execution.log")
    dump(t("pid"), "pid.log")
    dump(tickWide(t("tick"), l.tickValues), "tick.log")
    l.streams.foreach { s =>
      val ex = t("execution").filter(col("stream_id") === s.id)
      dump(executionWide(ex, s.values), s"execution_${s.id}.log")
      dump(t("feedback").filter(col("stream_id") === s.id)
        .select("time", "rate_limit"), s"feedback_${s.id}.log")
      dump(t("ratio").filter(col("stream_id") === s.id)
        .select("time", "ratio"), s"ratio_${s.id}.log")
    }
    l.clients.foreach { c =>
      val dropped = t("droppedValues").filter(col("client_id") === c.id)
      val requested = t("requestedValues").filter(col("client_id") === c.id)
      dump(dropped.select("time", "count"), s"droppedValues_${c.id}.log")
      dump(RefLogs.perSecond(dropped).select("time", "count"),
        s"droppedValuesPerSecond_${c.id}.log")
      dump(requested.select("time", "count"), s"requestedValues_${c.id}.log")
      dump(RefLogs.perSecond(requested).select("time", "count"),
        s"requestedValuesPerSecond_${c.id}.log")
    }

    val scriptPath = out.resolve("graph.gnuplot")
    Files.write(scriptPath, script(l, title).getBytes(StandardCharsets.UTF_8))
    scriptPath
  }
}
