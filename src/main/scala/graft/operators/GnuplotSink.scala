package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** S10 — the reference log-processor's gnuplot output stage: it turns the
  * per-second analytics tables into `<name>.dat` series files plus a
  * `.plt` script and shells out to gnuplot (reference `logprocessor`
  * graph generation). Re-expressed engine-side: the sink renders the
  * SMALL, ALREADY-AGGREGATED result of a query (per-second rollups are a
  * few hundred rows regardless of input scale — never raw data) into the
  * same two artifacts. Running gnuplot itself stays outside the engine,
  * exactly as the reference treats it (an external process over the
  * emitted files).
  *
  * Layout contract: first output column is the x axis; every further
  * column is one series, plotted as a line titled by its column name.
  */
object GnuplotSink {

  /** Escape a value interpolated inside a double-quoted gnuplot string:
    * backslashes and double quotes would otherwise terminate or mangle the
    * script (column names and artifact names are caller-controlled). */
  private[operators] def q(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** One .dat cell: whitespace-separated format, so embedded whitespace in
    * a string cell (x is often a label) would shift every later column —
    * replace runs of whitespace with `_` (gnuplot has no cell quoting that
    * all versions honor; collapsing is the conventional fix). */
  private[operators] def cell(v: Any): String =
    if (v == null) "-" else {
      val s = v.toString
      if (s.isEmpty) "-" else s.replaceAll("\\s+", "_")
    }

  /** Write `<dir>/<name>.dat` (whitespace-separated, header comment) and
    * `<dir>/<name>.plt` (png terminal, one `plot` with all series).
    * Returns (datPath, pltPath). */
  def write(df: DataFrame, dir: String, name: String): (String, String) = {
    val cols = df.columns
    require(cols.length >= 2, s"need x + at least one series, got ${cols.toSeq}")
    val rows = df.collect() // small by contract: post-aggregation output
    val dat = new StringBuilder
    dat ++= cols.map(cell).mkString("# ", " ", "\n")
    rows.foreach { r =>
      dat ++= cols.indices.map(i => cell(r.get(i))).mkString("", " ", "\n")
    }
    val series = cols.tail.zipWithIndex.map { case (c, i) =>
      s""""${q(name)}.dat" using 1:${i + 2} with lines title "${q(c)}""""
    }.mkString(", \\\n  ")
    val plt =
      s"""set terminal png size 1200,600
         |set output "${q(name)}.png"
         |set xlabel "${q(cols.head)}"
         |set key outside
         |set grid
         |plot $series
         |""".stripMargin
    Files.createDirectories(Paths.get(dir))
    val datPath = s"$dir/$name.dat"
    val pltPath = s"$dir/$name.plt"
    Files.write(Paths.get(datPath), dat.toString.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(pltPath), plt.getBytes(StandardCharsets.UTF_8))
    (datPath, pltPath)
  }
}
