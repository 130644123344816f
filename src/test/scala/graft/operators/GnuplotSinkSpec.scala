package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class GnuplotSinkSpec extends SparkSpec {

  test("per-second rollup renders a well-formed dat + plt pair") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_gnuplot").toFile.getAbsolutePath
    try {
      val perSec = Seq((0L, 100L, 5L), (1L, 200L, 0L), (2L, 150L, 7L))
        .toDF("second", "delivered", "dropped")
        .orderBy("second")
      val (dat, plt) = GnuplotSink.write(perSec, dir, "delivery")

      val datTxt = Files.readString(Paths.get(dat))
      assert(datTxt.startsWith("# second delivered dropped\n"))
      assert(datTxt.contains("\n1 200 0\n"))
      assert(datTxt.linesIterator.size === 4)

      val pltTxt = Files.readString(Paths.get(plt))
      assert(pltTxt.contains("set terminal png"))
      assert(pltTxt.contains("""set output "delivery.png""""))
      assert(pltTxt.contains(""""delivery.dat" using 1:2 with lines title "delivered""""))
      assert(pltTxt.contains(""""delivery.dat" using 1:3 with lines title "dropped""""))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("null cells render as gnuplot missing-data markers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_gnuplot2").toFile.getAbsolutePath
    try {
      val df = Seq((0L, Some(1.5)), (1L, None)).toDF("second", "ratio")
      val (dat, _) = GnuplotSink.write(df, dir, "ratio")
      assert(Files.readString(Paths.get(dat)).contains("\n1 -\n"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("quotes in titles are escaped; whitespace in label cells keeps columns aligned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_gnuplot3").toFile.getAbsolutePath
    try {
      // x is a string label WITH whitespace; the series name carries a
      // double quote — unescaped, either would break the .dat column
      // alignment or terminate the .plt string early
      val df = Seq(("north region", 10L), ("south region", 20L))
        .toDF("sales \"zone\"", "total")
      val (dat, plt) = GnuplotSink.write(df, dir, "q\"x")

      val datLines = Files.readString(Paths.get(dat)).linesIterator.toSeq
      assert(datLines.tail.forall(_.split(" ").length == 2),
        s"whitespace cell broke column alignment: $datLines")
      assert(datLines(1).startsWith("north_region "))

      val pltTxt = Files.readString(Paths.get(plt))
      assert(pltTxt.contains("""set output "q\"x.png""""))
      // quoted strings keep their whitespace — only .dat cells collapse it
      assert(pltTxt.contains("""set xlabel "sales \"zone\"""" + "\""))
      // unescaped interior quotes would leave an odd quote count
      val plotLine = pltTxt.linesIterator.find(_.startsWith("plot ")).get
      assert(plotLine.replace("\\\"", "").count(_ == '"') % 2 === 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
