package graft.tmp

import org.apache.spark.sql.SparkSession

/** Scratch explain capturer (delete before committing): writes
  * `.explain("formatted")` of named registry queries to an output dir.
  * Usage: Test/runMain graft.tmp.ExplainDump <outDir> <suffix> <sfDir> <gate> [gate...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val gates = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.SessionTuning.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    new java.io.File(outDir).mkdirs()
    val reg = graft.SparkEntry.registry.map(q => q.name -> q).toMap
    gates.foreach { g =>
      try {
        val df = reg(g).build(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${g}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"WROTE $g")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"FAILED $g: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
