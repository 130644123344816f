package graft.tmp

import org.apache.spark.sql.SparkSession

object ExplainW7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq(graft.operators.Features.qQualityGate,
        graft.operators.Features.qQuantileBins,
        graft.operators.Features.qPmiCooc)) {
      println(s"===== ${q.name}")
      q.build(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
