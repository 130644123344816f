package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (delete before committing): per-task fixed-cost floor of
  * trivial jobs in the bench session shape. */
object TaskFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.SessionTuning.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STEP $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val d = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.register(spark)
    val orders = spark.read.parquet(s"$d/orders.parquet")
    (1 to 3).foreach { r =>
      println(s"== round $r ==")
      time("range(32k).repartition(32) noop") {
        spark.range(32000).repartition(32).write.format("noop").mode("overwrite").save()
      }
      val ck = orders.repartition(32).localCheckpoint()
      time("checkpointed orders count") { ck.count() }
      time("window over checkpoint noop") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").desc)
        ck.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .write.format("noop").mode("overwrite").save()
      }
      val dir = s"/tmp/graft_taskfloor_$r"
      time("plain parquet write of checkpoint (32 tasks)") {
        ck.write.mode("overwrite").parquet(dir)
      }
      time("coalesce(1) parquet write") {
        ck.limit(100).coalesce(1).write.mode("overwrite").parquet(dir + "_c1")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir + "_c1"))
    }
    spark.stop()
  }
}
