package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-timer (delete before committing): landBatch fan-out under
  * a 32-partition input vs repartition(shard_id) variants. */
object StepTime2 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.SessionTuning.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STEP $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    def countFiles(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(dir))
    }

    // orders quarter-batch, as q_time_travel sees it post-Tables-change
    val log = graft.Tables.orders(spark, d).select(
      col("o_orderkey").as("doc_id"), col("o_custkey").as("k"),
      round(col("o_totalprice"), 2).as("v"))
    val batch = log.filter(col("doc_id") % 4 === 1).localCheckpoint()
    println("batch partitions: " + batch.rdd.getNumPartitions +
      ", rows: " + batch.count())
    val root = s"/tmp/graft_steptime2_${System.nanoTime()}"

    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      time("landBatch current (partitionBy from 32 parts)") {
        graft.streaming.StreamShardRouter.landBatch(batch, s"$root/r$round/a", 0L)
      }
      println("  files: " + countFiles(s"$root/r$round/a"))
      time("landBatch w/ repartition(shard_id) (16 writers, 1 file/dir)") {
        graft.streaming.StreamShardRouter.withShard(batch, 16)
          .repartition(col("shard_id"))
          .write.mode("overwrite").partitionBy("shard_id")
          .parquet(s"$root/r$round/b/batch=0")
      }
      println("  files: " + countFiles(s"$root/r$round/b"))
      time("read-back a") { spark.read.parquet(s"$root/r$round/a/batch=0").count() }
      time("read-back b") { spark.read.parquet(s"$root/r$round/b/batch=0").count() }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
