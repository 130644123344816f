package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-timer (delete before committing): times each sub-step of
  * the semantic ingest batch body standalone at sf0.1 batch sizes. */
object StepTime {
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

    val emb = graft.Tables.embeddings(spark, d)
    val quarter = emb.filter(col("vec_id") % 4 === 0)
      .withColumn("doc_id", col("vec_id"))
      .select("doc_id", "vec_id", "label", "embedding")
    val root = s"/tmp/graft_steptime_${System.nanoTime()}"

    // warm every path once
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      time("landBatch (write 16 shard files, 1 input part)") {
        graft.streaming.StreamShardRouter.landBatch(quarter, s"$root/r$round/docs", 0L)
      }
      val dir = s"$root/r$round/docs/batch=0"
      time("read-back count") {
        spark.read.parquet(dir).count()
      }
      val landed = spark.read.parquet(dir)
      println("landed partitions: " + landed.rdd.getNumPartitions)
      val postings = graft.operators.Similarity.lshPostings(landed)
      time("postings expansion only (noop)") {
        postings.write.format("noop").mode("overwrite").save()
      }
      time("landPostingsDelta (repartition + write ~128 dirs)") {
        graft.streaming.StreamLshIngest.landPostingsDelta(postings, s"$root/r$round/idx", 0L)
      }
      // variant A: plain sorted files, shard_id as data column, no shuffle
      time("delta as plain sorted files (no partitionBy, no shuffle)") {
        postings
          .withColumn("shard_id",
            expr("cast(shiftright(tb, 4) as int)"))
          .sortWithinPartitions("shard_id", "tb")
          .write.mode("overwrite").parquet(s"$root/r$round/idxA/batch=0")
      }
      // variant B: committer v2, same 128-dir layout
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 2)
      time("landPostingsDelta, committer v2 (128 dirs)") {
        graft.streaming.StreamLshIngest.landPostingsDelta(postings, s"$root/r$round/idxB", 0L)
      }
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 1)
      // docs landing with v2
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 2)
      time("landBatch, committer v2 (16 dirs)") {
        graft.streaming.StreamShardRouter.landBatch(quarter, s"$root/r$round/docsB", 0L)
      }
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 1)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
