package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Scratch explain capturer for the micro-batch LANDING plans (delete
  * before committing) — runs the REAL landPostingsDelta / landBatch and
  * captures their executed write plans via a QueryExecutionListener; the
  * gate-level explain can't show these foreachBatch-internal writes.
  * Usage: Test/runMain graft.tmp.ExplainLanding <outDir> <suffix> <sfDir>
  */
object ExplainLanding {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
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
    graft.functions.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()

    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.add(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }

    def capture(name: String)(f: => Unit): Unit = {
      captured.clear()
      spark.listenerManager.register(listener)
      f
      Thread.sleep(1500)
      spark.listenerManager.unregister(listener)
      val txt = new StringBuilder
      var i = 0
      captured.forEach { p => i += 1; txt.append(s"---- executed query $i ----\n$p\n") }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        txt.toString.getBytes("UTF-8"))
      println(s"WROTE $name ($i queries)")
    }

    val emb = graft.Tables.embeddings(spark, sfDir)
    val batch = emb.filter(col("vec_id") % 4 === 0)
      .withColumn("doc_id", col("vec_id"))
      .select("doc_id", "vec_id", "label", "embedding")
    val root = s"/tmp/graft_explainlanding_${System.nanoTime()}"

    capture("landing_docs_batch") {
      graft.streaming.StreamShardRouter.landBatch(batch, s"$root/docs", 0L)
    }
    val landed = spark.read.parquet(s"$root/docs/batch=0")
    val postings = graft.operators.Similarity.lshPostings(landed)
    capture("landing_postings_delta") {
      graft.streaming.StreamLshIngest.landPostingsDelta(postings, s"$root/idx", 0L)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
