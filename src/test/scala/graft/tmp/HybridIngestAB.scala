package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for commit 731bf00 (hybrid gates' semantic
  * ingest): OLD = serial ingestStep → landPostingsDelta per batch;
  * NEW = ingestAndLand (corpus landing ∥ posting-delta landing).
  * Replays the exact 4-batch semantic-ingest composition of
  * q_hybrid_stream_persist (mid-run compactPostings at batch 1) plus the
  * final serve read, alternating variants per rep. Scratch — delete
  * before committing.
  */
object HybridIngestAB {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("hybrid-ingest-ab")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    val emb = graft.Tables.embeddings(s, sf)
    val pid = ProcessHandle.current().pid()
    var n = 0

    def runOnce(overlapped: Boolean): Double = {
      n += 1
      val root = s"/tmp/graft_hybab/run_${pid}_$n"
      val semSrc = s"$root/sem_src"
      emb.repartition(4).write.mode("overwrite").parquet(semSrc)
      val semDocs = s"$root/sem_docs"
      val semIdx = s"$root/sem_idx"
      val t0 = System.nanoTime()
      val semQ = s.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1)
        .parquet(semSrc)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          val batch = b.withColumn("doc_id", col("vec_id"))
            .select("doc_id", "vec_id", "label", "embedding")
          if (overlapped) {
            graft.streaming.StreamLshIngest.ingestAndLand(batch, semDocs, semIdx, id)
          } else {
            val postings = graft.streaming.StreamLshIngest.ingestStep(batch, semDocs, id)
            graft.streaming.StreamLshIngest.landPostingsDelta(postings, semIdx, id)
          }
          if (id == 1L) {
            graft.streaming.StreamLshIngest.compactPostings(s, semIdx); ()
          }
          ()
        }
        .start()
      semQ.awaitTermination()
      // serve off the folded artifacts, same kernels as the gate
      val sem = graft.operators.Similarity.lshServeJoin(
        graft.streaming.StreamLshIngest.readPostings(s, semIdx).drop("tb_hi"),
        graft.operators.Similarity.lshQueryProbes(emb))
      sem.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      dt
    }

    // warmup one of each
    runOnce(false); runOnce(true)
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (i <- 0 until reps) {
      if (i % 2 == 0) { olds += runOnce(false); news += runOnce(true) }
      else { news += runOnce(true); olds += runOnce(false) }
      println(f"rep $i: old=${olds.last}%.3f new=${news.last}%.3f")
    }
    def stats(xs: Seq[Double]): String = {
      val s2 = xs.sorted
      f"min=${s2.head}%.3f med=${s2(s2.size / 2)}%.3f all=${s2.map(x => f"$x%.2f").mkString(",")}"
    }
    println(s"AB_RESULT old: ${stats(olds.toSeq)}")
    println(s"AB_RESULT new: ${stats(news.toSeq)}")
    s.stop()
  }
}
