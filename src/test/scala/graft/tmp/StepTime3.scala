package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-timer (delete before committing): the lifecycle gate's
  * SEMANTIC batch-1 body, step by step. */
object StepTime3 {
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
    val root = s"/tmp/graft_steptime3_${System.nanoTime()}"
    val semDocs = s"$root/sem_docs"
    val semIdx = s"$root/sem_idx"
    val takedownVec = col("vec_id") % 7 === 3

    (0 to 1).foreach { id =>
      println(s"== batch $id ==")
      val shaped = emb.filter(col("vec_id") % 2 === id)
        .withColumn("doc_id", col("vec_id"))
        .select("doc_id", "vec_id", "label", "embedding")
      val incoming = shaped
      var postings: org.apache.spark.sql.DataFrame = null
      time(s"geom read") {
        graft.streaming.StreamLshIngest.readGeometry(spark, semIdx); ()
      }
      val geomNow = graft.streaming.StreamLshIngest.readGeometry(spark, semIdx)
      time(s"ingestStep (landBatch + expansion plan)") {
        postings = graft.streaming.StreamLshIngest
          .ingestStep(incoming, semDocs, id.toLong, geometry = geomNow)
      }
      time(s"landPostingsDelta") {
        graft.streaming.StreamLshIngest.landPostingsDelta(postings, semIdx, id.toLong)
      }
      if (id == 1) {
        var doomed: org.apache.spark.sql.DataFrame = null
        time("doomed readCorpus+filter+localCheckpoint") {
          doomed = graft.streaming.DeltaCompact.readCorpus(spark, semDocs)
            .filter(takedownVec).select(col("vec_id")).localCheckpoint()
        }
        time("landTombstones semDocs") {
          graft.streaming.DeltaCompact.landTombstones(
            doomed, semDocs, 0L, watermark = Some(id.toLong))
        }
        time("landTombstones semIdx") {
          graft.streaming.StreamLshIngest.landTombstones(
            doomed.select(col("vec_id").as("neighbor_id")), semIdx, 0L,
            watermark = Some(id.toLong))
        }
        val maint = new graft.streaming.DetachedMaintainer("steptime3")
        time("lshStepDetached DECIDE+submit") {
          graft.streaming.AnnMaintenance.lshStepDetached(spark, semDocs, semIdx,
            maint, autoSize = false)
        }
        time("await ACT (refreshGeometry rebuild)") {
          maint.awaitAll(); maint.close()
        }
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
