package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Scratch profiler (delete before committing): runs named registry gates
  * with a SparkListener recording per-job wall time + per-stage callsites,
  * so the per-batch job structure of the streaming gates is visible
  * without the UI.
  * Usage: Test/runMain graft.tmp.ProfileGate <sfDir> <gate> [gate...]
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gates = args.drop(1).toSeq
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

    case class St(name: String, tasks: Int, taskMs: Long, wallMs: Long)
    val jobStart = mutable.Map.empty[Int, (String, Long)]
    val stageInfo = mutable.Map.empty[Int, St]
    val stageJob = mutable.Map.empty[Int, Int]
    val jobRows = mutable.ArrayBuffer.empty[(Int, String, Long, Seq[Int])]
    val jobStages = mutable.Map.empty[Int, Seq[Int]]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          .replace('\n', '|')
        jobStart(j.jobId) = (desc, j.time)
        jobStages(j.jobId) = j.stageIds
        j.stageIds.foreach(sid => stageJob(sid) = j.jobId)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        stageInfo(si.stageId) = St(si.name.replace('\n', ' '), si.numTasks,
          si.taskMetrics.executorRunTime, wall)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        jobStart.remove(j.jobId).foreach { case (desc, t0) =>
          jobRows += ((j.jobId, desc, j.time - t0, jobStages.getOrElse(j.jobId, Nil)))
        }
      }
    }

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val reg = graft.SparkEntry.registry.map(q => q.name -> q).toMap
    gates.foreach { g => try force(reg(g).build(spark, "/root/testdata/sf0.001")) catch { case scala.util.control.NonFatal(_) => () } }

    gates.foreach { g =>
      spark.sparkContext.addSparkListener(listener)
      jobRows.clear(); stageInfo.clear(); stageJob.clear(); jobStages.clear()
      val t0 = System.nanoTime()
      force(reg(g).build(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(700)
      spark.sparkContext.removeSparkListener(listener)
      synchronized {
        println(f"==== GATE $g: $sec%.2fs, ${jobRows.size} jobs, job-ms sum ${jobRows.map(_._3).sum} ====")
        jobRows.sortBy(-_._3).take(25).foreach { case (id, desc, ms, stages) =>
          val batch = "batch = (\\d+)".r.findFirstMatchIn(desc).map("b" + _.group(1)).getOrElse("")
          println(f"  job $id%3d $ms%6d ms $batch%4s")
          stages.flatMap(stageInfo.get).sortBy(-_.wallMs).take(4).foreach { s =>
            println(f"      stage ${s.wallMs}%6d ms wall ${s.taskMs}%6d ms task n=${s.tasks}%3d  ${s.name.take(110)}")
          }
        }
      }
    }
    spark.stop()
  }
}
