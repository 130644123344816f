package graft.tmp

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of one registry gate: wall timeline of every Spark
  * job (start offset, duration, description) plus total gate seconds.
  * Scratch — delete before committing. Usage: GateProfile <query> [reps]
  */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("gate-profile")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, d) =>
          done.add((je.jobId, t0, je.time, d))
        }
      }
    })
    val build = graft.SparkEntry.queries(qname)
    for (r <- 0 until reps) {
      done.clear()
      val t0 = System.currentTimeMillis()
      val df = build(s, sf)
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.currentTimeMillis()
      println(f"== $qname rep $r: ${(t1 - t0) / 1000.0}%.2f s, ${done.size} jobs")
      if (r == reps - 1) {
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val rows = done.asScala.toSeq.sortBy(_._2)
        for ((id, js, jeT, d) <- rows) {
          val off = (js - t0) / 1000.0
          val dur = (jeT - js) / 1000.0
          println(f"job $id%4d  +$off%6.2f  ${dur}%6.2f s  ${d.take(100)}")
        }
      }
    }
    s.stop()
  }
}
