package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main: times a subset of registry queries at a given
  * SF without the full warmup, to localize bench regressions. Not part of
  * the driver contract.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSet else Set.empty[String]
    HeapWarmup.cycle() // before the session exists — the pre-fault can stall minutes

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    SessionTuning.tune(spark) // shared ObjectHashAggregate fallback sizing
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (sys.env.get("PROBE_WARMUP").contains("1")) {
      val warmDir = "/root/testdata/sf0.001"
      val t0 = System.nanoTime()
      SparkEntry.registry.foreach { q =>
        try force(q.build(spark, warmDir)) catch { case _: Throwable => () }
      }
      locally {
        val wq = streaming.StreamingStats.run(
          spark, "sequence = [ { type = fixed, value = 7, rate = 500, duration = 2 } ]",
          triggerMs = 100L, sink = (stats, _) => { stats.collect(); () })
        wq.processAllAvailable(); wq.stop()
      }
      println(f"[probe] warmup ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val reps = sys.env.get("PROBE_REPS").map(_.toInt).getOrElse(1)
    val picked = SparkEntry.registry.filter(q => names.isEmpty || names(q.name))
    picked.foreach { q =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try force(q.build(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"${q.name} FAILED: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] ${q.name}%-24s ${ts.map(t => f"$t%8.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
