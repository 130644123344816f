package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print `explain("formatted")` for the headline queries
  * (or any names passed as args) at sf0.001 — the one-command way to
  * check that filters reach scans, small sides broadcast, and
  * whole-stage codegen spans the hot path. The committed PLANS.md is this
  * output, annotated.
  *
  * Usage: `sbt "runMain graft.Plans [name,name,...]"`
  */
object Plans {

  /** One query per plan family: scan+agg, LSH bucket join, bloom-pruned
    * join, composed ANN index, incremental merge, window family, z-order
    * audit, co-located bucketed join, window-pass dup-span, CDC row
    * merge. */
  val Headline: Seq[String] = Seq(
    "q1_agg", "q_minhash_pairs", "q_bloom_join", "q_knn_ivf_pq",
    "q_incr_rollup", "q_window_rank", "q_zorder_layout",
    "q_bucketed_join", "q_dup_span_coverage", "q_merge_upsert")

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq).getOrElse(Headline)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SessionTuning.tune(spark) // shared ObjectHashAggregate fallback sizing
    spark.sparkContext.setLogLevel("ERROR")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query: $n"))
      println(s"\n===== $n =====")
      q.build(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
