package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** Recall-vs-scale measurement for the CAPPED LSH serve path (SCALE.md).
  *
  * The cap trades bucket-occupancy growth for recall decay: at fixed
  * geometry a 10× corpus puts ~10× the postings in each bucket, and the
  * [[graft.operators.Similarity]] `q_knn_lsh_capped` reservoir keeps only
  * `cap` of them — so the candidate pool stays O(1) but covers a
  * shrinking fraction of each bucket. The standard fix is geometric:
  * bits ∝ log n (one extra sign bit halves expected occupancy), which
  * this smoke demonstrates by measuring recall@K against the brute-force
  * truth at the base corpus and at 10×, at BOTH the registry geometry
  * and a log-n-adjusted wider-bits geometry.
  *
  * Run on demand (minutes by design, not part of the driver bench):
  * `sbt "runMain graft.LshRecallSmoke [baseDir] [10xDir]"`.
  */
object LshRecallSmoke {

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(1).getOrElse("/tmp/graft_scale10x_c10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SessionTuning.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    // mean per-query recall@K of the capped-LSH serve vs brute-force truth
    def recall(dir: String, tables: Int, bits: Int): Double = {
      val truth = topSets(Similarity.qKnnBrute.build(spark, dir))
      val got = topSets(Similarity.knnLshCapped(
        Tables.embeddings(spark, dir), tables, bits))
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }

    // auto-sized rows: bits from Similarity.lshGeometry(corpusCount) —
    // the sizer must reproduce the hand-tuned geometry at 1× and hold
    // recall ≥ the 1× figure at 10× without a human picking bits
    def autoBits(dir: String): Int =
      Similarity.lshGeometry(Tables.embeddings(spark, dir).count())

    println(f"${"corpus"}%-34s ${"geometry"}%-12s ${"recall@K"}%9s")
    Seq(
      (baseDir, 8, 8, ""),                      // registry geometry at the base corpus
      (bigDir, 8, 8, ""),                       // same geometry, 10× occupancy per bucket
      (bigDir, 8, 11, ""),                      // bits ∝ log n: +⌈log2 10⌉ bits restores occupancy
      (bigDir, 8, 12, ""),                      // one further bit, the over-correction check
      (baseDir, 8, autoBits(baseDir), "auto"),  // lshGeometry at 1×
      (bigDir, 8, autoBits(bigDir), "auto")     // lshGeometry at 10×
    ).foreach { case (dir, tables, bits, tag) =>
      val r = recall(dir, tables, bits)
      println(f"$dir%-34s ${s"${tables}t x ${bits}b $tag"}%-12s $r%9.3f")
    }
    spark.stop()
  }
}
