package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.streaming.{DeltaCompact, StreamLshIngest}

/** Scale measurement for the round-12 lifecycle operators (SCALE.md):
  *
  *  1. persisted near-dup serve — a FIXED incoming batch (the base id
  *     range's doc_id ≡ 7 mod 10, same 500 docs at every scale) checked
  *     against the landed corpus signature index at 1× and 10×. The
  *     claim under test: serve cost is batch + index-join bound, NOT
  *     corpus-text bound — the corpus decade should barely move the
  *     serve leg while the index build (one signing pass) rides it.
  *
  *  2. tombstone deletes on the LSH posting index — logical serve (the
  *     readPostingsLive anti-join) vs plain serve at both scales: the
  *     claim is that lazy deletion costs ~nothing at serve time; plus
  *     the physical fold (compactPostings with tombstones applied).
  *
  * Run on demand (minutes by design, not part of the driver bench):
  * `sbt "runMain graft.LifecycleScaleSmoke [baseDir] [10xFlatDir]"`.
  */
object LifecycleScaleSmoke {

  private def timed[T](what: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(1).getOrElse("/tmp/graft_scale10x_c10_flat")
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
    graft.functions.GraftFunctions.register(spark)

    // the fixed incoming batch: base-range ids only, so the SAME 500
    // docs serve against both corpus scales
    val baseDocs = Tables.documents(spark, baseDir).count()

    for ((dir, tag) <- Seq((baseDir, "1x"), (bigDir, "10x"))) {
      println(s"== $tag ($dir)")
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val emb = Tables.embeddings(spark, dir)

      // ---- 1. persisted near-dup: build rides the corpus, serve doesn't
      val ndDir = s"/tmp/graft_smoke_neardup_$tag"
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      println(s"  corpus docs: ${corpus.count()}")
      timed(s"neardup index build ($tag corpus)") {
        Dedup.buildNeardupIndex(corpus, ndDir)
      }
      val incoming = docs
        .filter(col("doc_id") % 10 === 7 && col("doc_id") < baseDocs)
        .localCheckpoint()
      println(s"  incoming batch (fixed): ${incoming.count()} docs")
      val flagged = timed(s"neardup serve (fixed batch vs $tag index)") {
        Dedup.neardupServe(spark, ndDir, incoming).count()
      }
      println(s"  flagged near-dups: $flagged")

      // ---- 2. LSH delete lifecycle: lazy serve cost, physical fold cost
      val idxDir = s"/tmp/graft_smoke_lshdel_$tag"
      val p = new org.apache.hadoop.fs.Path(idxDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      timed(s"LSH posting delta land ($tag corpus)") {
        StreamLshIngest.landPostingsDelta(Similarity.lshPostings(emb), idxDir, 0L)
      }
      val probes = Similarity.lshQueryProbes(emb).localCheckpoint()
      val plain = timed(s"serve PRE-delete (plain read, $tag)") {
        Similarity.lshServeJoin(
          StreamLshIngest.readPostings(spark, idxDir).drop("tb_hi"), probes).count()
      }
      StreamLshIngest.landTombstones(
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id").as("neighbor_id")),
        idxDir, 0L)
      val lazyServe = timed(s"serve POST-delete LOGICAL (anti-join, $tag)") {
        Similarity.lshServeJoin(
          StreamLshIngest.readPostingsLive(spark, idxDir).drop("tb_hi"), probes).count()
      }
      timed(s"physical fold (compactPostings + tombstone apply, $tag)") {
        StreamLshIngest.compactPostings(spark, idxDir)
      }
      val folded = timed(s"serve POST-fold (plain read, $tag)") {
        Similarity.lshServeJoin(
          StreamLshIngest.readPostings(spark, idxDir).drop("tb_hi"), probes).count()
      }
      println(s"  serve rows pre/lazy/folded: $plain/$lazyServe/$folded; " +
        s"tombstones left: ${DeltaCompact.listTombstoneBatches(idxDir).size}")
    }
    spark.stop()
  }
}
