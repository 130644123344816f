package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

/** The streamed RAG lifecycle gate's MECHANICS, pinned alongside its
  * oracle: `q_hybrid_stream_persist` must really run the lifecycle it
  * claims — multi-batch ingest for BOTH indexes, a generation fold
  * committed MID-RUN (not a single afterthought compaction), post-fold
  * deltas still landing, and a serve equal to the batch-built hybrid
  * fusion. The DuckDB oracle can only see the final rows; this spec
  * inspects the landed artifacts the run leaves behind. */
class HybridStreamLifecycleSpec extends SparkSpec {

  test("gate runs the full lifecycle: 4 batches, mid-run folds, post-fold deltas, exact serve") {
    val s = spark
    val before = latestRunDirs()
    val got = Similarity.qHybridStreamPersist.build(s, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty, "gate returned no rows")

    // the run dir this build created (runs are monotonic per pid)
    val runDir = (latestRunDirs() -- before).toSeq match {
      case Seq(d) => d
      case other  => fail(s"expected exactly one new run dir, got $other")
    }

    // lexical side: the mid-run fold committed at batch 1, so the index
    // tree must hold a manifest with maxFoldedBatch=1 and batches 2-3 as
    // post-fold deltas (GC removed 0-1)
    val lexIdx = s"$runDir/lex/idx"
    val lexMan = DeltaCompact.readManifest(lexIdx)
      .getOrElse(fail("lexical index has no compaction manifest — mid-run fold didn't commit"))
    assert(lexMan.maxFoldedBatch === 1L, s"lexical fold watermark: $lexMan")
    assert(DeltaCompact.listDeltaBatches(lexIdx) === Seq(2L, 3L),
      "lexical batches 2-3 should be post-fold deltas (0-1 GC'd into the base)")

    // semantic side: same protocol on the posting deltas
    val semIdx = s"$runDir/sem_idx"
    val semMan = DeltaCompact.readManifest(semIdx)
      .getOrElse(fail("LSH postings have no compaction manifest — mid-run fold didn't commit"))
    assert(semMan.maxFoldedBatch === 1L, s"semantic fold watermark: $semMan")
    assert(DeltaCompact.listDeltaBatches(semIdx) === Seq(2L, 3L),
      "LSH batches 2-3 should be post-fold deltas")

    // 4 real ingest batches landed on both corpora
    assert(new java.io.File(s"$runDir/lex/docs").listFiles()
      .count(_.getName.startsWith("batch=")) === 4)
    assert(new java.io.File(s"$runDir/sem_docs").listFiles()
      .count(_.getName.startsWith("batch=")) === 4)

    // serve parity with the batch-built branches composed through the
    // same fusion: the streamed gate's rows are the in-flight gates'
    // fusion bit-for-bit (its oracle is already the composed SQL; this
    // is the engine-side spelling of the same invariant)
    val lex = graft.operators.TextAnalysis.qBm25TopK.build(s, sf)
      .filter(col("query_id") < 5)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val sem = Similarity.qKnnLsh.build(s, sf)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val expect = Similarity.rrfFuse(lex, sem)
      .collect().map(_.toString).sorted.toSeq
    assert(got === expect,
      "streamed-lifecycle serve diverged from the batch-built hybrid fusion")
  }

  private def latestRunDirs(): Set[String] =
    Option(new java.io.File("/tmp/graft_hybridstream").listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getAbsolutePath).toSet
}
