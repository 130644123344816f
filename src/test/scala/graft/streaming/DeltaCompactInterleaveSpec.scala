package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The forward-landing guarantee, EXERCISED instead of asserted:
  * [[DeltaCompact.compact]] documents that a batch or tombstone landing
  * while a fold runs needs no coordination — deltas and tombstone
  * batches are captured ONCE, the fold reads exactly those, and
  * anything landing later stays pending above the committed watermark.
  * The race spec (DeltaCompactRaceSpec) covers maintainer-vs-maintainer;
  * this spec covers maintainer-vs-INGEST, deterministically: the
  * `extraStage` staging callback runs inside the fold (after the base
  * write, before the claim/commit/GC), so landing from within it IS the
  * mid-fold interleaving — no thread timing to get lucky with. */
class DeltaCompactInterleaveSpec extends SparkSpec {

  private def land(outDir: String, batchId: Long, from: Int, until: Int): Unit = {
    import spark.implicits._
    val df = (from until until).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    StreamShardRouter.landBatch(df, outDir, batchId, numShards = 4)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def conf = spark.sparkContext.hadoopConfiguration

  test("data batch landing mid-fold stays a delta above the committed watermark") {
    val out = Files.createTempDirectory("graft_ilv1").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 40)
      land(out, 1, 40, 80)
      // batch 2 lands while gen 0 is being staged — after the fold
      // captured its delta list, before commit and delta-GC
      val man = DeltaCompact.compact(spark, out, numShards = 4,
        extraStage = _ => land(out, 2, 80, 100))
      assert(man.gen === 0L && man.maxFoldedBatch === 1L,
        "the fold must cover exactly the batches it captured")
      // the mid-fold batch survived the sweep as a pending delta...
      assert(DeltaCompact.listDeltaBatches(out, conf) === Seq(2L))
      // ...and is visible NOW, stacked on the new base: no loss, no dupes
      assert(ids(DeltaCompact.readCorpus(spark, out)) === (0L until 100L))
      // the next fold absorbs it
      val man2 = DeltaCompact.compact(spark, out, numShards = 4)
      assert(man2.gen === 1L && man2.maxFoldedBatch === 2L)
      assert(DeltaCompact.listDeltaBatches(out, conf).isEmpty)
      assert(ids(DeltaCompact.readCorpus(spark, out)) === (0L until 100L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("tombstone landing mid-fold applies logically, survives the fold's GC, folds physically next time") {
    val out = Files.createTempDirectory("graft_ilv2").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 40)
      land(out, 1, 40, 80)
      // a delete captured BY the fold (keys 0-9) and a delete landing
      // MID-fold (keys 20-29) — only the captured one may fold away
      import spark.implicits._
      DeltaCompact.landTombstones(
        (0L until 10L).toDF("doc_id"), out, batchId = 0L)
      val man = DeltaCompact.compact(spark, out, numShards = 4,
        tombstoneKey = Some("doc_id"),
        extraStage = _ => DeltaCompact.landTombstones(
          (20L until 30L).toDF("doc_id"), out, batchId = 1L))
      assert(man.gen === 0L && man.maxFoldedBatch === 1L)
      // captured tombstone applied physically + GC'd; mid-fold one pending
      assert(DeltaCompact.listTombstoneBatches(out, conf) === Seq(1L))
      assert(ids(DeltaCompact.readCorpus(spark, out)) === (10L until 80L),
        "the base drops the captured delete but still carries 20-29 physically")
      // ...yet the mid-fold delete is already EXACT logically
      assert(ids(DeltaCompact.readCorpusLive(spark, out)) ===
        ((10L until 20L) ++ (30L until 80L)),
        "a delete landed mid-fold must apply via the live read immediately")
      // the next fold applies it physically and sweeps it
      val man2 = DeltaCompact.compact(spark, out, numShards = 4,
        tombstoneKey = Some("doc_id"))
      assert(man2.gen === 1L)
      assert(DeltaCompact.listTombstoneBatches(out, conf).isEmpty)
      assert(ids(DeltaCompact.readCorpus(spark, out)) ===
        ((10L until 20L) ++ (30L until 80L)))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("sequence rule across a fold: a key deleted mid-fold and re-ingested in a later mid-fold batch keeps the new copy") {
    val out = Files.createTempDirectory("graft_ilv3").toFile.getAbsolutePath
    try {
      import spark.implicits._
      land(out, 0, 0, 40)
      land(out, 1, 40, 80)
      // mid-fold: delete key 5 as-of watermark 1, THEN re-ingest it in
      // batch 2 — the delete-then-recrawl upsert, interleaved with a fold
      val man = DeltaCompact.compact(spark, out, numShards = 4,
        extraStage = { _ =>
          DeltaCompact.landTombstones(Seq(5L).toDF("doc_id"), out, batchId = 0L)
          StreamShardRouter.landBatch(
            Seq((5L, "doc 5 recrawled")).toDF("doc_id", "text"),
            out, batchId = 2L, numShards = 4)
        })
      assert(man.maxFoldedBatch === 1L)
      // live view: exactly one copy of key 5 — the recrawled one. The
      // folded base copy carries sequence 1 (= the fold watermark) and
      // dies under the wm=1 tombstone; the batch-2 copy (sequence 2)
      // postdates the delete and survives.
      val live = DeltaCompact.readCorpusLive(spark, out)
      val copies = live.filter(col("doc_id") === 5L)
        .select("text").collect().map(_.getString(0)).toSeq
      assert(copies === Seq("doc 5 recrawled"),
        s"the sequence rule must keep exactly the post-delete copy: $copies")
      assert(live.count() === 80L)
      // the physical fold agrees bit-for-bit with the logical view
      DeltaCompact.compact(spark, out, numShards = 4,
        tombstoneKey = Some("doc_id"))
      assert(DeltaCompact.listTombstoneBatches(out, conf).isEmpty)
      val folded = DeltaCompact.readCorpus(spark, out)
      assert(folded.count() === 80L)
      assert(folded.filter(col("doc_id") === 5L)
        .select("text").collect().map(_.getString(0)).toSeq ===
        Seq("doc 5 recrawled"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }
}
