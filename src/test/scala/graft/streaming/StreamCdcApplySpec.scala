package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The CDC apply's protocol facts the `q_cdc_stream` oracle can't see:
  * crash-replay idempotence (the pinned tombstone watermark means a
  * re-landed batch never deletes its own rows), version supersession
  * across folds, and delete-then-reinsert. */
class StreamCdcApplySpec extends SparkSpec {

  private def batch(rows: (Long, String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "op", "v")
  }

  private def table(dir: String): Map[Long, Double] =
    StreamCdcApply.currentTable(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("v")).toMap

  test("upsert/delete/reinsert across batches; replay idempotent; fold transparent") {
    val s = spark
    val dir = Files.createTempDirectory("graft_cdc").toFile.getAbsolutePath + "/t"
    try {
      // batch 0: keys 1, 2, 3
      StreamCdcApply.applyBatch(
        batch((1L, "U", 10.0), (2L, "U", 20.0), (3L, "U", 30.0)), dir, 0L)
      assert(table(dir) === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))

      // batch 1: update 1, delete 2
      StreamCdcApply.applyBatch(batch((1L, "U", 11.0), (2L, "D", 0.0)), dir, 1L)
      assert(table(dir) === Map(1L -> 11.0, 3L -> 30.0))

      // crash-replay of batch 1 (at-least-once delivery): same bits —
      // the pinned watermark (b−1) means the re-land can't kill its own
      // data, and both writes overwrite their own directories
      StreamCdcApply.applyBatch(batch((1L, "U", 11.0), (2L, "D", 0.0)), dir, 1L)
      assert(table(dir) === Map(1L -> 11.0, 3L -> 30.0))

      // fold, then reinsert the deleted key
      StreamCdcApply.compactTable(s, dir)
      assert(DeltaCompact.listTombstoneBatches(dir).isEmpty)
      assert(table(dir) === Map(1L -> 11.0, 3L -> 30.0))
      StreamCdcApply.applyBatch(batch((2L, "U", 22.0)), dir, 2L)
      assert(table(dir) === Map(1L -> 11.0, 2L -> 22.0, 3L -> 30.0))

      // physically: exactly one version per key after the next fold
      StreamCdcApply.compactTable(s, dir)
      val counts = DeltaCompact.readCorpus(s, dir)
        .groupBy("doc_id").count().collect().map(_.getLong(1)).toSet
      assert(counts === Set(1L), "post-fold base must hold ONE version per key")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir).getParentFile)
    }
  }
}
