package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[DeltaCompact]]'s contract: folding landed `batch=` deltas into a
  * generation-numbered base changes the FILES, never the rows — and the
  * manifest commit makes the fold atomic (a half-written new base is
  * invisible, folded deltas are GC'd only after commit). */
class DeltaCompactSpec extends SparkSpec {

  private def land(outDir: String, batchId: Long, from: Int, until: Int): Unit = {
    import spark.implicits._
    val df = (from until until).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    StreamShardRouter.landBatch(df, outDir, batchId, numShards = 4)
  }

  private def corpusIds(outDir: String): Seq[Long] =
    DeltaCompact.readCorpus(spark, outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("compaction folds deltas into one file per shard with identical rows") {
    val out = Files.createTempDirectory("graft_compact").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 40); land(out, 1, 40, 80); land(out, 2, 80, 120)
      val before = corpusIds(out)
      assert(before == (0L until 120L))
      val filesBefore = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(out), Array("parquet"), true).size

      val man = DeltaCompact.compact(spark, out, numShards = 4)
      assert(man.gen === 0L && man.maxFoldedBatch === 2L)
      assert(DeltaCompact.readManifest(out).contains(man))

      // rows identical, shard routing preserved
      val after = DeltaCompact.readCorpus(spark, out)
      assert(after.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == before)
      val reshard = StreamShardRouter.withShard(
        after.select("doc_id", "text"), numShards = 4)
      assert(after.join(reshard.withColumnRenamed("shard_id", "expect_shard"), "doc_id")
        .filter(col("shard_id") =!= col("expect_shard")).count() === 0)

      // the small-files problem actually shrank: ≤ 1 file per shard now
      val filesAfter = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(out), Array("parquet"), true).size
      assert(filesAfter <= 4 && filesAfter < filesBefore,
        s"expected ≤4 compacted files, got $filesAfter (was $filesBefore)")
      // folded deltas are GC'd after commit
      assert(DeltaCompact.listDeltaBatches(out).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("post-compaction landings stack as new deltas; re-compaction folds them") {
    val out = Files.createTempDirectory("graft_compact2").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 50)
      DeltaCompact.compact(spark, out, numShards = 4)
      land(out, 7, 50, 90) // resumed batch ids after the fold watermark
      assert(corpusIds(out) == (0L until 90L), "base + fresh delta must compose")

      val man2 = DeltaCompact.compact(spark, out, numShards = 4)
      assert(man2.gen === 1L && man2.maxFoldedBatch === 7L)
      assert(corpusIds(out) == (0L until 90L))
      // the old generation's directory is GC'd after the new commit
      assert(!new java.io.File(s"$out/base_gen=0").exists())
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("graced tombstone GC ages from the _applied marker: a tombstone " +
    "landed long before its application still gets a FULL grace window") {
    val out = Files.createTempDirectory("graft_tsgrace").toFile.getAbsolutePath
    try {
      import spark.implicits._
      land(out, 0, 0, 40)
      DeltaCompact.landTombstones((0L until 5L).toDF("doc_id"), out, 0L)
      val conf = spark.sparkContext.hadoopConfiguration
      val tsDir = new java.io.File(s"$out/_tombstones/batch=0")
      // age the LANDING well past the grace — the hazard case: the dir's
      // own mtime says "old", but the application (and any reader plan
      // racing it) is NOW, so deleting on the first sweep would yank the
      // directory from under a concurrent reader that just listed it
      assert(tsDir.setLastModified(System.currentTimeMillis() - 60000))

      // first graced sweep: MARK, never delete — the age clock starts at
      // application time (the marker's mtime), not landing time
      DeltaCompact.gcTombstoneBatches(out, Seq(0L), conf, graceMs = 5000L)
      assert(tsDir.exists(), "first graced sweep must mark, not delete")
      val marker = new java.io.File(tsDir, "_applied")
      assert(marker.exists())
      // marked ⇒ zero maintenance pressure, but still applied by readers
      assert(DeltaCompact.listPendingTombstoneBatches(out, conf).isEmpty)
      assert(DeltaCompact.listTombstoneBatches(out, conf) === Seq(0L))

      // second sweep inside the grace: still retained (the old dir-mtime
      // clock would have deleted here — and the marker creation itself
      // must not have reset anything, since the marker IS the clock)
      DeltaCompact.gcTombstoneBatches(out, Seq(0L), conf, graceMs = 5000L)
      assert(tsDir.exists())

      // once the MARKER ages past the grace, the sweep deletes
      assert(marker.setLastModified(System.currentTimeMillis() - 10000))
      DeltaCompact.gcTombstoneBatches(out, Seq(0L), conf, graceMs = 5000L)
      assert(!tsDir.exists())

      // and sweeping an already-swept id is a clean no-op (the concurrent
      // -maintainer FileNotFound race reads as already-done, not a crash)
      DeltaCompact.gcTombstoneBatches(out, Seq(0L), conf, graceMs = 5000L)
      DeltaCompact.gcTombstoneBatches(out, Seq(0L), conf)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("crash safety: an uncommitted base generation is invisible to readers") {
    val out = Files.createTempDirectory("graft_compact3").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 30)
      val man = DeltaCompact.compact(spark, out, numShards = 4)
      land(out, 1, 30, 60)
      // simulate a compaction that died after step 1 (base written) but
      // before step 2 (manifest commit): a stray next-gen directory with
      // garbage content must not be read
      import spark.implicits._
      Seq((999L, "garbage")).toDF("doc_id", "text")
        .withColumn("shard_id", lit(0))
        .write.partitionBy("shard_id").parquet(s"$out/base_gen=${man.gen + 1}")
      assert(corpusIds(out) == (0L until 60L),
        "reader must go through the manifest, not directory listing")
      // and the NEXT compaction recovers: overwrites the orphan and commits
      val man2 = DeltaCompact.compact(spark, out, numShards = 4)
      assert(man2.gen === man.gen + 1)
      assert(corpusIds(out) == (0L until 60L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("deltas older than the fold watermark are ignored on read (replay shadow)") {
    val out = Files.createTempDirectory("graft_compact4").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 20)
      DeltaCompact.compact(spark, out, numShards = 4)
      // an at-least-once redelivery re-lands an already-folded batch id:
      // readCorpus must NOT double-count it against the base
      land(out, 0, 0, 20)
      assert(corpusIds(out) == (0L until 20L),
        "re-landed folded batch must be shadowed by the watermark")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("corrupt manifest history fails loudly instead of forgetting snapshots") {
    val out = Files.createTempDirectory("graft_compact5").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 20)
      DeltaCompact.compact(spark, out, numShards = 4)
      land(out, 1, 20, 40)
      DeltaCompact.compact(spark, out, numShards = 4, retainSnapshots = 1)
      // corrupt ONE history entry (drop its maxFoldedBatch field): a
      // silently-dropped entry would let the next gcFolded delete the
      // still-retained base generation — must throw, like the scalar
      // fields do
      val p = new java.io.File(out, "_compaction.json")
      val txt = new String(java.nio.file.Files.readAllBytes(p.toPath))
      assert(txt.contains("history"), s"expected retained history in $txt")
      val bad = txt.replaceAll(""","maxFoldedBatch":-?\d+\}]""", "}]")
      assert(bad != txt, s"corruption did not apply to $txt")
      java.nio.file.Files.write(p.toPath, bad.getBytes)
      // the local FS keeps a checksum sidecar; the hand-corruption above
      // bypasses it — drop it so the read reaches the manifest parser
      new java.io.File(out, "._compaction.json.crc").delete()
      val e = intercept[IllegalStateException](DeltaCompact.readManifest(out))
      assert(e.getMessage.contains("history"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }
}
