package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Shard elasticity: `shard_id` is a FOLD parameter, not a table
  * constant. A tree landed narrow when the corpus was small must widen
  * on an ordinary generation fold ([[StreamShardRouter.reshardOnFold]])
  * — same rows, new deterministic assignment, per-shard reads pruned at
  * the new width — and end up indistinguishable from a tree landed at
  * the new width from day one. */
class DeltaCompactReshardSpec extends SparkSpec {

  private def land(outDir: String, batchId: Long, from: Int, until: Int,
      numShards: Int): Unit = {
    import spark.implicits._
    val df = (from until until).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    StreamShardRouter.landBatch(df, outDir, batchId, numShards)
  }

  private def snapshot(outDir: String): Seq[(Long, String, Int)] =
    DeltaCompact.readCorpus(spark, outDir)
      .select("doc_id", "text", "shard_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq

  test("a 4-shard tree widens to 8 on the fold: rows intact, assignment = withShard(8), pruning at the new width") {
    val out = Files.createTempDirectory("graft_reshard1").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 60, numShards = 4)
      land(out, 1, 60, 120, numShards = 4)
      val before = snapshot(out)
      assert(before.map(_._3).distinct.forall(_ < 4))

      StreamShardRouter.reshardOnFold(spark, out, newShards = 8)
      val after = snapshot(out)
      // same rows, re-assigned
      assert(after.map(t => (t._1, t._2)) === before.map(t => (t._1, t._2)))
      // every row sits exactly where a day-one 8-shard landing would put it
      import spark.implicits._
      val expect = StreamShardRouter.withShard(
        (0 until 120).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text"), 8)
        .select("doc_id", "shard_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      after.foreach { case (id, _, s) => assert(s === expect(id),
        s"doc $id landed in shard $s, withShard(8) says ${expect(id)}") }
      assert(after.map(_._3).distinct.size > 4, "the fan-out actually widened")
      // the base is physically partitioned at the new width — a
      // per-shard read is a pruned directory scan
      val gen = DeltaCompact.readManifest(out,
        spark.sparkContext.hadoopConfiguration).get.gen
      val dirs = new java.io.File(s"$out/base_gen=$gen").listFiles()
        .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
      assert(dirs.length === after.map(_._3).distinct.size)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("reshard ≡ day-one width; straggler old-width deltas absorbed by the next reshard fold") {
    val out = Files.createTempDirectory("graft_reshard2").toFile.getAbsolutePath
    val dayOne = Files.createTempDirectory("graft_reshard2b").toFile.getAbsolutePath
    try {
      // narrow tree, widened on the fold, then a straggler that still
      // landed at the OLD width (the ingest that hadn't switched yet)
      land(out, 0, 0, 80, numShards = 4)
      StreamShardRouter.reshardOnFold(spark, out, newShards = 8)
      land(out, 1, 80, 100, numShards = 4)
      StreamShardRouter.reshardOnFold(spark, out, newShards = 8) // idempotent re-assign
      // the control: everything landed at 8 from day one, one plain fold
      land(dayOne, 0, 0, 80, numShards = 8)
      land(dayOne, 1, 80, 100, numShards = 8)
      DeltaCompact.compact(spark, dayOne, numShards = 8)
      assert(snapshot(out) === snapshot(dayOne),
        "a widened tree must be indistinguishable from a day-one-wide one")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dayOne))
    }
  }

  test("reshard preserves snapshot retention: retained generations stay time-travel readable across the width change") {
    val out = Files.createTempDirectory("graft_reshard4").toFile.getAbsolutePath
    try {
      // a retaining tree: two folds with retainSnapshots = 2, so gens 0
      // and 1 are both committed and gen 0 is retained history
      land(out, 0, 0, 40, numShards = 4)
      DeltaCompact.compact(spark, out, numShards = 4, retainSnapshots = 2)
      land(out, 1, 40, 80, numShards = 4)
      DeltaCompact.compact(spark, out, numShards = 4, retainSnapshots = 2)
      val before = DeltaCompact.readManifest(out,
        spark.sparkContext.hadoopConfiguration).get
      assert(before.history.map(_._1) === Seq(0L))

      // the DEFAULT reshard must not truncate that history (the round-13
      // ADVICE finding: retainSnapshots used to default to 0 here, so the
      // fold's takeRight(0) emptied the history and GC deleted the
      // retained base_gen dirs, silently breaking readCorpusAsOf)
      land(out, 2, 80, 100, numShards = 4)
      StreamShardRouter.reshardOnFold(spark, out, newShards = 8)
      val after = DeltaCompact.readManifest(out,
        spark.sparkContext.hadoopConfiguration).get
      // every previously retained snapshot survives, and the pre-reshard
      // generation joined the history (the tree retains, so the fold
      // keeps what it folds away)
      assert(after.history.map(_._1) === Seq(0L, 1L))
      // time travel to BOTH old generations still reads the old layout
      assert(DeltaCompact.readCorpusAsOf(spark, out, 0L).count() === 40L)
      assert(DeltaCompact.readCorpusAsOf(spark, out, 1L).count() === 80L)
      // the resharded current generation carries the new width
      val cur = snapshot(out)
      assert(cur.map(_._1) === (0L until 100L))
      assert(cur.map(_._3).distinct.size > 4)

      // an explicit retainSnapshots still wins over the preserve default
      land(out, 3, 100, 110, numShards = 4)
      StreamShardRouter.reshardOnFold(spark, out, newShards = 8,
        retainSnapshots = 0)
      val cleared = DeltaCompact.readManifest(out,
        spark.sparkContext.hadoopConfiguration).get
      assert(cleared.history.isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("reshard preserves retention on a tree folded only ONCE: the persisted " +
    "policy, not the (still empty) history depth, is what preserve reads") {
    val out = Files.createTempDirectory("graft_reshard6").toFile.getAbsolutePath
    try {
      // ONE fold with retainSnapshots = 2: history is still empty (there
      // was no previous generation to retain) but the POLICY is persisted
      // in the manifest — the case depth-inference gets wrong (the
      // round-14 ADVICE finding: a retaining tree folded once looked
      // identical to a non-retaining tree, so the default reshard GC'd
      // the pre-reshard generation, silently losing its time travel)
      land(out, 0, 0, 40, numShards = 4)
      DeltaCompact.compact(spark, out, numShards = 4, retainSnapshots = 2)
      val before = DeltaCompact.readManifest(out,
        spark.sparkContext.hadoopConfiguration).get
      assert(before.history.isEmpty && before.retain === 2)

      land(out, 1, 40, 60, numShards = 4)
      StreamShardRouter.reshardOnFold(spark, out, newShards = 8)
      val after = DeltaCompact.readManifest(out,
        spark.sparkContext.hadoopConfiguration).get
      // the pre-reshard generation survives as retained history, and the
      // policy rides along for the NEXT maintenance verb
      assert(after.history.map(_._1) === Seq(0L))
      assert(after.retain === 2)
      assert(DeltaCompact.readCorpusAsOf(spark, out, 0L).count() === 40L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("reshard on a NON-retaining tree keeps the GC-everything default: no history appears") {
    val out = Files.createTempDirectory("graft_reshard5").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 40, numShards = 4)
      DeltaCompact.compact(spark, out, numShards = 4) // retainSnapshots = 0
      land(out, 1, 40, 60, numShards = 4)
      StreamShardRouter.reshardOnFold(spark, out, newShards = 8)
      val man = DeltaCompact.readManifest(out,
        spark.sparkContext.hadoopConfiguration).get
      assert(man.history.isEmpty,
        "preserve-retention on an empty history must stay empty")
      // and the old base is GC'd as before
      val bases = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("base_gen=")).map(_.getName).toSeq
      assert(bases === Seq(s"base_gen=${man.gen}"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("reshard composes with tombstones: deletes apply on the same fold that widens") {
    val out = Files.createTempDirectory("graft_reshard3").toFile.getAbsolutePath
    try {
      import spark.implicits._
      land(out, 0, 0, 100, numShards = 4)
      DeltaCompact.landTombstones((0L until 10L).toDF("doc_id"), out, 0L)
      StreamShardRouter.reshardOnFold(spark, out, newShards = 8,
        tombstoneKey = Some("doc_id"))
      val after = snapshot(out)
      assert(after.map(_._1) === (10L until 100L))
      assert(DeltaCompact.listTombstoneBatches(out,
        spark.sparkContext.hadoopConfiguration).isEmpty)
      assert(after.map(_._3).distinct.size > 4)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }
}
