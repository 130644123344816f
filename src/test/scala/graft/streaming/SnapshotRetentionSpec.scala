package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Snapshot retention mechanics the `q_time_travel` oracle can't see:
  * the manifest's history field round-trips, GC keeps exactly
  * {current} ∪ retained, the retention window SLIDES (oldest snapshot
  * ages out), and un-retained generations refuse loudly. */
class SnapshotRetentionSpec extends SparkSpec {

  test("maintenance verbs preserve a deeper persisted policy: a default fold " +
    "on a retain-2 tree keeps policy + history; explicit still wins; the " +
    "detached sentinel floors at 1") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snapres").toFile.getAbsolutePath + "/t"
    def land(id: Long): Unit = {
      StreamShardRouter.landBatch(
        Seq((id, id * 10.0)).toDF("doc_id", "v"), dir, id)
      ()
    }
    try {
      // the round-16 ADVICE finding: nextManifest used to take the verb's
      // own (smaller) retainSnapshots verbatim, so a DEFAULT fold on a
      // retaining tree truncated the history and dropped the policy — the
      // silent time-travel loss the persisted `retain` field exists to
      // prevent. Default is now PreserveRetention, resolved at commit time.
      land(0L); land(1L)
      val m0 = DeltaCompact.compact(s, dir, retainSnapshots = 2) // gen 0, policy 2
      assert(m0.retain === 2 && m0.history.isEmpty)
      land(2L)
      val m1 = DeltaCompact.compact(s, dir) // DEFAULT: preserve, not reset-to-0
      assert(m1.retain === 2, "a default fold must keep the persisted policy")
      assert(m1.history === Seq((0L, 1L)))
      land(3L)
      val m2 = DeltaCompact.compact(s, dir)
      assert(m2.retain === 2 && m2.history === Seq((0L, 1L), (1L, 2L)))
      // the retained snapshots stayed readable across both default folds
      assert(DeltaCompact.readCorpusAsOf(s, dir, 0L).count() === 2)
      assert(DeltaCompact.readCorpusAsOf(s, dir, 1L).count() === 3)

      // explicit retention still wins: reducing policy is a deliberate act
      land(4L)
      val m3 = DeltaCompact.compact(s, dir, retainSnapshots = 0)
      assert(m3.retain === 0 && m3.history.isEmpty)

      // the detached sentinel floors at 1 on a non-retaining tree (a
      // detached commit races live serves) and preserves deeper policies
      land(5L)
      val m4 = DeltaCompact.compact(s, dir,
        retainSnapshots = DeltaCompact.PreserveRetentionDetached)
      assert(m4.retain === 1 && m4.history === Seq((m3.gen, m3.maxFoldedBatch)))
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir).getParentFile)
  }

  test("history round-trips; GC keeps current + retained; window slides; refusal is loud") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap").toFile.getAbsolutePath + "/t"
    def land(id: Long): Unit = {
      StreamShardRouter.landBatch(
        Seq((id, id * 10.0)).toDF("doc_id", "v"), dir, id)
      ()
    }
    try {
      land(0L); land(1L)
      val m0 = DeltaCompact.compact(s, dir) // gen 0
      assert(m0.history.isEmpty)
      land(2L)
      val m1 = DeltaCompact.compact(s, dir, retainSnapshots = 1) // gen 1
      assert(m1.history === Seq((0L, 1L)))
      // round-trip through the manifest file
      assert(DeltaCompact.readManifest(dir).get === m1)
      // both snapshots readable and correct
      assert(DeltaCompact.readCorpusAsOf(s, dir, 0L).count() === 2)
      assert(DeltaCompact.readCorpusAsOf(s, dir, 1L).count() === 3)
      // GC kept exactly current + retained
      def gens = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("base_gen=")).map(_.getName).toSet
      assert(gens === Set("base_gen=0", "base_gen=1"))

      // the window SLIDES: the next retained fold keeps gen 1, ages out gen 0
      land(3L)
      val m2 = DeltaCompact.compact(s, dir, retainSnapshots = 1) // gen 2
      assert(m2.history === Seq((1L, 2L)))
      assert(gens === Set("base_gen=1", "base_gen=2"))
      assert(DeltaCompact.readCorpusAsOf(s, dir, 1L).count() === 3)
      val e = intercept[IllegalArgumentException] {
        DeltaCompact.readCorpusAsOf(s, dir, 0L)
      }
      assert(e.getMessage.contains("not retained"))

      // snapshots are frozen: a delta landed after gen 2's fold shows in
      // the live view, never in a snapshot
      land(4L)
      assert(DeltaCompact.readCorpus(s, dir).count() === 5)
      assert(DeltaCompact.readCorpusAsOf(s, dir, 2L).count() === 4)

      // file-size targeting: maxRecordsPerFile splits a shard into
      // multiple right-sized files WITHIN the shard task, rows identical.
      // Fresh tree with 5 same-key rows so they hash to ONE shard.
      val dir2 = new java.io.File(dir).getParent + "/t2"
      StreamShardRouter.landBatch(
        (0 until 5).map(i => (7L, i * 1.0)).toDF("doc_id", "v"), dir2, 0L)
      val before = DeltaCompact.readCorpus(s, dir2)
        .collect().map(_.toString).sorted.toSeq
      DeltaCompact.compact(s, dir2, maxRecordsPerFile = 2L)
      val base = new java.io.File(dir2).listFiles()
        .filter(_.getName.startsWith("base_gen=")).head
      val parts = base.listFiles().filter(_.getName.startsWith("shard_id="))
        .flatMap(sd => sd.listFiles()).count(_.getName.endsWith(".parquet"))
      assert(parts >= 2, s"5 same-shard rows at maxRecordsPerFile=2 must split: $parts file(s)")
      assert(DeltaCompact.readCorpus(s, dir2)
        .collect().map(_.toString).sorted.toSeq === before)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir).getParentFile)
    }
  }
}
