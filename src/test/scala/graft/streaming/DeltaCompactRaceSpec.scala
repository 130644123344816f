package graft.streaming

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier

import graft.SparkSpec

/** The concurrent-maintainer guard: [[DeltaCompact]]'s single-maintainer
  * CADENCE is the contract, but the operator error of two maintainers
  * racing one tree must degrade to exactly one clean
  * [[ConcurrentCompactionException]] — never interleaved base writes,
  * never a reader stranded on a GC'd generation — and a winner that
  * crashes between its rename and its pointer swap must be rolled
  * forward by the next maintainer, not wedge the slot sequence. */
class DeltaCompactRaceSpec extends SparkSpec {

  private def land(outDir: String, batchId: Long, from: Int, until: Int): Unit = {
    import spark.implicits._
    val df = (from until until).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    StreamShardRouter.landBatch(df, outDir, batchId, numShards = 4)
  }

  private def corpusIds(outDir: String): Seq[Long] =
    DeltaCompact.readCorpus(spark, outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def conf = spark.sparkContext.hadoopConfiguration

  test("two maintainers racing one generation slot: exactly one wins the claim") {
    val out = Files.createTempDirectory("graft_race1").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 40)
      val man = DeltaCompact.Manifest(0L, 0L)
      // both maintainers finish STAGING before either attempts the
      // rename — the barrier makes the claim race deterministic
      val staged = new CyclicBarrier(2)
      import spark.implicits._
      val results = (1 to 2).map { i =>
        var outcome: Either[Throwable, Unit] = Left(new IllegalStateException("did not run"))
        val r = new Thread(() => {
          outcome =
            try Right(DeltaCompact.commitStagedGeneration(out, man, conf) { staging =>
              Seq((i.toLong, s"from racer $i")).toDF("doc_id", "text")
                .withColumn("shard_id", org.apache.spark.sql.functions.lit(0))
                .write.mode("overwrite").partitionBy("shard_id").parquet(staging)
              staged.await()
            })
            catch { case e: Throwable => Left(e) }
        })
        (r, () => outcome)
      }
      results.foreach(_._1.start()); results.foreach(_._1.join(120000))
      val outcomes = results.map(_._2())
      val (losers, winners) = outcomes.partition(_.isLeft)
      assert(winners.size === 1 && losers.size === 1,
        s"exactly one maintainer must win the slot: $outcomes")
      assert(losers.head.swap.exists(_.isInstanceOf[ConcurrentCompactionException]),
        s"loser must fail with ConcurrentCompactionException: ${losers.head}")
      // the committed slot carries a complete generation + its manifest
      assert(DeltaCompact.readManifest(out, conf).contains(man))
      assert(DeltaCompact.readGenManifest(s"$out/base_gen=0", conf).exists(_._1 == man))
      // the loser's staging was deleted — no abandoned write debris
      val staging = new java.io.File(out, "_staging")
      assert(!staging.exists() || staging.listFiles().isEmpty,
        s"loser must clean its staging: ${Option(staging.listFiles()).map(_.toSeq)}")
      // …and none of it inside the WINNER'S base either: the local-FS
      // rename TOCTOU can `mv` the loser's staging INTO base_gen=0
      // (POSIX move-into-directory semantics) — a non-underscore
      // `gen=0.<nonce>/` subdirectory there breaks every partition-
      // inferring reader (CONFLICTING_PARTITION_COLUMN_NAMES, the
      // LshRefreshCrashRaceSpec flake). The abort path must sweep both.
      val baseEntries = new java.io.File(out, "base_gen=0").listFiles().toSeq
        .map(_.getName).filterNot(n => n.startsWith("_") || n.startsWith("."))
      assert(baseEntries.forall(n => n.startsWith("shard_id=") || n.startsWith("part-")),
        s"winner's base must hold only its own content: $baseEntries")
      // the committed base stays READABLE after the race
      assert(spark.read.parquet(s"$out/base_gen=0").count() === 1L)
      // tree stays fold-able after the race (the loser's delta is intact)
      land(out, 1, 40, 60)
      val man2 = DeltaCompact.compact(spark, out, numShards = 4)
      assert(man2.gen === 1L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("two full compact() calls racing one tree: no corruption, tree stays fold-able") {
    val out = Files.createTempDirectory("graft_race2").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 60); land(out, 1, 60, 120)
      val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, DeltaCompact.Manifest]]()
      val ts = (1 to 2).map(_ => new Thread(() => {
        outcomes.add(
          try Right(DeltaCompact.compact(spark, out, numShards = 4))
          catch { case e: Throwable => Left(e) })
      }))
      ts.foreach(_.start()); ts.foreach(_.join(180000))
      import scala.jdk.CollectionConverters._
      val (losers, winners) = outcomes.asScala.toSeq.partition(_.isLeft)
      // race outcomes: a genuine claim collision (one winner, one clean
      // Concurrent abort) or serialized execution (both commit, the
      // second as a no-op fold of zero deltas). Anything else is a bug.
      assert(winners.nonEmpty, s"at least one compact must commit: $losers")
      losers.foreach(l => assert(
        l.swap.exists(_.isInstanceOf[ConcurrentCompactionException]),
        s"a losing compact must abort cleanly: $l"))
      // EVERY row is still readable — no interleaved write corrupted the
      // committed base, no GC stranded the reader
      assert(corpusIds(out) == (0L until 120L))
      // and the tree keeps working
      land(out, 2, 120, 140)
      DeltaCompact.compact(spark, out, numShards = 4)
      assert(corpusIds(out) == (0L until 140L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("crash between rename and pointer swap: readers stay correct, next maintainer rolls forward") {
    val out = Files.createTempDirectory("graft_race3").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 30)
      DeltaCompact.compact(spark, out, numShards = 4) // gen 0, wm 0
      land(out, 1, 30, 60)
      val man1 = DeltaCompact.compact(spark, out, numShards = 4,
        retainSnapshots = 1) // gen 1, wm 1, history [(0,0)]
      assert(man1.gen === 1L && man1.history === Seq((0L, 0L)))
      // reconstruct the crash state "won the rename, died before the
      // pointer swap": regress the pointer to gen 0's manifest and
      // re-land the delta gen 1 folded (the real crash would have both —
      // GC only runs after the pointer swap)
      DeltaCompact.writeManifest(out, DeltaCompact.Manifest(0L, 0L), conf)
      land(out, 1, 30, 60)
      // readers are CORRECT in the crash state: pointer gen 0 + delta 1
      assert(corpusIds(out) == (0L until 60L))
      // the next maintainer adopts the orphan before its own fold
      val adopted = DeltaCompact.rollForward(out, conf)
      assert(adopted.contains(man1), s"roll-forward must adopt gen 1: $adopted")
      assert(DeltaCompact.readManifest(out, conf).contains(man1))
      assert(corpusIds(out) == (0L until 60L))
      // adoption ran gen 1's GC: folded delta swept, retained gen 0 kept
      assert(DeltaCompact.listDeltaBatches(out, conf).isEmpty)
      val gens = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("base_gen=")).map(_.getName).toSet
      assert(gens === Set("base_gen=0", "base_gen=1"))
      // and the slot sequence is unwedged: the next fold commits gen 2
      land(out, 2, 60, 80)
      val man2 = DeltaCompact.compact(spark, out, numShards = 4)
      assert(man2.gen === 2L)
      assert(corpusIds(out) == (0L until 80L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("crash before rename: staging orphan is invisible, slot stays free, TTL sweep collects it") {
    val out = Files.createTempDirectory("graft_race4").toFile.getAbsolutePath
    try {
      land(out, 0, 0, 30)
      // a maintainer staged gen 0 and died before its rename
      val orphan = s"$out/_staging/gen=0.dead-maintainer"
      import spark.implicits._
      Seq((999L, "orphan")).toDF("doc_id", "text")
        .withColumn("shard_id", org.apache.spark.sql.functions.lit(0))
        .write.partitionBy("shard_id").parquet(orphan)
      DeltaCompact.writeGenManifest(orphan, DeltaCompact.Manifest(0L, 0L),
        "dead-maintainer", conf)
      // invisible to readers, and the slot is still claimable
      assert(corpusIds(out) == (0L until 30L))
      val man = DeltaCompact.compact(spark, out, numShards = 4)
      assert(man.gen === 0L)
      assert(corpusIds(out) == (0L until 30L), "orphan rows must never surface")
      // young staging survives GC (an active racer must lose at its own
      // rename, not have files yanked from under its writer)…
      val f = DeltaCompact.fs(out, conf)
      assert(f.exists(new org.apache.hadoop.fs.Path(orphan)))
      // …but once older than the TTL it is dead by protocol and swept
      val old = System.currentTimeMillis() - DeltaCompact.StagingTtlMs - 60000
      f.setTimes(new org.apache.hadoop.fs.Path(orphan), old, old)
      land(out, 1, 30, 50)
      DeltaCompact.compact(spark, out, numShards = 4)
      assert(!f.exists(new org.apache.hadoop.fs.Path(orphan)),
        "expired staging orphan must be TTL-swept by the next GC")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }
}
