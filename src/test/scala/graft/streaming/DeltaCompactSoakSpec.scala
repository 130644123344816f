package graft.streaming

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import graft.SparkSpec

/** The forward-landing guarantee as a PROPERTY, not one exercised
  * interleaving: an ingest thread lands data batches and tombstones
  * (with the sequence-rule upsert pattern — delete, then re-ingest the
  * key in a later batch) while one or two maintainer threads fold the
  * same tree under randomized schedules. Whatever the interleaving, the
  * final live view must equal the lander's own model of what survives —
  * and after a final quiescent fold, the PHYSICAL corpus must equal it
  * too. 20 seeded iterations; failures print their seed and reproduce.
  *
  * Dual-maintainer iterations additionally exercise the generation
  * claim under load: losers must abort with
  * [[ConcurrentCompactionException]] only, and they run with
  * `gcGraceMs` + snapshot retention — the documented settings for any
  * tree folded while others may be mid-plan (grace keeps captured
  * deltas/tombstones readable; retention keeps a superseded base
  * readable). */
class DeltaCompactSoakSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  /** One randomized iteration. Returns unit or fails with the seed in
    * the message. */
  private def runIteration(seed: Long, dualMaintainer: Boolean): Unit = {
    val rnd = new Random(seed)
    val out = Files.createTempDirectory(s"graft_soak_$seed").toFile.getAbsolutePath
    val ctx = s"seed=$seed dual=$dualMaintainer"
    try {
      val numBatches = 4 + rnd.nextInt(3) // 4-6 data batches
      // the lander's model: key -> list of (landedBatch, payload) rows
      // currently alive; tombstone(key, wm) kills entries with batch <= wm
      val model = mutable.Map.empty[Long, mutable.Buffer[(Long, String)]]
      val deleted = mutable.Buffer.empty[Long] // keys eligible for re-ingest
      var landedThrough = -1L
      var tsBatch = 0L
      val landerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()

      val lander = new Thread(() => {
        // per-thread RNG: sharing one Random across threads would make
        // the schedule depend on interleaving, breaking seed replay
        val rnd = new Random(seed * 31 + 1)
        try {
          val s = spark
          import s.implicits._
          (0 until numBatches).foreach { b =>
            // fresh keys, plus the upsert pattern: re-ingest some
            // previously deleted keys (they must survive their old
            // tombstone — the sequence rule under concurrency)
            val fresh = (0 until 10 + rnd.nextInt(20))
              .map(i => b * 1000L + i)
            val revived = rnd.shuffle(deleted).take(rnd.nextInt(3)).toSeq
            deleted --= revived
            val rows = (fresh ++ revived).map(k => (k, s"b$b-$k"))
            StreamShardRouter.landBatch(rows.toDF("doc_id", "text"), out,
              b.toLong, numShards = 4)
            rows.foreach { case (k, p) =>
              model.getOrElseUpdate(k, mutable.Buffer.empty) += ((b.toLong, p))
            }
            landedThrough = b.toLong
            // occasionally land a tombstone batch over already-landed keys
            if (rnd.nextInt(100) < 60) {
              val liveKeys = model.filter(_._2.nonEmpty).keys.toSeq.sorted
              val victims = rnd.shuffle(liveKeys).take(1 + rnd.nextInt(6)).toSeq
              if (victims.nonEmpty) {
                DeltaCompact.landTombstones(victims.toDF("doc_id"), out,
                  tsBatch, watermark = Some(landedThrough))
                tsBatch += 1
                victims.foreach { k =>
                  val buf = model(k)
                  val survivors = buf.filter(_._1 > landedThrough)
                  buf.clear(); buf ++= survivors
                  if (survivors.isEmpty) deleted += k
                }
              }
            }
            Thread.sleep(rnd.nextInt(40).toLong)
          }
        } catch { case t: Throwable => landerErr.set(t) }
      }, s"soak-lander-$seed")

      val claimLosses = new java.util.concurrent.atomic.AtomicInteger(0)
      val maintErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      def maintainerThread(id: Int, folds: Int): Thread = new Thread(() => {
        val rnd = new Random(seed * 31 + 100 + id)
        try {
          (0 until folds).foreach { _ =>
            Thread.sleep((30 + rnd.nextInt(120)).toLong)
            val landedSomething =
              DeltaCompact.listDeltaBatches(out, conf).nonEmpty ||
                DeltaCompact.readManifest(out, conf).nonEmpty
            if (landedSomething) {
              try DeltaCompact.compact(spark, out, numShards = 4,
                tombstoneKey = Some("doc_id"),
                retainSnapshots = if (dualMaintainer) 3 else rnd.nextInt(2),
                gcGraceMs =
                  if (dualMaintainer) DeltaCompact.StagingTtlMs
                  else if (rnd.nextBoolean()) DeltaCompact.StagingTtlMs else 0L)
              catch {
                case _: ConcurrentCompactionException =>
                  claimLosses.incrementAndGet(); ()
              }
            }
          }
        } catch { case t: Throwable => maintErr.set(t) }
      }, s"soak-maint-$id-$seed")

      val maintainers =
        if (dualMaintainer) Seq(maintainerThread(1, 2), maintainerThread(2, 2))
        else Seq(maintainerThread(1, 2 + rnd.nextInt(2)))

      lander.start(); maintainers.foreach(_.start())
      lander.join(180000); maintainers.foreach(_.join(180000))
      assert(landerErr.get() == null, s"$ctx lander failed: ${landerErr.get()}")
      assert(maintErr.get() == null,
        s"$ctx maintainer failed NON-cleanly: ${maintErr.get()}")

      val expect = model.iterator
        .flatMap { case (k, rows) => rows.map { case (_, p) => (k, p) } }
        .toSet

      // property 1: the LIVE view equals the lander's model, whatever
      // the folds did and wherever they fell
      val live = DeltaCompact.readCorpusLive(spark, out, keyCol = "doc_id")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(live === expect,
        s"$ctx live view diverged from the lander's model " +
          s"(missing=${(expect -- live).take(5)}, extra=${(live -- expect).take(5)})")

      // property 2: one quiescent fold later, the PHYSICAL corpus equals
      // the model too (tombstones applied, deltas folded)
      DeltaCompact.compact(spark, out, numShards = 4,
        tombstoneKey = Some("doc_id"))
      val folded = DeltaCompact.readCorpus(spark, out)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(folded === expect, s"$ctx post-fold physical corpus diverged")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("single maintainer racing a live lander: 12 seeded schedules, " +
    "live view and folded corpus always equal the lander's model") {
    (1 to 12).foreach(i => runIteration(20260816L + i, dualMaintainer = false))
  }

  test("dual maintainers racing a live lander: 8 seeded schedules, claim " +
    "losses abort cleanly, the surviving folds keep the tree exact") {
    (1 to 8).foreach(i => runIteration(20260900L + i, dualMaintainer = true))
  }
}
