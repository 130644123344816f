package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.streaming.{DeltaCompact, StreamCdcApply, StreamLshIngest, StreamShardRouter}

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
  *  3. CDC merge-on-read — the [[graft.streaming.StreamCdcApply]] view's
  *     LSM cost model, measured: serve cost over the folded base alone,
  *     over base + 8 FIXED-SIZE pending upsert batches (+ their
  *     tombstones), and post-fold again. The claim: the merge-on-read
  *     OVERHEAD (pending-deltas read + one broadcast anti-join) is
  *     delta-bound, not corpus-bound — the overhead second should stay
  *     ~flat across the corpus decade while the base-read second rides
  *     it; the fold resets the overhead to zero.
  *
  *  4. snapshot retention + time travel — fold the CDC tree 3 more
  *     times under `retainSnapshots = 3`, then read the OLDEST retained
  *     snapshot vs the current view. The claim: an as-of read is one
  *     direct base-generation scan — its cost is independent of how many
  *     snapshots are retained or how much history landed since
  *     (retention costs storage, never read time).
  *
  *  5. policy-fired maintenance (round 13) — the refresh ACT alone
  *     ([[graft.streaming.StreamLshIngest.refreshGeometry]]), then
  *     [[graft.streaming.AnnMaintenance.lshStep]]'s DECIDE at steady
  *     state, under sub-floor tombstone pressure (2%), and over the
  *     floor (6%, which must fire the reclaim exactly then). The
  *     claims: the DECIDE is flat across the corpus decade (safe to
  *     run every batch), the ACT rides the corpus at the index build's
  *     own cost class and is paid only at genuine pressure events.
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
    // third arg labels the big leg (e.g. "100x" for a third-decade run
    // over the c100 flat corpus); the measurements don't care
    val bigTag = args.lift(2).getOrElse("10x")
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

    for ((dir, tag) <- Seq((baseDir, "1x"), (bigDir, bigTag))) {
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

      // ---- 3. CDC merge-on-read: serve overhead is delta-bound, not
      // corpus-bound; the fold resets it
      val cdcDir = s"/tmp/graft_smoke_cdc_$tag"
      val cp = new org.apache.hadoop.fs.Path(cdcDir)
      cp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(cp, true)
      StreamShardRouter.landBatch(docs, cdcDir, 0L)
      StreamCdcApply.compactTable(spark, cdcDir) // the folded base
      val baseRead = timed(s"CDC serve, folded base only ($tag)") {
        StreamCdcApply.currentTable(spark, cdcDir).count()
      }
      // 8 FIXED-SIZE upsert batches (base-range keys, same bytes at both
      // scales): each re-writes ~1/40 of the BASE corpus's keys
      (1L to 8L).foreach { b =>
        val ups = docs
          .filter(col("doc_id") % 40 === b && col("doc_id") < baseDocs)
          .withColumn("text", concat(col("text"), lit(s" v$b")))
          .withColumn("op", lit("U"))
        StreamCdcApply.applyBatch(ups, cdcDir, b)
      }
      val morRead = timed(s"CDC serve, base + 8 pending upsert batches ($tag)") {
        StreamCdcApply.currentTable(spark, cdcDir).count()
      }
      timed(s"CDC fold (versions collapse, tombstones GC, $tag)") {
        StreamCdcApply.compactTable(spark, cdcDir)
      }
      val postFold = timed(s"CDC serve, post-fold ($tag)") {
        StreamCdcApply.currentTable(spark, cdcDir).count()
      }
      println(f"  CDC rows base/mor/folded: $baseRead/$morRead/$postFold; " +
        s"merge-on-read overhead is the (mor - base) second")

      // ---- 4. time travel: as-of read cost is one snapshot scan,
      // independent of retention depth and later history
      val genBefore = DeltaCompact.readManifest(cdcDir,
        spark.sparkContext.hadoopConfiguration).get.gen
      (9L to 11L).foreach { b =>
        val ups = docs
          .filter(col("doc_id") % 40 === b && col("doc_id") < baseDocs)
          .withColumn("text", concat(col("text"), lit(s" v$b")))
          .withColumn("op", lit("U"))
        StreamCdcApply.applyBatch(ups, cdcDir, b)
        DeltaCompact.compact(spark, cdcDir, tombstoneKey = Some("doc_id"),
          retainSnapshots = 3)
      }
      val man = DeltaCompact.readManifest(cdcDir,
        spark.sparkContext.hadoopConfiguration).get
      val current = timed(s"time travel: CURRENT view read ($tag)") {
        DeltaCompact.readCorpus(spark, cdcDir).count()
      }
      val asOf = timed(s"time travel: as-of gen=$genBefore read " +
        s"(oldest of ${man.history.size} retained, $tag)") {
        DeltaCompact.readCorpusAsOf(spark, cdcDir, genBefore).count()
      }
      println(s"  time-travel rows current/as-of: $current/$asOf; " +
        s"retained snapshots: ${man.history.map(_._1).mkString("[", ",", "]")}")

      // ---- 5. policy-fired maintenance (round 13): the DECIDE runs
      // every batch and must stay per-batch cheap (one tombstone listing
      // + one zero-column corpus count); the ACT (refreshGeometry — one
      // posting re-expansion over the live corpus) is the generation
      // fold's own cost class, paid only when pressure is real
      val mCorp = s"/tmp/graft_smoke_lshmaint_corp_$tag"
      val mIdx = s"/tmp/graft_smoke_lshmaint_idx_$tag"
      Seq(mCorp, mIdx).foreach { d =>
        val mp = new org.apache.hadoop.fs.Path(d)
        mp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(mp, true)
      }
      val shaped = emb.withColumn("doc_id", col("vec_id"))
        .select("doc_id", "vec_id", "label", "embedding")
      timed(s"maintenance ingest: land corpus + posting delta ($tag)") {
        val p = StreamLshIngest.ingestStep(shaped, mCorp, 0L)
        StreamLshIngest.landPostingsDelta(p, mIdx, 0L)
      }
      // the ACT alone, auto-sized — the reference point for "fold cost
      // class": compare against the posting-delta land above and the
      // compactPostings leg of ---- 2
      timed(s"refresh ACT: geometry rebuild over live corpus ($tag)") {
        graft.streaming.StreamLshIngest.refreshGeometry(spark, mCorp, mIdx)
      }
      // DECIDE, steady state: geometry fits, nothing pending ⇒ no fire
      val fired0 = timed(s"maintenance DECIDE, steady state ($tag)") {
        graft.streaming.AnnMaintenance.lshStep(spark, mCorp, mIdx)
      }
      // DECIDE under sub-floor tombstone pressure (2% of the corpus —
      // lands on BOTH trees, the takedown discipline) ⇒ still no fire,
      // cost is one bounded tombstone read + the corpus count
      val del1 = emb.filter(col("vec_id") % 50 === 1)
      DeltaCompact.landTombstones(del1.select(col("vec_id")), mCorp, 0L)
      StreamLshIngest.landTombstones(
        del1.select(col("vec_id").as("neighbor_id")), mIdx, 0L)
      val fired1 = timed(s"maintenance DECIDE, 2% pending (under floor, $tag)") {
        graft.streaming.AnnMaintenance.lshStep(spark, mCorp, mIdx)
      }
      // past the floor (6% total) the DECIDE fires the reclaim: the live
      // corpus is re-expanded WITHOUT the deleted vectors and the index
      // tree's applied tombstones fold away
      val del2 = emb.filter(col("vec_id") % 25 === 2)
      DeltaCompact.landTombstones(del2.select(col("vec_id")), mCorp, 1L)
      StreamLshIngest.landTombstones(
        del2.select(col("vec_id").as("neighbor_id")), mIdx, 1L)
      val fired2 = timed(s"maintenance DECIDE + reclaim ACT, 6% pending ($tag)") {
        graft.streaming.AnnMaintenance.lshStep(spark, mCorp, mIdx)
      }
      val idxTsLeft = DeltaCompact.listTombstoneBatches(mIdx).size
      println(s"  DECIDE fired steady/2%/6%: $fired0/$fired1/$fired2 " +
        s"(want false/false/true); index tombstones left: $idxTsLeft (want 0)")
    }
    spark.stop()
  }
}
