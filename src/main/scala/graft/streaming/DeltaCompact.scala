package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delta→base compaction for the streaming-landed corpus — the LSM step
  * that keeps [[StreamShardRouter]]'s per-batch landing viable long-term.
  * Every micro-batch lands as its own `batch=<id>/shard_id=<k>/` parquet
  * directory (idempotent replay), which at production cadence means
  * thousands of small files per day: the classic small-files problem
  * that degrades every downstream scan. Compaction folds the landed
  * deltas into a generation-numbered base with ONE file per shard, under
  * a manifest that makes the fold atomic and crash-safe.
  *
  * Layout under one corpus root:
  * {{{
  *   batch=<id>/shard_id=<k>/part-*.parquet   landed deltas (the router)
  *   base_gen=<g>/shard_id=<k>/part-*.parquet compacted base, generation g
  *   _tombstones/batch=<id>/part-*.parquet    landed delete keys (+watermark)
  *   _compaction.json                          manifest:
  *                                             {gen, maxFoldedBatch, history?}
  * }}}
  *
  * Commit protocol (the Delta-Lake/Iceberg snapshot discipline, file-based):
  *  1. write `base_gen=<g+1>` COMPLETELY (old base + folded deltas);
  *  2. atomically swap the manifest (temp file + rename) to point at it;
  *  3. only then GC the folded `batch=` directories and the old base.
  * A crash between any two steps leaves readers correct: the manifest
  * still names the old generation, whose base + still-present deltas are
  * the full corpus; an orphaned half-written `base_gen` directory is
  * invisible (readers go through the manifest, never by listing) and is
  * overwritten by the next compaction.
  *
  * ALL storage access goes through the Hadoop `FileSystem`/`FileContext`
  * API resolved from the corpus root's URI — so the same protocol runs
  * against local disk (tests), HDFS, or an object store, exactly like
  * the parquet reads/writes it brackets. The manifest swap uses
  * `FileContext.rename(…, Options.Rename.OVERWRITE)`, the same primitive
  * Spark's own streaming `CheckpointFileManager` relies on for its
  * atomic commit rename.
  *
  * Scale shape: the fold is one `repartition(shards, shard_id)` +
  * partitioned write — a single shuffle sized by shard count, no
  * driver-side data. Readers between compactions pay base + unfolded
  * deltas (bounded by compaction cadence); after, one pruned file per
  * shard. Serve-path equivalence pre/post fold is pinned by the
  * `q_stream_ann_compact` gate and [[graft.streaming]] specs. */
object DeltaCompact {

  /** The committed compaction state: current base generation, the
    * highest batch id folded into it, and the RETAINED older snapshots
    * (gen, maxFoldedBatch) — newest last. Retained generations survive
    * GC and serve [[readCorpusAsOf]] time travel; the default retention
    * of 0 keeps the original keep-only-current behavior. */
  final case class Manifest(gen: Long, maxFoldedBatch: Long,
      history: Seq[(Long, Long)] = Nil)

  private def manifestPath(outDir: String) = new Path(outDir, "_compaction.json")

  private[streaming] def fs(dir: String, conf: Configuration): FileSystem =
    new Path(dir).getFileSystem(conf)

  /** Read the committed manifest, if any compaction has ever run. */
  def readManifest(outDir: String,
      conf: Configuration = new Configuration()): Option[Manifest] = {
    val p = manifestPath(outDir)
    val f = fs(outDir, conf)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val s =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8)
        finally in.close()
      // the history array is cut out FIRST so the top-level gen /
      // maxFoldedBatch fields are parsed from the remainder only
      val histRe = """"history"\s*:\s*\[([^\]]*)\]""".r
      val hist = histRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      val top = histRe.replaceFirstIn(s, "")
      def field(k: String): Long = {
        val m = s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(top)
          .getOrElse(throw new IllegalStateException(
            s"corrupt compaction manifest $p: missing $k in $s"))
        m.group(1).toLong
      }
      val history = """\{"gen":(\d+),"maxFoldedBatch":(-?\d+)\}""".r
        .findAllMatchIn(hist)
        .map(m => (m.group(1).toLong, m.group(2).toLong)).toSeq
      // a history entry that fails the regex must fail LOUDLY like the
      // scalar fields — silently dropping one would forget a retained
      // snapshot and let the next gcFolded delete a still-referenced base
      val rawEntries = hist.count(_ == '{')
      if (history.size != rawEntries)
        throw new IllegalStateException(
          s"corrupt compaction manifest $p: history has $rawEntries " +
            s"entries but only ${history.size} parsed in $s")
      Some(Manifest(field("gen"), field("maxFoldedBatch"), history))
    }
  }

  /** `private[streaming]`: [[StreamBm25Ingest.compactIndex]] reuses the
    * manifest commit protocol with an AGGREGATING fold (re-cap + df sum)
    * that a plain union-repartition can't express. */
  private[streaming] def writeManifest(outDir: String, m: Manifest,
      conf: Configuration = new Configuration()): Unit = {
    val hist =
      if (m.history.isEmpty) ""
      else m.history
        .map { case (g, w) => s"""{"gen":$g,"maxFoldedBatch":$w}""" }
        .mkString(""","history":[""", ",", "]")
    val json = s"""{"gen":${m.gen},"maxFoldedBatch":${m.maxFoldedBatch}$hist}"""
    val tmp = new Path(outDir, s"_compaction.json.tmp.${System.nanoTime()}")
    val f = fs(outDir, conf)
    val out = f.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // rename-with-overwrite within one directory: the commit point.
    // FileSystem.rename can't replace an existing destination portably;
    // FileContext.rename(OVERWRITE) is the API contract for exactly this
    // (what Spark's CheckpointFileManager uses on HDFS and local alike).
    val fc = FileContext.getFileContext(manifestPath(outDir).toUri, conf)
    fc.rename(tmp, manifestPath(outDir), Options.Rename.OVERWRITE)
  }

  /** Batch ids currently landed as delta directories. */
  def listDeltaBatches(outDir: String,
      conf: Configuration = new Configuration()): Seq[Long] = {
    val root = new Path(outDir)
    val f = fs(outDir, conf)
    if (!f.exists(root) || !f.getFileStatus(root).isDirectory) Seq.empty
    else f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .flatMap(st => st.getPath.getName.stripPrefix("batch=").toLongOption)
      .sorted
  }

  /** Sequence-number column tagged onto assembled rows: the batch id a
    * row landed in (base rows carry the base's fold watermark — every
    * base row came from a batch at-or-under it). Tombstones apply only
    * to rows with sequence ≤ the tombstone's watermark — the
    * Iceberg-sequence-number / Delta-deletion-vector rule that makes
    * DELETE-then-REINGEST correct: a re-crawled key landed AFTER its
    * deletion is a new row, not a resurrected one, and must survive. */
  private val WmCol = "__graft_wm"
  private val TsWmCol = "__graft_ts_wm"

  /** ONE definition of "the corpus as of (manifest, deltaIds)": committed
    * base (if any) + exactly the given delta batches, schema-aligned by
    * name, each row tagged with its landing sequence ([[WmCol]]). Shared
    * by [[readCorpus]] and [[compact]] so the data the fold writes can
    * never diverge from the data readers see. */
  private def assemble(spark: SparkSession, outDir: String,
      man: Option[Manifest], deltaIds: Seq[Long],
      allowEvolution: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val parts =
      man.map(m => spark.read.parquet(s"$outDir/base_gen=${m.gen}")
        .withColumn(WmCol, lit(m.maxFoldedBatch))).toSeq ++
        deltaIds.map(id => spark.read.parquet(s"$outDir/batch=$id")
          .withColumn(WmCol, lit(id)))
    require(parts.nonEmpty, s"no landed data under $outDir")
    // allowEvolution = additive schema evolution (the table-format rule:
    // new columns may appear; old rows read them as null). The DEFAULT
    // stays strict — a silently missing column is usually an ingest bug,
    // and evolution must be an explicit contract, not an accident.
    parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = allowEvolution))
  }

  private[streaming] def unfoldedDeltas(outDir: String, man: Option[Manifest],
      conf: Configuration = new Configuration()): Seq[Long] =
    listDeltaBatches(outDir, conf).filter(id => man.forall(id > _.maxFoldedBatch))

  /** The full corpus as of NOW: committed base (if any) + every delta
    * batch newer than the fold watermark. Never lists `base_gen`
    * directories — the manifest IS the source of truth, which is what
    * makes a half-written new base invisible. */
  def readCorpus(spark: SparkSession, outDir: String,
      allowEvolution: Boolean = false): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val man = readManifest(outDir, conf)
    assemble(spark, outDir, man, unfoldedDeltas(outDir, man, conf),
      allowEvolution).drop(WmCol)
  }

  // ---- tombstones: the DELETE half of the corpus lifecycle ----
  //
  // Deletes (takedowns, licensing revocations, opt-outs) arrive as key
  // sets, not row rewrites — rewriting a multi-TB base per delete batch
  // would be absurd. The protocol mirrors the delta discipline exactly:
  //  * a delete batch LANDS as its own `_tombstones/batch=<id>/` parquet
  //    (idempotent overwrite, same as data deltas);
  //  * readers get EXACT logical deletion immediately — [[readCorpusLive]]
  //    anti-joins the landed tombstone keys, whose volume is bounded by
  //    compaction cadence, so the anti-join's build side stays broadcast
  //    -sized by construction;
  //  * the next [[compact]] applies them PHYSICALLY — the fold excludes
  //    tombstoned rows from the new base, then GCs the applied tombstone
  //    directories (after the manifest commit, like data-delta GC).
  // Crash-safety falls out of idempotence: a crash between commit and
  // tombstone-GC leaves tombstone files whose keys are already absent
  // from the new base — re-applying an anti-join on absent keys is a
  // no-op, so stale tombstones are harmless and swept by the next fold.

  private def tombstoneRoot(outDir: String) = s"$outDir/_tombstones"

  /** Land one tombstone delta: `keys` (the delete-key column(s) only,
    * e.g. a single `doc_id`) under `_tombstones/batch=<id>/`. Overwrite
    * -idempotent like [[StreamShardRouter.landBatch]]. Coalesced to one
    * file: a delete batch is key-sized, not corpus-sized, and per-file
    * constant costs dominate tiny writes.
    *
    * Each tombstone carries its WATERMARK — the highest data batch
    * landed at delete time — and applies only to rows that landed
    * at-or-under it: "delete this key as it exists NOW". A re-ingest of
    * the key in a LATER batch survives (the sequence rule above), which
    * is what makes delete-then-recrawl upserts correct instead of
    * permanently suppressing the key until a fold happens to clear the
    * tombstone. */
  def landTombstones(keys: DataFrame, outDir: String, batchId: Long,
      watermark: Option[Long] = None): String = {
    import org.apache.spark.sql.functions.lit
    val conf = keys.sparkSession.sparkContext.hadoopConfiguration
    // explicit watermark: callers whose deletes logically precede a known
    // batch (the CDC apply: "invalidate everything before MY batch") must
    // pin it — recomputing at a crash-replayed re-land, AFTER the batch's
    // own data landed, would raise the watermark over the batch's own rows
    // and delete them
    val wm = watermark.getOrElse(
      (listDeltaBatches(outDir, conf) ++
        readManifest(outDir, conf).map(_.maxFoldedBatch))
        .foldLeft(-1L)(math.max))
    val dir = s"${tombstoneRoot(outDir)}/batch=$batchId"
    keys.withColumn(TsWmCol, lit(wm))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Tombstone batch ids currently landed (not yet folded away). */
  def listTombstoneBatches(outDir: String,
      conf: Configuration = new Configuration()): Seq[Long] =
    listDeltaBatches(tombstoneRoot(outDir), conf)

  /** All landed tombstone keys (+ their watermarks), or None when no
    * delete has ever landed (schema is the caller's key schema, so an
    * empty frame can't be conjured here). */
  def readTombstones(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val ids = listTombstoneBatches(outDir, spark.sparkContext.hadoopConfiguration)
    if (ids.isEmpty) None
    else Some(ids.map(id => spark.read.parquet(s"${tombstoneRoot(outDir)}/batch=$id"))
      .reduce(_ unionByName _))
  }

  /** Anti-join `tagged` (a [[WmCol]]-tagged corpus) against the landed
    * tombstones under the sequence rule: a row dies iff some tombstone
    * names its key with watermark ≥ the row's landing sequence. The
    * tombstone side keeps MAX watermark per key (a later re-delete
    * re-kills), is broadcast (bounded by fold cadence), and the
    * watermark comparison rides the broadcast hash join as a residual
    * condition — still one map-side probe, zero extra exchanges. */
  private def antiTombstoned(tagged: DataFrame, ts: DataFrame,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, max}
    val t = ts.groupBy(col(keyCol).as("__graft_ts_key"))
      .agg(max(col(TsWmCol)).as(TsWmCol))
    tagged.join(broadcast(t),
      tagged(keyCol) === t("__graft_ts_key") &&
        tagged(WmCol) <= t(TsWmCol),
      "left_anti")
  }

  /** The LIVE corpus: [[readCorpus]] minus tombstoned rows — exact
    * logical deletion the moment a tombstone lands, no base rewrite,
    * re-ingests after a delete correctly visible (the sequence rule on
    * [[landTombstones]]). `keyCol` names the delete key in both trees. */
  def readCorpusLive(spark: SparkSession, outDir: String,
      keyCol: String = "doc_id", allowEvolution: Boolean = false): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val man = readManifest(outDir, conf)
    val tagged = assemble(spark, outDir, man, unfoldedDeltas(outDir, man, conf),
      allowEvolution)
    readTombstones(spark, outDir) match {
      case None => tagged.drop(WmCol)
      case Some(ts) => antiTombstoned(tagged, ts, keyCol).drop(WmCol)
    }
  }

  /** Fold every landed delta into the next base generation and commit.
    * Idempotent: compacting with no unfolded deltas rewrites the base
    * (a no-op fold) and re-commits. Returns the committed manifest.
    *
    * Concurrency contract: the delta list is captured ONCE and the fold
    * reads exactly those directories, so a NEW batch id landing while
    * the fold runs stays a delta above the new watermark — forward
    * landings need no coordination. What IS excluded is a concurrent
    * RE-delivery of an already-captured batch id (a crash-restarted
    * stream replaying while the fold reads that directory — landBatch's
    * overwrite would yank files mid-read, or the committed watermark
    * would shadow the re-landed rows). Run compaction from the ingest's
    * own maintenance cadence (e.g. every N batches inside foreachBatch,
    * or with the stream quiesced), the same single-maintainer discipline
    * a Delta-Lake-style log would enforce with optimistic locking.
    *
    * `maxRecordsPerFile`: 0 = one file per shard (the small-corpus
    * default every spec pins); > 0 caps file size so a 100 TB shard
    * folds into N right-sized parquet files instead of one monster —
    * the writer splits WITHIN the shard task, so clustering order
    * (sortCols) is preserved per file and the plan gains no exchange. */
  def compact(spark: SparkSession, outDir: String, numShards: Int = 16,
      sortCols: Seq[String] = Nil,
      tombstoneKey: Option[String] = None,
      retainSnapshots: Int = 0,
      maxRecordsPerFile: Long = 0L,
      allowEvolution: Boolean = false): Manifest = {
    val conf = spark.sparkContext.hadoopConfiguration
    val prev = readManifest(outDir, conf)
    val deltas = unfoldedDeltas(outDir, prev, conf)
    // tombstone application: capture the landed tombstone batches ONCE
    // (the delta-capture discipline — a delete landing mid-fold stays
    // pending and applies logically via readCorpusLive until the next
    // fold), exclude their keys from the new base, and GC exactly the
    // captured batches after the commit. No manifest field needed: a
    // crash between commit and tombstone-GC leaves tombstones whose
    // keys the new base already lacks — re-application is a no-op.
    val tsBatches = tombstoneKey.fold(Seq.empty[Long])(_ =>
      listTombstoneBatches(outDir, conf))
    // a fold that IGNORES pending tombstones would bump the folded rows'
    // sequence ([[WmCol]] = the new watermark) past every pending
    // tombstone's, silently resurrecting deleted keys — refuse loudly
    require(tombstoneKey.nonEmpty || listTombstoneBatches(outDir, conf).isEmpty,
      s"pending tombstones under $outDir but compact() was called without " +
        "tombstoneKey — the fold would resurrect deleted rows")
    val assembled = assemble(spark, outDir, prev, deltas, allowEvolution)
    val corpus = (tombstoneKey match {
      case Some(k) if tsBatches.nonEmpty =>
        val ts = tsBatches
          .map(id => spark.read.parquet(s"${tombstoneRoot(outDir)}/batch=$id"))
          .reduce(_ unionByName _)
        // sequence-aware application (see antiTombstoned): a key
        // re-ingested in a batch AFTER its delete folds into the new
        // base; only at-or-under-watermark rows are excluded
        antiTombstoned(assembled, ts, k)
      case _ => assembled
    }).drop(WmCol)
    val nextGen = prev.map(_.gen + 1).getOrElse(0L)
    val watermark = (deltas ++ prev.map(_.maxFoldedBatch)).max
    // step 1: the new base, one file per shard — repartition on the
    // shard key is the ONLY shuffle, sized by shard count not data.
    // sortCols: optional within-shard clustering (e.g. the LSH layout's
    // tb sort, so row-group min/max stats keep carrying the residual
    // probe filter across generation folds) — a per-partition sort, no
    // extra exchange. The sort MUST lead with the dynamic-partition
    // column: the partitioned writer requires its output ordered by
    // shard_id and would insert its OWN sort otherwise, leaving the
    // secondary clustering to survive only by sort-stability accident.
    // Prefixing shard_id satisfies the writer's requirement, so the
    // clustering within each shard file is guaranteed by contract.
    import org.apache.spark.sql.functions.col
    val folded = corpus.repartition(numShards, col("shard_id"))
    val clustered =
      if (sortCols.isEmpty) folded
      else folded.sortWithinPartitions(("shard_id" +: sortCols).map(col): _*)
    clustered
      .write.mode("overwrite").partitionBy("shard_id")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(s"$outDir/base_gen=$nextGen")
    // step 2: atomic commit. retainSnapshots > 0 keeps that many OLDER
    // generations readable ([[readCorpusAsOf]]) — the table-format
    // snapshot-retention discipline that makes "train on the corpus
    // exactly as it was at snapshot g" reproducible.
    val history = prev
      .map(p => (p.history :+ (p.gen, p.maxFoldedBatch)).takeRight(retainSnapshots))
      .getOrElse(Nil)
    val man = Manifest(nextGen, watermark, history)
    writeManifest(outDir, man, conf)
    // step 3: GC — safe only AFTER the commit, and swept by PREDICATE
    // (every delta at-or-under the watermark, every base generation
    // outside {current} ∪ retained) rather than by the captured lists,
    // so orphans left by a crash between a previous commit and its GC
    // are also collected
    gcFolded(outDir, man, conf)
    // applied tombstones fold away too: only the CAPTURED batches (a
    // delete landed mid-fold was not applied and must survive to apply
    // logically / at the next fold)
    if (tsBatches.nonEmpty) {
      val f = fs(outDir, conf)
      tsBatches.foreach(id =>
        f.delete(new Path(tombstoneRoot(outDir), s"batch=$id"), true))
    }
    man
  }

  /** Post-commit GC sweep by predicate — shared with
    * [[StreamBm25Ingest.compactIndex]]'s aggregating fold. Keeps the
    * current generation AND every retained snapshot in the manifest's
    * history. */
  private[streaming] def gcFolded(outDir: String, man: Manifest,
      conf: Configuration): Unit = {
    val f = fs(outDir, conf)
    listDeltaBatches(outDir, conf).filter(_ <= man.maxFoldedBatch).foreach(id =>
      f.delete(new Path(outDir, s"batch=$id"), true))
    val keep = (man.history.map(_._1) :+ man.gen)
      .map(g => s"base_gen=$g").toSet
    val root = new Path(outDir)
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("base_gen=") &&
        !keep(st.getPath.getName))
      .foreach(st => f.delete(st.getPath, true))
  }

  /** Time travel: the corpus EXACTLY as committed at snapshot `gen` —
    * the retained base generation, self-contained (every batch ≤ its
    * fold watermark, tombstones known at its fold already applied).
    * Deltas and tombstones landed after the snapshot's commit postdate
    * it by definition and are not applied. Requires the generation to
    * be the current one or inside the manifest's retained history. */
  def readCorpusAsOf(spark: SparkSession, outDir: String, gen: Long): DataFrame = {
    val man = readManifest(outDir, spark.sparkContext.hadoopConfiguration)
      .getOrElse(throw new IllegalStateException(
        s"no committed compaction under $outDir — nothing to time-travel to"))
    require(man.gen == gen || man.history.exists(_._1 == gen),
      s"snapshot $gen not retained under $outDir (current ${man.gen}, " +
        s"retained ${man.history.map(_._1).mkString("[", ",", "]")}) — " +
        "compact with retainSnapshots > 0 to keep history readable")
    spark.read.parquet(s"$outDir/base_gen=$gen")
  }
}
