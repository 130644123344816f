package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, Portable}

/** Streaming IVF codebook refresh — the ACT half of the drift story.
  * `q_knn_incr_assign` / [[StreamAnn.assign]] emit the `matches_label`
  * drift audit (sagging agreement = the frozen codebook no longer fits
  * the incoming distribution); this object is what a pipeline DOES when
  * that alert fires: retrain the codebook from a bounded reservoir of
  * the landed corpus, reassign the corpus as a new index generation, and
  * cut serving over atomically under [[DeltaCompact]]'s manifest
  * protocol.
  *
  * Generation layout under one index root:
  * {{{
  *   base_gen=<g>/codebook/   the generation's trained centroids
  *   base_gen=<g>/postings/   full reassignment, cell-partitioned
  *   _compaction.json          manifest: {gen, maxFoldedBatch}
  * }}}
  * `maxFoldedBatch` records the highest corpus batch id the retrain saw:
  * batches landing after a refresh keep being assigned against the
  * CURRENT generation's codebook (the frozen-index fast path) until the
  * next refresh folds them in — the same watermark semantics as the
  * posting-delta folds.
  *
  * Commit protocol (identical crash windows to [[DeltaCompact.compact]]):
  * write `base_gen=<g+1>` COMPLETELY (codebook first, then postings),
  * atomically swap the manifest, only then GC old generations. A crash
  * before the swap leaves readers on the old generation — a half-written
  * new generation is invisible because readers go through the manifest,
  * never by listing — and the next refresh absorbs the orphan.
  *
  * Scale shape: the reservoir is ONE bounded keyless
  * ObjectHashAggregate (O(k) state per partition, map-side combined) —
  * retraining cost is O(k × dims), not O(corpus); the reassignment is
  * the same broadcast argmax as ingest (one exchange row per vector);
  * the cut-over is a metadata rename. History is re-touched exactly
  * once per refresh, by design — that IS the retrain — and the cadence
  * is the operator's knob (fire on the drift audit, not per batch). */
object StreamAnnRefresh {

  /** Default reservoir size: plenty for per-label means while keeping
    * retrain cost independent of corpus size. */
  val DefaultSampleSize = 4096

  /** Deterministic bounded reservoir over the landed corpus: the `k`
    * rows with the LOWEST portable 60-bit id-hash (ties by vec_id) —
    * the same hash-ordered reservoir as the ivf2 sub-seed selection,
    * computed by the native `graft_min_k` aggregate in one pass.
    * Deterministic ⇒ a re-run retrains the identical codebook, which is
    * what makes refresh idempotent under crash-replay. */
  def reservoir(corpus: DataFrame, k: Int = DefaultSampleSize): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("prio", Portable.hash60(col("vec_id").cast("string")))
      .agg(GraftFunctions.minK(
        struct(col("prio"), col("vec_id"), col("label"), col("embedding")),
        k).as("kept"))
      .select(explode(col("kept")).as("kv"))
      .select(col("kv.vec_id").as("vec_id"), col("kv.label").as("label"),
        col("kv.embedding").as("embedding"))
  }

  /** Retrain + reassign + atomic cut-over. Reads every landed corpus
    * batch under `corpusDir` (the [[StreamShardRouter]] layout), trains
    * a fresh per-label codebook from a [[reservoir]] sample, writes the
    * full reassignment as the next generation, and commits. Returns the
    * committed manifest. Run from the ingest's own maintenance cadence
    * (the [[DeltaCompact.compact]] single-maintainer discipline). */
  def refresh(s: SparkSession, corpusDir: String, idxDir: String,
      sampleSize: Int = DefaultSampleSize): DeltaCompact.Manifest = {
    GraftFunctions.register(s)
    val conf = s.sparkContext.hadoopConfiguration
    val batches = DeltaCompact.listDeltaBatches(corpusDir, conf)
    require(batches.nonEmpty, s"no landed corpus batches under $corpusDir")
    val corpus = batches
      .map(id => s.read.parquet(s"$corpusDir/batch=$id"))
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = false))
    val cents = StreamAnn.labelCentroids(reservoir(corpus, sampleSize))
      .localCheckpoint()
    val prev = DeltaCompact.readManifest(idxDir, conf)
    val nextGen = prev.map(_.gen + 1).getOrElse(0L)
    // step 1: the new generation, COMPLETELY, before any commit
    cents.write.mode("overwrite").parquet(s"$idxDir/base_gen=$nextGen/codebook")
    StreamAnn.assign(corpus, cents)
      .write.mode("overwrite").partitionBy("assigned_cell")
      .parquet(s"$idxDir/base_gen=$nextGen/postings")
    // step 2: atomic cut-over — the manifest swap IS the serve switch
    val man = DeltaCompact.Manifest(nextGen, batches.max)
    DeltaCompact.writeManifest(idxDir, man, conf)
    // step 3: GC old + orphan generations (predicate sweep, so a crash
    // between a previous commit and its GC is also cleaned up here)
    DeltaCompact.gcFolded(idxDir, man, conf)
    man
  }

  /** The SERVING codebook — current generation per the manifest. New
    * batches assign against this until the next refresh. */
  def currentCodebook(s: SparkSession, idxDir: String): DataFrame = {
    val man = committed(s, idxDir)
    s.read.parquet(s"$idxDir/base_gen=${man.gen}/codebook")
  }

  /** The SERVING assignment postings — current generation per the
    * manifest, cell-partition-pruned on read like every persisted
    * posting layout. */
  def currentAssignments(s: SparkSession, idxDir: String): DataFrame = {
    val man = committed(s, idxDir)
    s.read.parquet(s"$idxDir/base_gen=${man.gen}/postings")
  }

  private def committed(s: SparkSession, idxDir: String): DeltaCompact.Manifest =
    DeltaCompact.readManifest(idxDir, s.sparkContext.hadoopConfiguration)
      .getOrElse(throw new IllegalStateException(
        s"no committed codebook generation under $idxDir — run refresh first"))
}
