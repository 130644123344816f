package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC apply over the delta/tombstone tree — a materialized upsert view
  * maintained micro-batch by micro-batch, the streaming sibling of
  * [[graft.operators.Features]]' batch `MERGE` (`q_merge_upsert`): the
  * batch merge rewrites the snapshot per change batch (copy-on-write);
  * this one NEVER rewrites — an upsert is "tombstone the prior versions,
  * land the new row", a delete is the tombstone alone, and the
  * generation fold is the copy-on-write cost paid ONCE per maintenance
  * cadence instead of once per batch (merge-on-read, the Hudi/Iceberg
  * v2 discipline). The sequence-numbered tombstones do the version
  * arithmetic: a batch-b tombstone pins watermark b−1, so it kills
  * exactly the versions that landed before b — including re-upserts of
  * a key deleted earlier, and NEVER batch b's own row, even under
  * crash-replay re-lands.
  *
  * Scale shape per batch: intra-batch resolution is one batch-sized
  * window; the tombstone write is key-sized; the data landing is the
  * shard-partitioned batch write. Readers pay base + unfolded deltas +
  * one broadcast anti-join (bounded by fold cadence); the fold is one
  * shard-keyed shuffle. Nothing ever rewrites per batch. */
object StreamCdcApply {

  /** Apply one CDC micro-batch. `batch` must be PRE-RESOLVED to one row
    * per key — last op wins within the batch (the caller's one window) —
    * with columns (doc_id, op ∈ 'U'/'D', payload…). Idempotent under
    * replay: both writes overwrite their own `batch=<id>` directories
    * and the tombstone watermark is pinned to `batchId − 1`. */
  def applyBatch(batch: DataFrame, outDir: String, batchId: Long,
      numShards: Int = 16): Unit = {
    // The two landings touch DISTINCT trees (`_tombstones/batch=<id>` vs
    // `batch=<id>`) with no ordering contract between them — a reader
    // mid-batch is undefined either way, and replay overwrites both
    // idempotently — so they overlap from driver threads (guide §2.6;
    // r17: was tombstones → observed-count decision → upserts, a serial
    // 2-job chain). The skip-empty decision (a delete-only batch must
    // not write a schema-less delta directory) now rides the upsert
    // leg's OWN staged write as an Observation
    // ([[StreamShardRouter.landBatchIfNonEmpty]]), which removes the
    // r16 cross-leg dependency: that Observation rode landTombstones'
    // write and was exact only while landTombstones ran exactly one
    // full-scan action (ADVICE r16) — now each leg's metric is computed
    // by the action that leg itself controls.
    //  leg 1: invalidate prior versions of EVERY touched key (upsert or
    //         delete — both supersede history before this batch)
    //  leg 2: land the upserts as this batch's data delta (skipped
    //         empty inside its own write)
    graft.operators.Par.units(
      () => {
        DeltaCompact.landTombstones(batch.select(col("doc_id")),
          outDir, batchId, watermark = Some(batchId - 1))
        ()
      },
      () => {
        StreamShardRouter.landBatchIfNonEmpty(
          batch.filter(col("op") === "U").drop("op"), outDir, batchId, numShards)
        ()
      })
  }

  /** The materialized view as of now: live rows only (prior versions and
    * deleted keys anti-joined away), exactly one row per live key.
    * `allowEvolution` mirrors [[DeltaCompact.readCorpus]] — an evolved
    * tree (additive columns, explicit opt-in) stays readable on the
    * tombstone-aware path too. */
  def currentTable(s: SparkSession, outDir: String,
      allowEvolution: Boolean = false): DataFrame =
    DeltaCompact.readCorpusLive(s, outDir, keyCol = "doc_id",
      allowEvolution = allowEvolution).drop("shard_id")

  /** Maintenance fold: versions collapse physically, tombstones GC. */
  def compactTable(s: SparkSession, outDir: String): DeltaCompact.Manifest =
    DeltaCompact.compact(s, outDir, tombstoneKey = Some("doc_id"))
}
