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
    // 1. invalidate prior versions of EVERY touched key (upsert or
    //    delete — both supersede history before this batch). The upsert
    //    count rides this write as an observed metric (CollectMetrics
    //    over the same batch scan) instead of a separate isEmpty action —
    //    r16: one fewer Spark job per CDC micro-batch, same decision.
    val obs = org.apache.spark.sql.Observation()
    DeltaCompact.landTombstones(
      batch.observe(obs, count(when(col("op") === "U", 1)).as("n_ups"))
        .select(col("doc_id")),
      outDir, batchId, watermark = Some(batchId - 1))
    // 2. land the upserts as this batch's data delta (skip an empty
    //    landing — a delete-only batch would otherwise write a
    //    schema-less delta directory)
    if (obs.get("n_ups").asInstanceOf[Long] > 0L) {
      StreamShardRouter.landBatch(
        batch.filter(col("op") === "U").drop("op"), outDir, batchId, numShards)
      ()
    }
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
