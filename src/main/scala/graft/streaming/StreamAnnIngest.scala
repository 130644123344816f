package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The COMPLETE streaming ANN production path, micro-batch by
  * micro-batch: ingest → shard-route to disk → assign into the frozen
  * two-level IVF index's leaf cells. This is the end-to-end chain the
  * pieces were built for — [[StreamShardRouter]] is the landing step,
  * [[StreamAnn.assign]] the index-maintenance kernel, and the frozen
  * centroids come from the PERSISTED ivf2 leaf codebook (the serve-path
  * artifact) — wired together under one trigger.
  *
  * Scale shape per batch: one narrow shard projection + partitioned file
  * write (the only exchange), one file read of exactly the landed batch,
  * one broadcast argmax over O(batch × leaves) — history is never
  * re-touched, so per-batch cost tracks batch size at any corpus scale.
  */
object StreamAnnIngest {

  /** Deterministic 64-d synthetic embedding for a generated row — a pure
    * codegen'd column expression (no UDF): dim j =
    * ((value·P₁ + seq·P₂ + j·P₃) mod 997) / 997 − 0.5, three odd
    * multipliers decorrelating the dims. Stands in for the model-encoder
    * output a real ingest carries alongside each document. */
  def synthEmbedding(value: Column, seq: Column): Column =
    transform(sequence(lit(0), lit(63)), j =>
      // compute in double, land as float — the embedding column type the
      // whole similarity surface (FloatCosine) expects is array<float>.
      // seq is reduced mod 997 BEFORE the multiply: (seq·P) mod 997 ≡
      // ((seq mod 997)·P) mod 997, value-identical, and the product
      // stays < 2^26 — callers may pass seqs with high batch-id bits
      // (the bench ANN leg folds the batch id at bit 50) without
      // tripping ANSI-mode long-overflow
      ((pmod(value.cast("long") * 2654435761L +
        pmod(seq.cast("long"), lit(997L)) * 40503L + j.cast("long") * 69427L,
        lit(997L)).cast("double") / lit(997d)) - lit(0.5d)).cast("float"))

  /** One ingest micro-batch: land `batch` shard-partitioned under
    * `outDir/batch=<id>/shard_id=<k>/` (idempotent overwrite, the
    * [[StreamShardRouter]] layout), read the LANDED files back — the
    * assignment must index what reached disk, not what flew by — and
    * slot every landed vector into its nearest frozen leaf centroid.
    * `batch` needs (doc_id, vec_id, label, embedding); returns the
    * assigned rows (vec_id, label, assigned_cell, cosine,
    * matches_label) — the postings-append of this batch. */
  def ingestStep(batch: DataFrame, cents: DataFrame, outDir: String,
      batchId: Long, numShards: Int = 16): DataFrame = {
    val dir = StreamShardRouter.landBatch(batch, outDir, batchId, numShards)
    val landed = batch.sparkSession.read.parquet(dir)
    StreamAnn.assign(landed, cents)
  }
}
