package graft.streaming

import org.apache.spark.sql.DataFrame

/** Ingest-time LSH indexing, micro-batch by micro-batch: land the batch
  * shard-partitioned ([[StreamShardRouter]], idempotent replay), read the
  * LANDED files back, and expand each landed vector into its multi-table
  * LSH posting rows — the corpus side of `q_knn_lsh`'s index.
  *
  * This is the training-free counterpart of [[StreamAnnIngest]]: the ivf2
  * chain must wait for (or periodically retrain) a frozen leaf codebook
  * before new vectors are indexable, while the LSH planes are CONSTANTS —
  * so a vector is searchable the moment its batch lands, with zero
  * training dependencies and no index-rebuild coupling. The posting
  * expansion is the same pure per-row column expression the batch build
  * uses, which is what makes stream/batch parity exact
  * (StreamLshIngestSpec) rather than approximate.
  *
  * Scale shape per batch: one narrow shard projection + partitioned file
  * write (the only exchange), one file read of exactly the landed batch,
  * then a per-row ×tables posting fan-out with NO shuffle — history is
  * never re-touched, so per-batch cost tracks batch size at any corpus
  * scale. Folding the per-batch posting deltas into the serve layout
  * (`tb_hi`-partitioned, tb-sorted) is [[DeltaCompact]]'s generation
  * fold, same as the ivf2 path.
  */
object StreamLshIngest {

  /** One ingest micro-batch: land `batch` under
    * `outDir/batch=<id>/shard_id=<k>/` and return the landed rows'
    * LSH posting expansion — (tb, neighbor_id, embedding), the
    * postings-append of this batch. `batch` needs (doc_id, vec_id,
    * label, embedding) like the router's other callers. */
  def ingestStep(batch: DataFrame, outDir: String, batchId: Long,
      numShards: Int = 16): DataFrame = {
    val dir = StreamShardRouter.landBatch(batch, outDir, batchId, numShards)
    val landed = batch.sparkSession.read.parquet(dir)
    graft.operators.Similarity.lshPostings(landed)
  }
}
