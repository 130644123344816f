package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** tb_hi domain size (tables × 2^(bits − dirShift)) — the serve
    * layout's directory count, derived from the SAME geometry constants
    * the serve kernels use so the streaming delta layout can never
    * silently diverge from the serve layout. */
  private val NumDirKeys = graft.operators.Similarity.lshDirKeyDomain

  /** Land one batch's POSTING rows as a delta generation in the SERVE
    * layout key: `shard_id = tb_hi` (the `qKnnLshPersist` directory key),
    * each delta its own overwrite-idempotent `batch=<id>` directory, rows
    * tb-sorted within each shard file so row-group stats carry the
    * residual probe filter even BEFORE any fold. This is the
    * postings-side twin of [[StreamShardRouter.landBatch]]'s corpus
    * landing — same layout contract, different partition key. */
  def landPostingsDelta(postings: DataFrame, idxDir: String, batchId: Long): String = {
    val dir = s"$idxDir/batch=$batchId"
    postings
      .withColumn("shard_id", graft.operators.Similarity.lshDirKey(col("tb")))
      .repartition(col("shard_id"))
      // shard_id leads the sort: the dynamic-partition writer requires
      // its output ordered by the partition column and would insert its
      // own sort otherwise, voiding the tb clustering contract
      .sortWithinPartitions("shard_id", "tb")
      .write.mode("overwrite").partitionBy("shard_id").parquet(dir)
    dir
  }

  /** Fold every landed posting delta into the next base generation —
    * [[DeltaCompact]]'s manifest-committed fold with the LSH layout's
    * within-shard tb clustering preserved across generations. Because the
    * posting expansion is a pure per-row function and the fold is a pure
    * union-repartition, N landed deltas fold into EXACTLY the rows a
    * single batch build would produce (StreamLshCompactSpec pins this
    * against `q_knn_lsh`'s oracle-gated serve output). */
  def compactPostings(s: SparkSession, idxDir: String): DeltaCompact.Manifest =
    DeltaCompact.compact(s, idxDir, numShards = NumDirKeys, sortCols = Seq("tb"),
      // deletes apply physically at the fold: a tombstoned vector's
      // posting rows (×tables of them) are excluded from the new base —
      // exact for LSH because postings are pure per-vector expansions
      // (nothing aggregated), so removal can never under-promote the way
      // a capped aggregate would (contrast: the BM25 partial is NOT
      // closed under deletion — see `q_bm25_delete`'s rebuild rationale)
      tombstoneKey = Some("neighbor_id"))

  /** The posting corpus as of now (committed base + unfolded deltas) in
    * the serve schema — (tb, neighbor_id, embedding) plus the `tb_hi`
    * directory key for pruning. */
  def readPostings(s: SparkSession, idxDir: String): DataFrame =
    DeltaCompact.readCorpus(s, idxDir)
      .select(col("shard_id").cast("long").as("tb_hi"), col("tb"),
        col("neighbor_id"), col("embedding"))

  /** Land a delete batch against the posting index: `ids` is a frame of
    * `neighbor_id` keys. Serving picks it up immediately via
    * [[readPostingsLive]]; the next [[compactPostings]] applies it
    * physically and folds the tombstone away.
    *
    * `watermark` pins the tombstone's sequence ceiling, exactly as on
    * [[DeltaCompact.landTombstones]]: an at-least-once replay that
    * re-lands this delete batch AFTER later data batches have landed
    * must pass the ORIGINAL watermark, or the recomputed default (max
    * landed batch at re-land time) would kill rows legitimately
    * re-ingested after the delete — violating the sequence rule. */
  def landTombstones(ids: DataFrame, idxDir: String, batchId: Long,
      watermark: Option[Long] = None): String =
    DeltaCompact.landTombstones(ids.select(col("neighbor_id")), idxDir, batchId,
      watermark)

  /** [[readPostings]] minus tombstoned vectors — exact logical deletion
    * (every posting row of a deleted vector drops, across all tables)
    * with zero index rewrite; the anti-join's tombstone side is bounded
    * by compaction cadence and broadcasts. */
  def readPostingsLive(s: SparkSession, idxDir: String): DataFrame =
    DeltaCompact.readCorpusLive(s, idxDir, keyCol = "neighbor_id")
      .select(col("shard_id").cast("long").as("tb_hi"), col("tb"),
        col("neighbor_id"), col("embedding"))
}
