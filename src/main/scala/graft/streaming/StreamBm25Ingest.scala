package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Ingest-time lexical indexing, micro-batch by micro-batch: land the
  * document batch shard-partitioned ([[StreamShardRouter]], idempotent
  * replay), read the LANDED files back, and fold the batch into the
  * impact-capped BM25 index — the corpus side of `q_bm25_topk`.
  *
  * The load-bearing property is that the capped index is a MERGEABLE
  * SKETCH: per term, the partial is (min-k of postings by impact,
  * partial df). min-k is associative — the min-k of a union equals the
  * min-k of the concatenated per-batch min-ks — and df is additive, so
  * per-batch partials fold into EXACTLY the index a single batch build
  * would produce, bit for bit (StreamBm25IngestSpec pins this and the
  * end-to-end serve parity against `q_bm25_topk`'s oracle-gated output).
  * The same property is what makes the BATCH build's map-side partials
  * correct under any partitioning — the stream fold is just that merge
  * tree with batch boundaries as the partition boundaries.
  *
  * Scale shape per batch: tf is per-document (documents arrive whole, so
  * the (doc, tok) aggregate never crosses batches), the partial index is
  * one tok-key ObjectHashAggregate over the batch with O(64) state per
  * term, and the landed partial is vocab-sized, NOT batch-sized. History
  * is never re-touched at ingest; the serve-time fold touches only
  * vocab × generations rows. Periodically folding generations down is
  * [[DeltaCompact]]'s generation fold, same as the ANN paths.
  */
object StreamBm25Ingest {

  /** One ingest micro-batch: land `batch` (documents with `doc_id`,
    * `text`) under `outDir/docs/batch=<id>/shard_id=<k>/`, then write
    * the batch's capped partial index (tok, kept min-k postings, partial
    * df) under `outDir/idx/batch=<id>/` — both overwrite-idempotent on
    * replay. Returns the landed partial index. */
  def ingestStep(batch: DataFrame, outDir: String, batchId: Long,
      numShards: Int = 16): DataFrame = {
    val s = batch.sparkSession
    graft.functions.GraftFunctions.register(s)
    val dir = StreamShardRouter.landBatch(batch, s"$outDir/docs", batchId, numShards)
    val landed = s.read.parquet(dir)
    val idxDir = s"$outDir/idx/batch=$batchId"
    TextAnalysis.bm25Partial(TextAnalysis.bm25Postings(landed))
      .write.mode("overwrite").parquet(idxDir)
    s.read.parquet(idxDir)
  }

  /** Fold every landed per-batch partial into the serving index: re-cap
    * the concatenated min-k lists per term (associativity) and sum the
    * partial dfs. Output rows are `(tok, doc_id, tf, dfc)` — identical
    * to the batch-built `bm25Index`.
    *
    * Exactness PRECONDITION, now enforced rather than assumed: each
    * doc_id must appear in exactly ONE batch. A document re-ingested
    * under a second batch id would double-count df (partial dfs are
    * summed) and could seat the same doc_id twice in a term's re-capped
    * min-k list, displacing a legitimate posting — and the damage is NOT
    * repairable at merge time from capped partials alone (a doc's
    * postings beyond the cap are gone, so "dedupe and recount df from
    * distinct doc_ids" can't reconstruct the true df). So the fold
    * ASSERTS disjointness against the landed corpus: one column-pruned
    * aggregate over (doc_id, batch=partition-column) — metadata-cheap,
    * paid once per serve-time fold, never per batch. A crash-replay of
    * the SAME batch id is fine (landBatch overwrites its own directory,
    * so the doc still lives under one batch). */
  def mergeIndexes(s: SparkSession, outDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val crossBatch = s.read.parquet(s"$outDir/docs")
      .groupBy("doc_id")
      .agg(countDistinct(col("batch")).as("nb"))
      .filter(col("nb") > 1)
    val offenders = crossBatch.limit(5).collect()
    if (offenders.nonEmpty)
      throw new IllegalStateException(
        "BM25 fold precondition violated: doc_ids ingested under more than " +
          "one batch id (df would double-count): " +
          offenders.map(_.getLong(0)).mkString(", "))
    TextAnalysis.bm25Index(recapMergePartial(indexPartials(s, outDir)))
  }

  /** Every CURRENT partial — the committed base generation (if any index
    * compaction has run) plus each batch delta above the fold watermark.
    * Readers go through the manifest, never by listing, so a
    * half-written base is invisible (the [[DeltaCompact]] discipline). */
  private def indexPartials(s: SparkSession, outDir: String): DataFrame = {
    val idxDir = s"$outDir/idx"
    val man = DeltaCompact.readManifest(idxDir)
    val parts =
      man.map(m => s.read.parquet(s"$idxDir/base_gen=${m.gen}")).toSeq ++
        DeltaCompact.unfoldedDeltas(idxDir, man)
          .map(id => s.read.parquet(s"$idxDir/batch=$id"))
    require(parts.nonEmpty, s"no landed index partials under $idxDir")
    parts.map(_.select("tok", "kept", "dfc"))
      .reduce(_ unionByName _)
  }

  /** The associative fold on PARTIAL schema: per term, re-cap the
    * concatenated min-k lists and sum the partial dfs — output is again
    * a partial (tok, kept, dfc), so folded generations keep folding with
    * future batches exactly (min-k of a union = min-k of concatenated
    * min-ks; df is additive given the batch-disjointness precondition). */
  private def recapMergePartial(partials: DataFrame): DataFrame = {
    val dfs = partials.groupBy("tok").agg(sum(col("dfc")).as("dfc"))
    partials
      .select(col("tok"), explode(col("kept")).as("kv"))
      .groupBy("tok")
      .agg(graft.functions.GraftFunctions.minK(
        struct(col("kv.negtf").as("negtf"), col("kv.doc_id").as("doc_id"),
          col("kv.tf").as("tf")), TextAnalysis.Bm25Cap).as("kept"))
      .join(dfs, "tok")
      .select(col("tok"), col("kept"), col("dfc"))
  }

  /** Fold every landed per-batch partial into ONE base-generation
    * partial under [[DeltaCompact]]'s manifest commit protocol — the
    * AGGREGATING twin of the LSH postings fold: the fold step is the
    * re-cap merge (vocab-sized output) instead of a union-repartition,
    * everything else (write base completely → atomic manifest swap →
    * GC folded deltas + old bases) is the same crash-safe discipline.
    * The base keeps the PARTIAL schema and the batch-built index's
    * layout (tok-range-partitioned, tok-sorted), so serve-time
    * [[mergeIndexes]] and future batch folds read it like any other
    * partial. Bounded idx growth: between compactions readers pay
    * base + unfolded deltas; after, one vocab-sized generation. */
  def compactIndex(s: SparkSession, outDir: String): DeltaCompact.Manifest = {
    graft.functions.GraftFunctions.register(s)
    val idxDir = s"$outDir/idx"
    val prev = DeltaCompact.readManifest(idxDir)
    val deltas = DeltaCompact.unfoldedDeltas(idxDir, prev)
    val folded = recapMergePartial(indexPartials(s, outDir))
    val nextGen = prev.map(_.gen + 1).getOrElse(0L)
    val watermark = (deltas ++ prev.map(_.maxFoldedBatch)).max
    folded
      .repartitionByRange(col("tok"))
      .sortWithinPartitions("tok")
      .write.mode("overwrite").parquet(s"$idxDir/base_gen=$nextGen")
    val man = DeltaCompact.Manifest(nextGen, watermark)
    DeltaCompact.writeManifest(idxDir, man)
    DeltaCompact.listDeltaBatches(idxDir).filter(_ <= watermark).foreach(id =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$idxDir/batch=$id")))
    new java.io.File(idxDir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("base_gen=") &&
        f.getName != s"base_gen=$nextGen")
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    man
  }
}
