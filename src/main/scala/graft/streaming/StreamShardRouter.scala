package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.Portable

/** The pipeline's landing step on the streaming side: route a curated
  * document stream into hash-stable training shards ON DISK, micro-batch
  * by micro-batch — the incremental version of `q_shard_assign`'s batch
  * routing.
  *
  * Layout: `outDir/batch=<id>/shard_id=<k>/part-*.parquet`.
  *  - The batch subdirectory makes replay IDEMPOTENT: foreachBatch is
  *    at-least-once, and a re-delivered batch overwrites its own
  *    directory rather than appending duplicates (the `StreamRollup`
  *    idempotence discipline applied to file output).
  *  - The shard partition makes a trainer's per-shard read a
  *    partition-pruned scan — reading shard 3 touches only
  *    `shard_id=3/` directories, never the other 15/16ths of the data.
  *  - Routing is the engine-portable doc_id hash, so a document lands in
  *    the same shard across reruns, engines, and cluster layouts.
  *
  * Scale shape: the shard column is a narrow per-row projection; the
  * write is the only exchange (partitionBy fan-out). State is zero —
  * routing is stateless — so the 100 TB version is the same code with a
  * bigger shard count. */
object StreamShardRouter {

  /** Deterministic shard id from the engine-portable doc_id hash. */
  def withShard(docs: DataFrame, numShards: Int = 16): DataFrame =
    docs.withColumn("shard_id",
      (Portable.hash60(col("doc_id").cast("string")) % numShards).cast("int"))

  /** Widen (or narrow) a landed tree's shard fan-out ON its generation
    * fold — elasticity for the hash-routed document layout: the right
    * shard width grows with the corpus, and the fold rewrites the base
    * anyway, so re-assignment rides the exchange the fold already pays
    * (one `withShard` projection, no extra shuffle). Assignment stays
    * the engine-portable doc_id hash, so a re-shard is reproducible and
    * a re-sharded tree equals one landed at the new width from day one
    * (DeltaCompactReshardSpec pins both). Switch the ingest's
    * `numShards` at the same maintenance tick; a straggler delta landed
    * at the old width is absorbed by passing the same width here on the
    * next fold (deterministic ⇒ idempotent).
    *
    * Retention: the default (`retainSnapshots = PreserveRetention`)
    * KEEPS every snapshot the committed manifest currently retains, plus
    * the pre-reshard generation itself when the tree retains at all — a
    * reshard is a layout maintenance verb, and layout maintenance must
    * never silently truncate the time-travel history a caller paid
    * `compact(retainSnapshots = n)` to keep (on a non-retaining tree the
    * default stays 0, the original GC-everything behavior). Pass an
    * explicit value to change the retention policy at the same tick.
    * `sortCols` / `maxRecordsPerFile` / `allowEvolution` forward to
    * [[DeltaCompact.compact]] so a clustered or size-capped tree keeps
    * its layout contract across the width change. */
  def reshardOnFold(spark: org.apache.spark.sql.SparkSession, outDir: String,
      newShards: Int,
      tombstoneKey: Option[String] = None,
      retainSnapshots: Int = PreserveRetention,
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      allowEvolution: Boolean = false): DeltaCompact.Manifest = {
    val keep =
      if (retainSnapshots != PreserveRetention) retainSnapshots
      else DeltaCompact
        .readManifest(outDir, spark.sparkContext.hadoopConfiguration)
        // the persisted retention POLICY (`m.retain`) is authoritative: a
        // retaining tree folded only once has an EMPTY history (prev was
        // None on its first fold) but a non-zero policy, and must not be
        // mistaken for a non-retaining tree — the exact silent
        // time-travel loss preserve-retention exists to prevent. The
        // depth rule (history.size + 1: every retained snapshot survives
        // AND the pre-reshard generation joins the history) stays as the
        // fallback floor for pre-policy manifests, and as the max so a
        // tree whose history outgrew its recorded policy never truncates.
        .map(m => math.max(m.retain,
          if (m.history.isEmpty) 0 else m.history.size + 1))
        .getOrElse(0)
    DeltaCompact.compact(spark, outDir, numShards = newShards,
      sortCols = sortCols,
      tombstoneKey = tombstoneKey,
      retainSnapshots = keep,
      maxRecordsPerFile = maxRecordsPerFile,
      allowEvolution = allowEvolution,
      reshard = Some(df => withShard(df.drop("shard_id"), newShards)))
  }

  /** Sentinel for [[reshardOnFold]]'s `retainSnapshots`: preserve the
    * committed manifest's current retention depth instead of pinning a
    * count. Shares [[DeltaCompact.PreserveRetention]]'s value — the
    * reshard resolves it HERE (it also deepens by history size, see
    * above) rather than letting [[DeltaCompact.nextManifest]]'s plain
    * policy-preserve do it. */
  val PreserveRetention: Int = DeltaCompact.PreserveRetention

  /** Start routing `docs` (a streaming DataFrame with `doc_id`) into
    * `outDir`. Returns the query; callers await termination.
    *
    * Idempotence contract: a re-delivered batch overwrites its own
    * `batch=<id>` directory, so replay is exactly-once-equivalent ONLY
    * when batch ids are stable across runs — which requires a durable
    * `checkpointLocation`. Pass one for any restartable production query;
    * with the default (`None` → Spark's temporary checkpoint) each fresh
    * run renumbers batches from 0, so callers starting a fresh query over
    * an existing `outDir` must either clear it first or sidestep reuse
    * entirely with a per-run unique `outDir` (as `q_stream_shard_route`
    * does); otherwise stale `batch=<n>` directories from a previous run
    * double-count on read-back. */
  def route(docs: DataFrame, outDir: String, numShards: Int = 16,
            checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, outDir, batchId, numShards)
        ()
      }
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** The landing contract, shared by [[route]] and
    * [[StreamAnnIngest.ingestStep]] so the layout cannot drift between
    * them: shard the batch, overwrite its own `batch=<id>` directory,
    * shard-partitioned. ATOMIC — the directory is staged complete and
    * renamed into place ([[DeltaCompact.atomicLandDir]]), so a
    * concurrent fold's delta capture or a live serve's listing never
    * sees a half-written batch. Returns the batch directory path. */
  def landBatch(batch: DataFrame, outDir: String, batchId: Long,
      numShards: Int = 16): String =
    DeltaCompact.atomicLandDir(s"$outDir/batch=$batchId",
      batch.sparkSession.sparkContext.hadoopConfiguration) { staging =>
      withShard(batch, numShards)
        // co-locate each shard before the dynamic-partition write: ONE
        // file per (batch, shard) — the fold's own layout rule — written
        // by up to `numShards` parallel tasks. Without it every input
        // partition writes its own file per shard (measured at sf0.1:
        // 512 files / 2.1 s from a 32-partition batch vs 16 files /
        // 0.5 s here, and read-back halves too — guide §6.2); a 1-
        // partition batch instead serializes all shards through one
        // writer task. This exchange is batch-sized by construction.
        .repartition(col("shard_id"))
        .write.mode("overwrite").partitionBy("shard_id").parquet(staging)
    }

  /** [[landBatch]] that SKIPS an empty batch without a separate counting
    * action: the row count rides the staged write itself as an
    * `Observation`, and the publish-rename happens only for non-empty
    * batches — an empty one leaves no `batch=<id>` directory (a
    * schema-less delta directory would break every corpus reader).
    * Replay-idempotent exactly like [[landBatch]]: batch content is
    * deterministic per id, so a re-delivery makes the same decision.
    * One Spark job either way (r17, guide §1.4/§2.3 — the
    * `StreamBm25Ingest.ingestStep` sidecar-envelope pattern applied to
    * the skip-empty decision). Returns the landed dir, or None when the
    * batch had no rows. */
  def landBatchIfNonEmpty(batch: DataFrame, outDir: String, batchId: Long,
      numShards: Int = 16): Option[String] = {
    val obs = org.apache.spark.sql.Observation()
    DeltaCompact.atomicLandDirIf(s"$outDir/batch=$batchId",
      batch.sparkSession.sparkContext.hadoopConfiguration) { staging =>
      withShard(
        batch.observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n")),
        numShards)
        .repartition(col("shard_id"))
        .write.mode("overwrite").partitionBy("shard_id").parquet(staging)
      obs.get("n").asInstanceOf[Long] > 0L
    }
  }
}
