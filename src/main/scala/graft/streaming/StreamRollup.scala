package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

import graft.operators.Analytic

/** Streaming materialized-rollup maintenance — the streaming twin of
  * `q_incr_rollup`: each micro-batch's partial aggregate is MERGED into a
  * persistent daily summary via [[Analytic.mergeRollup]], so the summary
  * after every batch is the exact rollup of everything that has arrived.
  * DECIMAL sums make the merge associative, so batch boundaries are
  * invisible in the result — replaying the same events in different batch
  * splits yields a bit-identical summary.
  *
  * The store is a versioned parquet directory (`v=0`, `v=1`, …): each
  * commit writes a NEW full snapshot and readers always see the latest
  * complete version — the local-mode stand-in for a transactional
  * `MERGE INTO` target, with the same read-merge-commit semantics and no
  * read-modify-write on a live file. Superseded versions are pruned,
  * keeping the latest two (the previous version must survive until the
  * new one is fully committed — a reader mid-scan of v=N must not have
  * its files deleted by the v=N+1 commit).
  *
  * Scale shape: per batch the work is one map-side-combined partial
  * aggregate of the BATCH plus a full-outer join against the summary on
  * the (event_type, day) grouping key — cost scales with batch size +
  * summary cardinality (distinct keys), never with history row count. At
  * a real deployment the versioned directory becomes a transactional
  * table (the commit is then a metadata swap, not a rewrite) and the
  * summary join is partitioned on the grouping key.
  */
object StreamRollup {

  /** Post-merge summary schema ([[Analytic.mergeRollup]] output). */
  val SummarySchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("day", DateType),
    StructField("cnt", LongType),
    StructField("sum_value", DecimalType(38, 6))))

  /** Versioned summary directory: `current` is the highest complete
    * version (empty summary before the first commit). Single-writer by
    * contract — the foreachBatch sink, which Structured Streaming already
    * serializes per query.
    *
    * Each version dir records the stream batch that produced it
    * (`v=<version>-b=<batchId>`): foreachBatch is AT-LEAST-ONCE (after a
    * crash the engine replays the last unacknowledged batch), so the
    * commit must be idempotent on batchId — a replayed batch would
    * otherwise be merged twice and silently double-count. */
  final class SummaryStore(spark: SparkSession, dir: String) {
    // all store maintenance goes through the Hadoop FileSystem resolved
    // from the store URI — same protocol on local disk (tests), HDFS, or
    // an object store, exactly like DeltaCompact's manifest maintenance
    private val root = new org.apache.hadoop.fs.Path(dir)
    private val fs = DeltaCompact.fs(dir,
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)

    // (version, batchId) pairs, version-ascending
    private def versions: Seq[(Long, Long)] =
      fs.listStatus(root).toSeq
        .map(_.getPath.getName)
        .collect { case VersionDir(v, b) => (v.toLong, b.toLong) }
        .sortBy(_._1)

    def currentVersion: Option[Long] = versions.lastOption.map(_._1)

    /** Stream batch id of the latest commit (idempotence watermark). */
    def lastBatchId: Option[Long] = versions.lastOption.map(_._2)

    /** Latest committed summary, or an empty frame with the summary
      * schema before the first commit. */
    def current: DataFrame = versions.lastOption match {
      case Some((v, b)) => spark.read.parquet(s"$dir/v=$v-b=$b")
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], SummarySchema)
    }

    /** Commit a new full snapshot as the next version, then prune all but
      * the latest two versions. A batchId at or below the idempotence
      * watermark is a replay of already-merged data: skipped (returns
      * None). */
    def commit(summary: DataFrame, batchId: Long): Option[Long] =
      if (lastBatchId.exists(_ >= batchId)) None
      else {
        val next = currentVersion.fold(0L)(_ + 1)
        summary
          .select("event_type", "day", "cnt", "sum_value")
          .write.mode("errorifexists").parquet(s"$dir/v=$next-b=$batchId")
        versions.dropRight(2).foreach { case (v, b) =>
          fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v-b=$b"), true)
        }
        Some(next)
      }
  }

  private val VersionDir = "v=(\\d+)-b=(\\d+)".r

  /** One maintenance step: merge `batch`'s partial aggregate into the
    * store (no-op if `batchId` was already committed — replay safety). */
  def applyBatch(store: SummaryStore, batch: DataFrame, batchId: Long): Unit = {
    store.commit(
      Analytic.mergeRollup(store.current, Analytic.dailyRollup(batch)), batchId)
    ()
  }

  /** Attach rollup maintenance to a streaming events frame (needs
    * `event_type`, `ts`, `value`). Each micro-batch: partial-aggregate the
    * batch, merge into the store's current summary, commit keyed by the
    * engine's batchId. Call `.start()` (plus trigger/checkpoint options)
    * on the result. */
  def maintain(events: DataFrame, store: SummaryStore): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(store, batch, batchId)
      }
}
