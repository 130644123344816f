package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the streaming twin of the batch
  * `q_dedup_exact`/`q_fingerprint` path: each document is keyed by its
  * whitespace-normalized content hash and deduplicated against every
  * document seen within the watermark horizon.
  *
  * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) is the
  * 100 TB-safe choice: state holds one 128-bit key per distinct document
  * inside the horizon and is evicted as event time advances — bounded by
  * arrival rate × horizon, not by corpus size. Rows are emitted on first
  * arrival (append mode, no latency penalty); only later duplicates are
  * suppressed.
  */
object StreamDedup {

  /** Expects columns `text` (string) and `ts` (event-time timestamp);
    * passes every other column through. */
  def apply(docs: DataFrame, horizon: String = "10 seconds"): DataFrame =
    docs
      .withColumn("content_hash",
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
