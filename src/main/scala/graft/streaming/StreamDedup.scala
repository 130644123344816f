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

  /** Signature-level streaming NEAR-dedup: the key is the 32-bit SimHash
    * over the document's distinct word set (same signature as the batch
    * `q_simhash`), so any rewording that preserves the majority bit vote —
    * word reorder, duplication, punctuation-only edits — collapses to one
    * survivor within the horizon. This is the Hamming-distance-0 prefilter;
    * the banded Hamming≤3 match stays a batch op (`Dedup.qSimhashPairs`) —
    * per-band voting would need a second stateful stage and give
    * per-band, not per-doc, drop decisions. State = one 32-bit key per
    * distinct signature inside the horizon: rate × horizon bounded. */
  def nearBySimhash(docs: DataFrame, horizon: String = "10 seconds"): DataFrame = {
    import graft.functions.Portable
    docs
      .withColumn("simhash", Portable.simhash32(
        transform(array_distinct(Portable.words(col("text"))), t => Portable.hash60(t))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("simhash")
  }
}
