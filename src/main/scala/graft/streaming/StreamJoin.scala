package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: attribute each purchase to the clicks
  * that preceded it within the attribution window, with BOTH sides
  * watermarked so the join state is bounded.
  *
  * The interval condition (`click_ts` in `[p_ts - window, p_ts]`) plus
  * the two watermarks let Structured Streaming evict a buffered click as
  * soon as the purchase-side watermark passes `click_ts + window` — state
  * is O(arrival rate × window), independent of stream length. Without
  * the time bound the join would buffer both streams forever; this is
  * the stream-stream analogue of the batch as-of join
  * ([[graft.plans.AsOfJoin]]).
  */
object StreamJoin {

  /** `clicks` needs (user_id, click_ts); `purchases` needs
    * (p_user, p_ts). Inner join; one output row per qualifying
    * click-purchase pair. */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      window: String = "10 seconds"): DataFrame =
    clicks.withWatermark("click_ts", window)
      .join(
        purchases.withWatermark("p_ts", window),
        expr(s"user_id = p_user AND " +
          s"click_ts BETWEEN p_ts - INTERVAL $window AND p_ts"))

  /** Stream-static enrichment join — the OTHER streaming join shape: a
    * live stream decorated with a dimension table (J1/J2 semantics on a
    * stream). Stateless: no watermark and no join state, because the
    * static side is fully available every micro-batch; Structured
    * Streaming re-plans the static side per batch, so a dim table
    * republished between batches (new parquet files) is picked up without
    * restarting the query. The dim is broadcast — at 100 TB stream volume
    * the dimension is still catalog-sized, and shipping it to executors
    * beats shuffling the stream. Left-outer keeps stream rows with no dim
    * match (null holes, the reference's value-lookup semantics). */
  def enrichStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")
}
