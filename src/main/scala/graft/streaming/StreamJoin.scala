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
}
