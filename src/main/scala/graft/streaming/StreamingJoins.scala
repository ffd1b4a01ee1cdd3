package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the attribution primitive
  * (impression ⋈ click within an attribution window) that batch interval
  * joins ([[graft.operators.RangeJoin]]) express offline.
  *
  * State-bounding rules Structured Streaming enforces and this module
  * encodes: BOTH sides carry event-time watermarks, and the join
  * condition must bound each side's event time relative to the other
  * (here: click inside [impression, impression + window]), so the store
  * evicts an impression once the watermark passes its window end and a
  * click once it can no longer match any retained impression. State per
  * key is O(events inside the watermark horizon), independent of stream
  * length — the property that lets the join run for months against a
  * firehose.
  *
  * Inner join = "attributed clicks". The left-outer variant emits
  * unmatched impressions as NULL-click rows AFTER their window expires —
  * the "impression that never converted" feed — at the cost of those
  * rows arriving with watermark latency.
  */
object StreamingJoins {

  /** Attribute each click to the impressions it follows within
    * `window`. `impressions` and `clicks` are STREAMING frames with
    * (user_id, ts [, ...]); both get watermarked with `delay`. */
  def attributionJoin(impressions: DataFrame, clicks: DataFrame,
      window: String = "30 minutes", delay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val imp = impressions
      .withWatermark("ts", delay)
      .select(col("user_id"), col("ts").as("imp_ts"),
        col("event_id").as("imp_id"))
    val clk = clicks
      .withWatermark("ts", delay)
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    imp.join(clk,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $window"),
      joinType)
      .select(col("user_id"), col("imp_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }
}
