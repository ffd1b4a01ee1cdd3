package graft.operators

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — points ⋈ intervals on
  * `point BETWEEN start AND end` plus an equi-key.
  *
  * Spark plans a raw range predicate as BroadcastNestedLoopJoin (or a
  * per-key cross product) — quadratic at scale. The bucketized
  * formulation turns it into an equi-join: intervals are exploded to
  * every fixed-width time bucket they span, points carry their single
  * bucket, the join key becomes (key, bucket), and the precise BETWEEN
  * filters after the match. Each (point, interval) pair meets exactly
  * once (in the point's bucket), so no dedup is needed. Cost:
  * O(intervals × spanned-buckets + matched pairs) with one shuffle —
  * bucket width trades replication against selectivity.
  */
object RangeJoin {

  /** points(keyCol, ptCol, ...) ⋈ intervals(keyCol, startCol, endCol, ...)
    * with `bucketWidth` in the same units as the (numeric) columns. */
  def joinRange(points: DataFrame, intervals: DataFrame, keyCol: String,
      ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", floor(col(ptCol) / bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    p.join(i, Seq(keyCol, "__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Oracle-checked query: events within ±5 minutes of an error event of
    * the same user (pairs counted; overlapping windows count per window,
    * exactly like the oracle's range join). Timestamps as epoch micros —
    * exact integers in both engines. */
  val evRange = QueryDef(
    "ev_range_join",
    Some("""
      WITH pts AS (
        SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
      wins AS (
        SELECT event_id AS err_id, user_id,
          epoch_us(ts) - 300000000 AS w_start,
          epoch_us(ts) + 300000000 AS w_end
        FROM events WHERE event_type = 'error')
      SELECT p.user_id, COUNT(*) AS n_pairs,
        COUNT(DISTINCT p.event_id) AS n_events_near_errors
      FROM pts p
      JOIN wins w ON p.user_id = w.user_id
        AND p.t >= w.w_start AND p.t <= w.w_end
      GROUP BY p.user_id
      ORDER BY p.user_id"""),
    (s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      val pts = ev.select($"event_id", $"user_id", unix_micros($"ts").as("t"))
      val wins = ev.filter($"event_type" === "error")
        .select(
          $"event_id".as("err_id"), $"user_id",
          (unix_micros($"ts") - 300000000L).as("w_start"),
          (unix_micros($"ts") + 300000000L).as("w_end"))
      joinRange(pts, wins, "user_id", "t", "w_start", "w_end",
        bucketWidth = 600000000L)
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_pairs"),
          countDistinct($"event_id").as("n_events_near_errors"))
        .orderBy($"user_id")
    })
}
