package graft

import graft.streaming.WatermarkQueries
import java.sql.Timestamp

/** Pins the INTER-OPERATOR watermark facts `ev_stream_chained`'s oracle
  * bakes in, on hand-built frames where each decision is a single row:
  * the upstream dedup's ROW-level late filter gates the window's input
  * (a late row with an open window but a stale ts is dropped — the
  * window-only pipeline accepts it), and a planted re-arrival is
  * swallowed by dedup state before it can inflate a window count. Both
  * divergences are shown against [[WatermarkQueries.runWindowed]] on
  * the IDENTICAL slices. */
class ChainedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def ts(s: String) = Timestamp.valueOf(s)

  // delay 1 day throughout. Batch roles:
  //  b0: id1 @ Jan 1, id2 @ Jan 4 12:00      -> wm after b0 = Jan 3 12:00
  //  b1: id1 RE-ARRIVAL, id3 @ Jan 20        -> final wm = Jan 19
  //  b2: id4 @ Jan 3 06:00 — late first arrival: its OWN ts is behind
  //      b2's late watermark (Jan 3 12:00, the one-batch-lagged wm from
  //      b0's data) but its 1-day window [Jan 3, Jan 4) is still open
  //      (window_end Jan 4 > Jan 3 12:00) — the discriminating row
  private def slices = Seq(
    Seq((1L, ts("2024-01-01 00:00:00"), "t"),
        (2L, ts("2024-01-04 12:00:00"), "t")),
    Seq((1L, ts("2024-01-01 00:00:00"), "t"),
        (3L, ts("2024-01-20 00:00:00"), "t")),
    Seq((4L, ts("2024-01-03 06:00:00"), "t")))
    .map(_.toDF("event_id", "ts", "event_type"))

  test("chained dedup->window: row-level late filter and re-arrival suppression") {
    val out = WatermarkQueries.runChained(spark, tmp("chain"), slices, "1 day")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // id4 dropped by dedup's ROW filter; id1 re-arrival suppressed;
    // id3's window (end Jan 21 > final wm Jan 19) withheld in state
    assert(out == Set(
      (ts("2024-01-01 00:00:00"), "t", 1L),
      (ts("2024-01-04 00:00:00"), "t", 1L)),
      s"chained semantics drifted: $out")
  }

  test("window-only pipeline on identical slices accepts what the chain drops") {
    val out = WatermarkQueries.runWindowed(spark, tmp("chainw"), slices, "1 day")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // no dedup upstream: the re-arrival double-counts Jan 1, and id4
    // lands because the WINDOW-level filter (window_end > wm) passes
    // where the chained row-level filter (ts >= wm) does not
    assert(out == Set(
      (ts("2024-01-01 00:00:00"), "t", 2L),
      (ts("2024-01-03 00:00:00"), "t", 1L),
      (ts("2024-01-04 00:00:00"), "t", 1L)),
      s"window-only contrast drifted: $out")
  }
}
