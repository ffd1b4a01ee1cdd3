package graft

import graft.streaming.WatermarkQueries

/** Pins the watermark algebra `ev_watermark_late`'s oracle replays —
  * with hand-built rows where every fate is known by construction.
  *
  * Slice 1 seeds the late-event watermark at max(slice 1) − 3d
  * = Jan 7 10:00; slice 2 advances the eviction watermark to
  * max − 3d = Jan 17 10:00; slice 3 arrives late and is judged
  * against the Jan 7 line. The three assertions that matter:
  * a too-late row (window already finalized) is DROPPED, a late row
  * whose window is still open LANDS — including one whose own ts is
  * older than the watermark (late filtering keys on window END, the
  * Spark 4 semantics the oracle encodes) — and a window newer than
  * the final watermark is WITHHELD, never emitted. */
class WatermarkLateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("too-late row drops; open-window late rows land; tail window withheld") {
    val onTime = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-10 10:00:00"), "a")).toDF("event_id", "ts", "event_type")
    val tail = Seq(
      (6L, ts("2024-01-20 10:00:00"), "a")) // global max → final wm Jan 17 10:00
      .toDF("event_id", "ts", "event_type")
    val late = Seq(
      (3L, ts("2024-01-02 10:00:00"), "a"), // window end Jan 3 ≤ wm Jan 7 10:00 → DROP
      (4L, ts("2024-01-07 09:00:00"), "a"), // ts < wm but window end Jan 8 > wm → LAND
      (5L, ts("2024-01-07 12:00:00"), "a")) // plainly open → LAND
      .toDF("event_id", "ts", "event_type")
    val out = WatermarkQueries.runWindowed(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/wm_spec",
      Seq(onTime, tail, late), "3 days")
      .collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(2))
      .toMap
    assert(out == Map(
      "2024-01-01" -> 1L, // on-time, flushed at the first eviction
      "2024-01-07" -> 2L, // BOTH late rows: window-end semantics, not row-ts
      "2024-01-10" -> 1L), // on-time, flushed by the final watermark
      s"emitted state was $out")
    assert(!out.contains("2024-01-02"), "the finalized window's late row must drop")
    assert(!out.contains("2024-01-20"), "the window past the final watermark must stay in state")
  }

  test("declared query's emitted total is a strict, nonzero subset of the corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = WatermarkQueries.watermarkLate(spark, dir).collect()
    val total = rows.map(_.getLong(2)).sum
    val corpus = graft.operators.EventOps.events(spark, dir).count()
    assert(rows.nonEmpty && total > 0)
    // something must be withheld or dropped — a total equal to the corpus
    // would mean the watermark never gated anything
    assert(total < corpus, s"emitted $total of $corpus — nothing was gated")
  }
}
