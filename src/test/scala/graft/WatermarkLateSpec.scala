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

  test("update-mode gold: open tail window present, too-late row excluded, keys unique (upsert converged)") {
    val onTime = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-10 10:00:00"), "a")).toDF("event_id", "ts", "event_type")
    val tail = Seq(
      (6L, ts("2024-01-20 10:00:00"), "a")).toDF("event_id", "ts", "event_type")
    val late = Seq(
      (3L, ts("2024-01-02 10:00:00"), "a"), // window end Jan 3 ≤ wml Jan 7 → DROP
      (4L, ts("2024-01-07 09:00:00"), "a"), // open window → LAND
      (5L, ts("2024-01-07 12:00:00"), "a")) // open window → LAND
      .toDF("event_id", "ts", "event_type")
    val rows = WatermarkQueries.runUpdateGold(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/ug_spec",
      Seq(onTime, tail, late), "3 days")
      .collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(2))
    assert(rows.length == rows.map(_._1).distinct.length,
      s"duplicate gold keys — the upsert inserted instead of updating: ${rows.toSeq}")
    assert(rows.toMap == Map(
      "2024-01-01" -> 1L,
      "2024-01-07" -> 2L,  // both accepted late rows folded in
      "2024-01-10" -> 1L,
      "2024-01-20" -> 1L), // the OPEN tail window append mode withholds
      s"gold table was ${rows.toSeq}")
  }

  test("stream dedup: live-state dupes suppress; evicted-key re-arrivals and late firsts drop; open firsts land") {
    val f1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-10 10:00:00"), "a")).toDF("event_id", "ts", "event_type")
    val f2 = Seq(
      (6L, ts("2024-01-20 10:00:00"), "a"), // new max → eviction wm Jan 17
      (1L, ts("2024-01-01 10:00:00"), "X")) // dupe, state live → SUPPRESS
      .toDF("event_id", "ts", "event_type")
    val f3 = Seq(
      (2L, ts("2024-01-10 10:00:00"), "X"), // dupe of live-state key → SUPPRESS
      (1L, ts("2024-01-01 10:00:00"), "X"), // dupe of EVICTED key, below late wm → no re-emit
      (7L, ts("2024-01-05 10:00:00"), "a"), // first arrival below late wm Jan 7 → DROP
      (8L, ts("2024-01-08 10:00:00"), "a")) // first arrival above late wm → LAND
      .toDF("event_id", "ts", "event_type")
    val out = WatermarkQueries.runDedup(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/sd_spec",
      Seq(f1, f2, f3), "3 days", "event_id")
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .toMap
    // every surviving row carries its FIRST arrival's payload ("a"):
    // a leaked re-arrival would surface as "X" or a duplicate key
    assert(out == Map(1L -> "a", 2L -> "a", 6L -> "a", 8L -> "a"),
      s"emitted state was $out")
  }

  test("stream-stream join: late clicks drop on own ts; eviction is condition-derived, losing zero matches") {
    val views = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),  // long-evicted by wave 3
      (2L, ts("2024-01-20 10:00:00"), 100L),  // sets view max → wm Jan 17 10:00
      (9L, ts("2024-01-17 09:40:00"), 200L),  // state live at wave 3
      (10L, ts("2024-01-17 09:30:00"), 300L)) // ts < wm but ts+1h > wm → retained
      .toDF("event_id", "ts", "user_id")
    val wave1 = Seq(
      (3L, ts("2024-01-01 10:30:00"), 100L),  // matches view 1 in the seed batch
      (4L, ts("2024-01-20 10:30:00"), 100L))  // carries wave-1 max
      .toDF("event_id", "ts", "user_id")
    val wave2 = Seq(
      (7L, ts("2024-01-20 10:40:00"), 100L))  // burns a batch; still pre-watermark
      .toDF("event_id", "ts", "user_id")
    val wave3 = Seq(
      (5L, ts("2024-01-01 11:00:00"), 100L),  // below late wm → DROP (view 1 also evicted)
      (6L, ts("2024-01-20 10:45:00"), 100L),  // above late wm → matches view 2
      (8L, ts("2024-01-17 09:50:00"), 200L),  // below late wm though view 9 is LIVE → DROP
      (11L, ts("2024-01-17 10:20:00"), 300L)) // above late wm; view 10 below wm but
      .toDF("event_id", "ts", "user_id")      //   within the condition bound → MATCH
    val out = WatermarkQueries.runStreamJoin(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/sj_spec",
      views, Seq(wave1, wave2, wave3), "3 days",
      "v.user_id = c.user_id AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR",
      Seq("v.event_id AS view_id", "c.event_id AS click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 3L), (2L, 4L), (2L, 7L), (2L, 6L), (10L, 11L)),
      s"matches were $out")
    // (10,11) is the load-bearing pair: a raw-ts eviction rule would have
    // dropped view 10's state and lost it — condition-derived GC keeps
    // exactly the state surviving clicks can reach.
  }

  test("left-outer stream join: unmatched view null-extends exactly once after its window closes; open windows withheld") {
    val views = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),  // never matched; window long closed
      (2L, ts("2024-01-20 10:00:00"), 100L),  // matched by all three waves
      (4L, ts("2024-01-16 12:00:00"), 300L),  // never matched; closes Jan 16 13:00 < wmf
      (5L, ts("2024-01-17 09:45:00"), 300L))  // never matched; closes Jan 17 10:45 > wmf → WITHHELD
      .toDF("event_id", "ts", "user_id")
    val wave1 = Seq((3L, ts("2024-01-20 10:30:00"), 100L))
      .toDF("event_id", "ts", "user_id")
    val wave2 = Seq((6L, ts("2024-01-20 10:40:00"), 100L))
      .toDF("event_id", "ts", "user_id")
    val wave3 = Seq((7L, ts("2024-01-20 10:45:00"), 100L))
      .toDF("event_id", "ts", "user_id")
    // wmf = min(max view Jan 20 10:00, max click Jan 20 10:45) − 3d = Jan 17 10:00
    val rows = WatermarkQueries.runStreamJoin(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/oj_spec",
      views, Seq(wave1, wave2, wave3), "3 days",
      "v.user_id = c.user_id AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR",
      Seq("v.event_id AS view_id", "c.event_id AS click_id"),
      joinType = "left_outer")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    // exactly-once on the null extensions: a Seq (not Set) comparison
    // would catch a double emission
    assert(rows.count(_ == (1L, None)) == 1, s"view 1 must null-extend once: ${rows.toSeq}")
    assert(rows.count(_ == (4L, None)) == 1, s"view 4 must null-extend once: ${rows.toSeq}")
    assert(rows.toSet == Set((1L, None), (4L, None),
      (2L, Some(3L)), (2L, Some(6L)), (2L, Some(7L))),
      s"emitted rows were ${rows.toSeq}")
    // view 5's window is still open against the final watermark — "no
    // match yet" is not "no match"; it must stay in state, unemitted
    assert(!rows.exists(_._1 == 5L), "open-window view must be withheld")
  }

  test("event-time timeout: expired key's state is GONE — re-arrival starts fresh, no double emission") {
    def rows(xs: (String, Long)*) =
      xs.map { case (t, u) => (ts(t), u) }.toDF("ts", "user_id")
    val f1 = rows("2024-01-01 10:00:00" -> 1L, "2024-01-10 10:00:00" -> 9L)
    val f2 = rows("2024-01-20 10:00:00" -> 9L)
    val f3 = rows("2024-01-18 10:00:00" -> 1L,
      "2024-01-21 10:00:00" -> 9L, "2024-01-21 11:00:00" -> 9L)
    // user 1's Jan 1 session times out in batch 2 (timer Jan 1 10:30 <
    // wm Jan 7 10:00) → emitted, state REMOVED. Its Jan 18 re-arrival
    // must start a fresh session (count 1) — lingering state would have
    // closed the old session a second time (duplicate row) or resumed
    // it (count 2). Final wm = Jan 21 11:00 − 3d = Jan 18 11:00 fires
    // the fresh session's Jan 18 10:30 timer; user 9's open Jan 21
    // 11:00 session (timer 11:30) stays withheld.
    val out = WatermarkQueries.runTimeoutSessions(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/to_spec",
      Seq(f1, f2, f3), "3 days", gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(16), r.getLong(2)))
    assert(out.length == out.distinct.length,
      s"a session emitted twice — timed-out state was not removed: ${out.toSeq}")
    assert(out.toSet == Set(
      (1L, "2024-01-01 10:00", 1L),  // emitted by the TIMER, batch 2
      (1L, "2024-01-18 10:00", 1L),  // fresh post-timeout session, count 1
      (9L, "2024-01-10 10:00", 1L),  // closed by data, batch 2
      (9L, "2024-01-20 10:00", 1L),  // closed by data, batch 3
      (9L, "2024-01-21 10:00", 1L)), // closed by data WITHIN batch 3
      s"emitted sessions were ${out.toSeq}")
  }

  test("session windows: late row judged by its own session end; merged sessions emit once; open sessions withheld") {
    val f1 = Seq(
      (ts("2024-01-01 10:00:00"), 1L),
      (ts("2024-01-01 10:10:00"), 1L),   // merges with the row above
      (ts("2024-01-20 10:00:00"), 1L))   // slice-1 max → late wm Jan 17 10:00
      .toDF("ts", "user_id")
    val f2 = Seq(
      (ts("2024-01-20 10:20:00"), 1L),   // extends the OPEN Jan 20 session across slices
      (ts("2024-01-21 10:00:00"), 1L))   // global max → final wm Jan 18 10:00
      .toDF("ts", "user_id")
    val f3 = Seq(
      (ts("2024-01-02 10:00:00"), 2L),   // ts+gap ≤ late wm → DROP
      (ts("2024-01-17 09:50:00"), 2L),   // ts < wm but ts+gap > wm → LAND (session-end keyed)
      (ts("2024-01-17 10:05:00"), 2L))   // lands and MERGES with the row above
      .toDF("ts", "user_id")
    val out = WatermarkQueries.runSessions(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/ss_spec",
      Seq(f1, f2, f3), "3 days", "30 minutes")
      .collect()
      .map(r => (r.getLong(1), r.getTimestamp(0).toString.take(16), r.getLong(2)))
      .toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00", 2L),  // flushed pre-split session
      (2L, "2024-01-17 09:50", 2L)), // the boundary-late row anchors a merged session
      s"emitted sessions were $out")
    // user 1's Jan 20–21 sessions end past the final watermark → withheld;
    // user 2's Jan 2 row is judged by ITS session end (Jan 2 10:30) and drops.
  }

  test("transformWithState: distinct tracking suppresses re-arrivals, carries MapState across batches") {
    def rows(xs: (String, Long)*) = xs.toDF("event_type", "user_id")
    val f1 = rows("a" -> 1L, "a" -> 2L, "b" -> 1L)
    val f2 = rows("a" -> 1L)                 // pure re-arrival: count must NOT move
    val f3 = rows("a" -> 3L, "b" -> 9L)
    val out = WatermarkQueries.runDistinctUsers(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/dn_spec",
      Seq(f1, f2, f3))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // multiset, not set: batch 2's re-arrival emits the UNCHANGED count
    // — a (a,2) duplicate row — which is exactly what proves the
    // MapState suppressed it while the emission contract still fired
    assert(out.sorted == Seq(("a", 2L), ("a", 2L), ("a", 3L),
      ("b", 1L), ("b", 2L)).sorted,
      s"emitted rows were $out")
  }

  test("transformWithState initial state: seed counts without emitting, suppresses stream re-arrivals") {
    def rows(xs: (String, Long)*) = xs.toDF("event_type", "user_id")
    val seed = rows("a" -> 1L, "a" -> 2L, "b" -> 5L)
    val f1 = rows("a" -> 1L, "b" -> 6L) // u1 is seeded → count must not move
    val f2 = rows("a" -> 3L)
    val out = WatermarkQueries.runSeededDistinct(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/bs_spec",
      seed, Seq(f1, f2))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exactly 3 rows: one per (type, stream batch) — a 4th row would
    // mean the seed emitted; (a,2) proves the seeded users were counted
    // AND the re-arrival suppressed
    assert(out.sorted == Seq(("a", 2L), ("a", 3L), ("b", 2L)).sorted,
      s"emitted rows were $out")
  }

  test("flatMapGroupsWithState: running count carries across micro-batches, emits only on appearance") {
    def rows(xs: (String, Long)*) =
      xs.map { case (t, u) => (ts(t), u) }.toDF("ts", "user_id")
    val f1 = rows("2024-01-01 10:00:00" -> 1L, "2024-01-01 11:00:00" -> 1L,
      "2024-01-01 12:00:00" -> 2L)
    val f2 = rows("2024-01-02 10:00:00" -> 1L, "2024-01-02 11:00:00" -> 3L)
    val f3 = rows("2024-01-03 10:00:00" -> 2L, "2024-01-03 11:00:00" -> 2L)
    val out = WatermarkQueries.runRunningCount(spark,
      s"${sys.props("java.io.tmpdir")}/graft_stream/st_spec",
      Seq(f1, f2, f3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 1: 2 then 3 (prefix CARRY across batches); user 2: 1 then 3
    // (skipping the middle batch emits nothing — no phantom rows);
    // user 3: first seen in batch 2
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L)),
      s"emitted state was $out")
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
