package graft

import java.sql.Timestamp

import graft.operators.EventOps

class TypePagerankSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // (event_id, ts, user_id, event_type): user 1 walks A→B→C, user 2 A→C —
  // C never has a successor, so it is the dangling node.
  private def fixture = Seq(
    (1L, ts(1), 1L, "A"), (2L, ts(2), 1L, "B"), (3L, ts(3), 1L, "C"),
    (4L, ts(1), 2L, "A"), (5L, ts(2), 2L, "C"))
    .toDF("event_id", "ts", "user_id", "event_type")

  test("dangling node: mass conserved, teleport floor, n_out = 0") {
    val out = EventOps.typePagerank(fixture).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    val r = out.map(row => row.getString(0) -> row.getDouble(2)).toMap
    // damping + dangling redistribution conserve total mass exactly
    assert(math.abs(r.values.sum - 1.0) < 1e-12, s"mass leaked: $r")
    // every node keeps at least the teleport share (1-d)/n
    r.values.foreach(v => assert(v >= (1.0 - 0.85) / 3 - 1e-15))
    // C receives from both users but emits nothing
    val nOut = out.map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(nOut == Map("A" -> 2L, "B" -> 1L, "C" -> 0L))
    // C absorbs the most traffic; A only holds teleport + dangling share
    assert(r("C") > r("A") && r("C") > r("B"))
  }

  test("symmetric two-cycle stays exactly uniform at every iteration") {
    val cyc = Seq(
      (1L, ts(1), 1L, "A"), (2L, ts(2), 1L, "B"),
      (3L, ts(3), 1L, "A"), (4L, ts(4), 1L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
    EventOps.typePagerank(cyc).collect().foreach { row =>
      assert(row.getDouble(2) == 0.5, s"${row.getString(0)} drifted off 0.5")
    }
  }

  test("damping bounds are enforced") {
    intercept[IllegalArgumentException] {
      EventOps.typePagerank(fixture, damping = 1.0)
    }
  }
}
