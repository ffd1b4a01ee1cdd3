package graft

import java.sql.Timestamp

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Gap semantics of [[EventOps.resampleDaily]] — the sf0.01 grid the
  * declared query's oracle replays happens to be dense (every type fires
  * every day), so the fill paths need a fixture with real holes: a silent
  * day must surface as a zero-count row, the carried metric must
  * forward-fill from the LAST OBSERVED day (not interpolate, not leak
  * across types), and days before a type's first observation must carry
  * null (no history, never a guess). */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")

  test("silent days fill with zero; carried value forward-fills per type, null before first sighting") {
    val ev = Seq(
      // type A fires day 1 (two events) and day 3; day 2 is a HOLE
      (1L, ts(1), 7L, "A", 4.25, "{}"),
      (2L, ts(1), 7L, "A", 6.25, "{}"),
      (3L, ts(3), 8L, "A", 2.00, "{}"),
      // type B first fires day 2: day 1 must carry NULL, days 2-3 carry 9.5
      (4L, ts(2), 9L, "B", 9.50, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val got = EventOps.resampleDaily(ev)
      .orderBy($"event_type", $"day")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSeq

    assert(got == Seq(
      ("A", "2024-01-01", 2L, Some(10.5)), // 4.25 + 6.25, decimal-exact
      ("A", "2024-01-02", 0L, Some(10.5)), // hole: zero events, carried sum
      ("A", "2024-01-03", 1L, Some(2.0)),
      ("B", "2024-01-01", 0L, None),       // before B's first observation
      ("B", "2024-01-02", 1L, Some(9.5)),
      ("B", "2024-01-03", 0L, Some(9.5))   // forward-filled, not A's value
    ))
  }

  test("spine covers exactly the table's [min, max] day span for every type") {
    val ev = Seq(
      (1L, ts(2), 1L, "X", 1.0, "{}"),
      (2L, ts(5), 1L, "Y", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.resampleDaily(ev)
    assert(out.count() == 8, "2 types x 4 days (Jan 2..5)")
    val perType = out.groupBy($"event_type").agg(count(lit(1)).as("n"),
      min($"day").as("lo"), max($"day").as("hi")).collect()
    perType.foreach { r =>
      assert(r.getLong(1) == 4)
      assert(r.getDate(2).toString == "2024-01-02")
      assert(r.getDate(3).toString == "2024-01-05")
    }
  }
}
