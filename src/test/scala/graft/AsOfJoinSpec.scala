package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of picks latest right at-or-before left time; null when none") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // before any right → null
      (2L, "u1", ts("2024-01-01 12:00:00")), // exactly at right ts → match it
      (3L, "u1", ts("2024-01-01 15:00:00")), // between updates → earlier one
      (4L, "u1", ts("2024-01-02 00:00:00")), // after both → latest
      (5L, "u2", ts("2024-01-01 13:00:00"))  // other key, no right rows → null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 12:00:00"), 100.0),
      ("u1", ts("2024-01-01 16:00:00"), 200.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      (1L, None), (2L, Some(100.0)), (3L, Some(100.0)),
      (4L, Some(200.0)), (5L, None)))
  }

  test("as-of rejects right payload columns that collide with left columns") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"), 5.0))
      .toDF("id", "k", "t", "v")
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOf(left, right, "k", "t")
    }
    assert(e.getMessage.contains("v"))
  }

  test("as-of preserves all left rows and columns") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"), "extra"))
      .toDF("id", "k", "t", "tag")
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "t", "v")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t")
    assert(out.columns.toSeq == Seq("id", "k", "t", "tag", "v"))
    assert(out.count() == 1 && out.head().getDouble(4) == 7.0)
  }
}
