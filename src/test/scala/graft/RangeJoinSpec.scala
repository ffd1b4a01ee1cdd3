package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("range join: inclusive bounds, bucket-boundary spanning, no dups") {
    val points = Seq(
      (1L, "k", 100L), // == start (inclusive)
      (2L, "k", 150L), // inside
      (3L, "k", 200L), // == end (inclusive)
      (4L, "k", 201L), // outside
      (5L, "k", 1050L) // inside an interval spanning a bucket boundary
    ).toDF("id", "key", "t")
    val intervals = Seq(
      ("k", 100L, 200L, "w1"),
      ("k", 990L, 1100L, "w2") // spans buckets at width 1000
    ).toDF("key", "s", "e", "win")
    val out = RangeJoin
      .joinRange(points, intervals, "key", "t", "s", "e", bucketWidth = 1000L)
      .select($"id", $"win").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq == Seq((1L, "w1"), (2L, "w1"), (3L, "w1"), (5L, "w2")))
  }

  test("overlapping intervals produce one row per (point, interval) pair") {
    val points = Seq((1L, "k", 50L)).toDF("id", "key", "t")
    val intervals = Seq(("k", 0L, 100L, "a"), ("k", 40L, 60L, "b"))
      .toDF("key", "s", "e", "win")
    val out = RangeJoin
      .joinRange(points, intervals, "key", "t", "s", "e", bucketWidth = 10L)
      .count()
    assert(out == 2)
  }
}
