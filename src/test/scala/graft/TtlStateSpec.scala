package graft

import graft.streaming.WatermarkQueries
import org.apache.spark.sql.Row

/** Pins the STATE-TTL expiry semantics the `ev_stream_ttl` oracle bakes
  * in, on hand-built frames where every decision is visible:
  *
  *  - a seen-set entry written in batch N is GONE for batch N+1 (the
  *    1 ms TTL is below every inter-batch gap, batch-clocked), so a
  *    re-arriving user RE-COUNTS — the expiry itself;
  *  - the TTL-free running total survives every batch — NONE never
  *    spuriously expires;
  *  - the same arrival through the TTL-free processor
  *    ([[WatermarkQueries.runDistinctUsers]]) suppresses the re-arrival
  *    — the two regimes differ exactly by TTL.
  */
class TtlStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("TTL'd seen-state expires between batches: re-arrival re-counts; NONE total survives") {
    val s1 = Seq(("a", 1L), ("a", 2L), ("a", 1L)).toDF("event_type", "user_id")
    val s2 = Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("event_type", "user_id")
    val out = WatermarkQueries.runTtlDistinct(spark, tmp("ttl"), Seq(s1, s2))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // batch 1: users {1,2} (intra-batch dup of 1 collapses in memory);
    // batch 2: ALL THREE count — user 1 and 2's entries expired, so they
    // re-count; a surviving entry would read (a,1,3) instead of (a,3,5)
    assert(out == Set(("a", 2L, 2L), ("a", 3L, 5L)),
      s"TTL expiry semantics drifted: $out")
  }

  test("contrast: TTLConfig.NONE suppresses the same re-arrivals forever") {
    val s1 = Seq(("a", 1L), ("a", 2L)).toDF("event_type", "user_id")
    val s2 = Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("event_type", "user_id")
    val out = WatermarkQueries.runDistinctUsers(spark, tmp("none"), Seq(s1, s2))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 2L), ("a", 3L)),
      s"NONE-TTL suppression drifted: $out")
  }
}
