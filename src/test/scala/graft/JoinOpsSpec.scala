package graft

import graft.operators.JoinOps

/** Regression tests for the scale-path OR-join decomposition (ADVICE r2:
  * the old dedup-on-left-id collapsed a left row's matches against two
  * DIFFERENT right rows into one nondeterministic survivor). */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1L, 10L, "l1"), (2L, 20L, "l2"), (3L, 99L, "l3"))
    .toDF("lid", "k", "l_payload")
  // right row 100 matches k=10 via a; row 101 ALSO matches k=10 via b;
  // row 102 matches k=20 via BOTH keys (must not double-count)
  private val right = Seq((100L, 10L, 0L), (101L, 0L, 10L), (102L, 20L, 20L))
    .toDF("rid", "ka", "kb")

  test("orJoinDecomposed matches the OR-predicate join exactly") {
    val expected = left
      .join(right, $"k" === $"ka" || $"k" === $"kb")
      .select($"lid", $"rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = JoinOps.orJoinDecomposed(left, right, "k", "ka", "kb",
        leftId = Seq("lid"), rightId = Seq("rid"))
      .select($"lid", $"rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected == Set((1L, 100L), (1L, 101L), (2L, 102L)))
    assert(got == expected,
      "a left row matching two different right rows must keep both; " +
        "a pair matching via both keys must appear once")
  }
}
