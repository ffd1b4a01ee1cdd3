package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[GlobalRank]] — the distributed global row_number must agree with the
  * single-partition window form row for row, keep every WindowExec out of
  * its plan, and stay stable across repeated actions on the same frame. */
class GlobalRankSpec extends SparkSpec {
  import org.scalatest.matchers.should.Matchers._

  private def fixture = {
    import spark.implicits._
    // values with ties in the leading key (rank must fall back to the
    // tiebreak), negatives, and enough rows to span many range partitions
    (1 to 5000).map(i => (i.toLong, (i % 37) - 18, s"k$i"))
      .toDF("id", "score", "tag")
  }

  test("matches the window-form global row_number exactly") {
    import spark.implicits._
    val df = fixture
    val order = Seq($"score".desc, $"id".asc)
    val got = GlobalRank.withRowNumber(df, "rn", order, numPartitions = 16)
      .select($"id", $"rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df
      .withColumn("rn", row_number().over(Window.orderBy($"score".desc, $"id".asc)))
      .select($"id", $"rn").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    got shouldBe want
  }

  test("plan contains no WindowExec and ranks arrive from >1 partition") {
    import spark.implicits._
    val df = fixture
    val ranked = GlobalRank.withRowNumber(df, "rn",
      Seq($"score".desc, $"id".asc), numPartitions = 16)
    ranked.collect()
    def flat(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect { case x => x }
        case other => other.collect { case x => x }
      }
    val nodes = flat(ranked.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      "global rank must not plan a WindowExec (single-partition sort)")
    // the pinned sorted frame really is distributed
    val parts = ranked.select(spark_partition_id()).distinct().count()
    assert(parts > 1, s"expected a multi-partition ranked frame, got $parts")
  }

  test("ranks are dense, unique, 1-based, and stable across actions") {
    import spark.implicits._
    val ranked = GlobalRank.withRowNumber(fixture, "rn",
      Seq($"score".desc, $"id".asc), numPartitions = 7)
    val first = ranked.select($"id", $"rn").collect().map(r => (r.getLong(0), r.getLong(1)))
    val again = ranked.select($"id", $"rn").collect().map(r => (r.getLong(0), r.getLong(1)))
    first.sortBy(_._1) shouldBe again.sortBy(_._1)
    val rns = first.map(_._2).sorted
    rns shouldBe (1L to 5000L).toArray
  }

  test("leaves no persisted RDDs behind — the pin is a reliable checkpoint, not a cache") {
    import spark.implicits._
    // diff against the session baseline: other suites sharing this
    // session may legitimately hold pins of their own
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ranked = GlobalRank.withRowNumber(fixture, "rn", Seq($"id".asc), 4)
    ranked.collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"GlobalRank must not squat on executor memory after its action: $leaked")
  }

  test("empty input yields an empty ranked frame with the rank column") {
    import spark.implicits._
    val empty = fixture.filter($"id" < 0)
    val ranked = GlobalRank.withRowNumber(empty, "rn", Seq($"id".asc))
    assert(ranked.columns.contains("rn"))
    assert(ranked.count() === 0)
  }
}
