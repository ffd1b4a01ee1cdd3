package graft

class ApproxDistinctSpec extends SparkSpec {
  test("HLL approx distinct within 5% of exact") {
    val rows = SparkEntry.queries("a15_approx_count_distinct")(spark, sf0001)
      .collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
