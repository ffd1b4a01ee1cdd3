package graft

/** The one rows-only query (no DuckDB oracle: HLL sketches differ across
  * engines) gets its quantitative guard here instead — the declared
  * pipeline's approximation must stay inside the requested 2% rsd's
  * practical envelope (5%) against the EXACT count it carries alongside.
  * Asserted at sf0.001 (fast) and at sf0.01 — the exact scale the
  * driver's correctness gate runs, so the rows-only entry is checked at
  * the same data the other 130 queries are. */
class ApproxDistinctSpec extends SparkSpec {

  private def assertBound(sfDir: String): Unit = {
    val rows = SparkEntry.queries("a15_approx_count_distinct")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, s"no groups at $sfDir — vacuous bound")
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact at $sfDir")
    }
  }

  test("HLL approx distinct within 5% of exact at sf0.001") {
    assertBound(sf0001)
  }

  test("HLL approx distinct within 5% of exact at sf0.01 (the driver's gate scale)") {
    assertBound("/root/testdata/sf0.01")
  }
}
