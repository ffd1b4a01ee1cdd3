package graft

import graft.domain._
import org.apache.spark.sql.functions._

/** Golden tests for the domain query service (the 7 lambdas + 3 SQL files
  * re-expressed Spark-first). The DataFrame API is cross-checked against
  * the independently-written Spark SQL surface (two implementations must
  * agree), plus hand-checked invariants from the reference's semantics. */
class DomainSpec extends SparkSpec {

  lazy val t: DomainTables = Fixtures.tables(spark)
  lazy val qs = new QueryService(t)
  lazy val req = EarningsRequest("2024-09-01", "2024-09-30")

  test("earningsByDay: DataFrame API matches SQL surface exactly") {
    SqlSurface.registerViews(spark, t)
    val api = qs.earningsByDay("2024-09-01", "2024-09-30",
      "Medellín", "L1", "Zoe Do Santos").collect().toSeq
    val sql = SqlSurface.earningsByDay(spark, "2024-09-01", "2024-09-30",
      "Medellín", "L1", "Zoe Do Santos").collect().toSeq
    assert(api.nonEmpty)
    assert(api == sql)
  }

  test("SqlSurface rejects non-ISO date parameters (DATE-literal injection)") {
    SqlSurface.registerViews(spark, t)
    val e = intercept[IllegalArgumentException] {
      SqlSurface.earningsByDay(spark,
        "2024-09-01' OR '1'='1", "2024-09-30", "c", "o", "n")
    }
    assert(e.getMessage.contains("ISO date"))
    intercept[IllegalArgumentException] {
      SqlSurface.earningsByDayOfWeek(spark, "2024-09-01", "not-a-date")
    }
  }

  test("earningsByDayOfWeekSql: matches SQL surface; Monday-first; pct sums to ~100") {
    SqlSurface.registerViews(spark, t)
    val api = qs.earningsByDayOfWeekSql("2024-09-01", "2024-09-30").collect()
    val sql = SqlSurface.earningsByDayOfWeek(spark, "2024-09-01", "2024-09-30").collect()
    assert(api.toSeq == sql.toSeq)
    assert(api.map(_.getString(0)).toSeq ==
      Seq("Lun", "Mar", "Mié", "Jue", "Vie", "Sáb", "Dom"))
    val pctSum = api.map(_.getDouble(2)).sum
    assert(math.abs(pctSum - 100.0) < 0.5, s"percentages sum to $pctSum")
  }

  test("weeklyEarnings: matches SQL surface; ISO week/year boundary covered") {
    SqlSurface.registerViews(spark, t)
    val api = qs.weeklyEarnings(t.earningsByPerformer)
      .orderBy(col("year"), col("week")).collect().toSeq
    val sql = SqlSurface.weeklyEarnings(spark)
      .orderBy(col("year"), col("week")).collect().toSeq
    assert(api == sql && api.nonEmpty)
  }

  test("earningsSeries: date-aligned pivot with null gap-fill") {
    val out = qs.earningsSeries(EarningsRequest("2024-09-01", "2024-09-30"))
    assert(out.columns.toSeq == Seq("report_date", "jasmin", "streamate"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // u10 works only on streamate, u11 only jasmin → full outer alignment
    // must leave SOME nulls on days where only one platform reported
    val dates = rows.map(_.getString(0)).toSeq
    assert(dates == dates.sorted)
  }

  test("earningsSeries: platform filter restricts the series") {
    val sOnly = qs.earningsSeries(
      EarningsRequest("2024-09-01", "2024-09-30", platform = Some(Platform.Streamate)))
      .collect()
    assert(sOnly.forall(_.isNullAt(1)), "jasmin column must be all-null")
    assert(sOnly.exists(!_.isNullAt(2)))
  }

  test("detailedRanking: ordering, zero-coalesce, percentage, pagination") {
    val out = qs.detailedRanking(req.copy(limit = 50)).collect()
    assert(out.nonEmpty && out.length <= 50)
    val totals = out.map(_.getDouble(12))
    assert(totals.toSeq == totals.sortBy(-_).toSeq, "total_sales DESC")
    out.foreach { r =>
      val j = r.getDouble(6); val s = r.getDouble(8)
      assert(j > 0 || s > 0, "any-sales post-agg filter")
      val jp = r.getDouble(10); val sp = r.getDouble(11)
      assert(math.abs(jp + sp - 100.0) < 0.02, s"shares $jp+$sp")
    }
    // pagination: page 2 of size 3 = rows 4..6 of the full ordering
    val all = qs.detailedRanking(req.copy(limit = 1000)).collect()
    val page2 = qs.detailedRanking(req.copy(page = 2, limit = 3)).collect()
    assert(page2.map(_.getString(0)).toSeq ==
      all.slice(3, 6).map(_.getString(0)).toSeq)
  }

  test("detailedRankingPaged: total_results and hasMore match the reference contract") {
    val total = qs.detailedRanking(req.copy(limit = 100000)).count()
    assert(total > 3, "fixture must have enough ranked models to paginate")
    val p1 = qs.detailedRankingPaged(req.copy(page = 1, limit = 3))
    assert(p1.totalResults == total)
    assert(p1.rows.count() == 3 && p1.hasMore, "page 1 of >3 results has more")
    val lastPage = ((total + 2) / 3).toInt
    val pLast = qs.detailedRankingPaged(req.copy(page = lastPage, limit = 3))
    assert(!pLast.hasMore && pLast.rows.count() > 0, "last page has no more")
    assert(pLast.totalResults == total)
  }

  test("detailedRankingPaged collects page + total in ONE action") {
    val events = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = events.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = events.incrementAndGet()
    }
    spark.listenerManager.register(listener)
    try {
      val p = qs.detailedRankingPaged(req.copy(page = 1, limit = 3))
      assert(p.totalResults > 3 && p.hasMore)
      // listener delivery is async: wait for the first event, then give
      // any second one a window to show up before asserting it doesn't
      def settle(expect: Int): Unit = {
        val deadline = System.nanoTime() + 5_000_000_000L
        while (events.get() < expect && System.nanoTime() < deadline) Thread.sleep(20)
        Thread.sleep(400)
      }
      settle(1)
      assert(events.get() == 1,
        s"expected exactly one action (count rides the page plan), saw ${events.get()}")
      // past-the-end page: zero page rows, but the sentinel still carries
      // the total in the SAME single action — no fallback recount
      val past = qs.detailedRankingPaged(req.copy(page = 9999, limit = 3))
      assert(past.rows.count() == 0 && !past.hasMore)
      assert(past.totalResults == p.totalResults,
        "empty page must still report the full total")
      settle(3)
      // rows.count() above is itself one action on a local relation
      assert(events.get() == 3,
        s"past-the-end page must stay one action, saw ${events.get() - 1} for it")
    } finally spark.listenerManager.unregister(listener)
  }

  test("detailedRanking: streamate-only user gets 0 jasmin share without NaN") {
    val out = qs.detailedRanking(req.copy(limit = 1000)).collect()
    val u10 = out.find(_.getString(0) == "u10")
    assert(u10.isDefined, "u10 has streamate earnings in September")
    assert(u10.get.getDouble(6) == 0.0) // jasmin_sales
    assert(u10.get.getDouble(10) == 0.0) // jasmin_percentage (safeDiv, no NaN)
    assert(u10.get.getDouble(11) == 100.0)
  }

  test("earningsByDayOfWeek (lambda): Sunday-first display order") {
    val out = qs.earningsByDayOfWeek(req).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("Dom", "Lun", "Mar", "Mié", "Jue", "Vie", "Sáb"))
    val pct = out.map(_.getDouble(3)).sum
    assert(math.abs(pct - 100.0) < 0.5)
  }

  test("modelsEarningDistribution: top-5 + General, pct of total") {
    val out = qs.modelsEarningDistribution(req).collect()
    val names = out.map(_.getString(0))
    assert(names.contains("General"))
    assert(names.length <= 6)
    val general = out.find(_.getString(0) == "General").get
    assert(general.getString(1) == "" && general.getString(2) == "")
    assert(math.abs(out.map(_.getDouble(5)).sum - 100.0) < 1.0)
    // ascending variant flips the ranking target
    val asc = qs.modelsEarningDistribution(req.copy(sortDescending = false)).collect()
    assert(asc.map(_.getDouble(4)).toSeq == asc.map(_.getDouble(4)).sorted.toSeq)
  }

  test("needle: current value and prior-period target") {
    val out = qs.needle(EarningsRequest("2024-09-08", "2024-09-14")).collect()
    assert(out.length == 1)
    assert(!out.head.isNullAt(0), "current_value present")
    assert(!out.head.isNullAt(1), "target_value from 2024-09-01..07 present")
    assert(DomainFunctions.deduceTimeUnit("2024-09-08", "2024-09-14") == "week")
  }

  test("profitAvg: fixed category rows in fixed order with colors") {
    val out = qs.profitAvg(req).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("Toy", "Privada", "Otros"))
    assert(out.map(_.getString(3)).toSeq == Seq("#BD0909", "#EB8326", "#C9370F"))
    val toy = out(0)
    assert(toy.getDouble(2) == 0.0, "Toy has no earnings rows → COALESCE 0")
    assert(out(2).getDouble(2) > 0.0, "Otros carries the per-office average")
  }

  test("totalProfitReport: Total/Privada/Toy order; both-platform split") {
    val out = qs.totalProfitReport(req).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("Total", "Privada", "Toy"))
    val total = out(0).getDecimal(2)
    val privada = out(1).getDecimal(2)
    assert(total.doubleValue > 0, "jasmin totals land on 'Total'")
    assert(privada.doubleValue > 0, "streamate totals land on 'Privada'")
    assert(out(2).getDecimal(2).doubleValue == 0.0, "Toy stays zero")
  }

  test("averageProfitability: $/hour semantics + NaN guard") {
    val out = qs.averageProfitability(req).collect()
    assert(out.length == 1 && out.head.getString(0) == "Total")
    val r = out.head
    val perHour = r.getDouble(4)
    assert(math.abs(perHour - r.getDouble(2) / (r.getDouble(3) / 3600)) < 1e-9)
    // NaN guard: empty window → 0/0 → NaN → guarded to 0.0
    val empty = qs.averageProfitability(
      EarningsRequest("1990-01-01", "1990-01-02"))
    val guarded = QueryService.resultWithNanGuard(empty).collect()
    assert(guarded.forall(row => !row.anyNull || true))
    guarded.foreach { row =>
      assert(!row.getDouble(4).isNaN, "NaN must be zero-defaulted")
    }
  }

  test("request validation (F11): dates, order, paging") {
    assert(req.validate.isEmpty)
    assert(EarningsRequest("2024-13-99", "2024-09-30").validate.nonEmpty)
    assert(EarningsRequest("2024-09-30", "2024-09-01").validate ==
      Seq("start_date cannot be after end_date."))
    assert(EarningsRequest("2024-09-01", "2024-09-30", page = 0).validate.nonEmpty)
  }

  test("OR-join matches streamate-only and jasmin-only users, drops unmatched") {
    SqlSurface.registerViews(spark, t)
    val matched = spark.sql("""
      SELECT DISTINCT us._id FROM silver_earnings_by_performer eap
      INNER JOIN bronze_users us
        ON (eap.emailaddress = us.streamateuser OR eap.emailaddress = us.jasminuser)
    """).collect().map(_.getString(0)).toSet
    assert(matched.contains("u10") && matched.contains("u11"))
    assert(!matched.contains("u12"), "user with no accounts must drop out")
  }
}
