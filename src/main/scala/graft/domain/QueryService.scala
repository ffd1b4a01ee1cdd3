package graft.domain

import DomainFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's gold/serving layer as a typed Scala API — one method per
  * analytics lambda / SQL file (SURVEY §2, §3.1). The lambdas' SQL-string
  * templating becomes DataFrame construction: stages 3–7 of the reference
  * lifecycle collapse into a single Catalyst plan per request, and the
  * Python post-processing (pivoting, NaN guards, pagination) moves into
  * the engine.
  *
  * Scale: `users` is a dimension → broadcast everywhere; per-request date
  * filters sit directly on the fact scan (partition-prunable when the
  * perf tables are written partitioned by date).
  */
object QueryService {
  /** The lambdas' client-side zero-defaulting of NaN/null numerics
    * (`safe_float` `detailedRanking.py:8-19`, NaN guard
    * `averageProfitability.py:251-263`) as an engine-side post-step. */
  def resultWithNanGuard(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType => coalesce(nanvl(col(f.name), lit(0.0)), lit(0.0)).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
}

final class QueryService(t: DomainTables) {

  private val users = broadcast(t.users)

  private def perfFor(p: Option[Platform]): DataFrame = p match {
    case Some(Platform.Jasmin) => t.jasminPerf
    case Some(Platform.Streamate) => t.streamatePerf
    case None => t.jasminPerf.unionByName(t.streamatePerf)
  }

  /** Query-time casts — silver values are strings (SURVEY §1.3). */
  private def d(c: Column) = c.cast(DateType)
  private def dbl(c: Column) = c.cast(DoubleType)
  private def int(c: Column) = c.cast(IntegerType)

  private def between(dateCol: Column, r: EarningsRequest): Column =
    d(dateCol).between(r.startDate, r.endDate)

  private def locPred(r: EarningsRequest, withUser: Boolean): Option[Column] =
    locationsPredicate(
      r.locations,
      if (withUser) r.userSelected else None,
      col("office"), col("city"), col("us_id"))

  /** Users columns under stable names (avoids _id collision with facts). */
  private val usersSel = users.select(
    col("_id").as("us_id"), col("artisticname"), col("city"),
    col("office"), col("room"), col("picture"),
    col("streamateuser"), col("jasminuser"))

  /** `queries/earnings_by_day.sql` — daily totals for one artist via the
    * OR-disjunction email join (J2) + location equality filters. */
  def earningsByDay(startDate: String, endDate: String, city: String,
      office: String, artisticName: String): DataFrame = {
    val eap = t.earningsByPerformer
    eap.join(usersSel,
        eap("emailaddress") === col("streamateuser") ||
          eap("emailaddress") === col("jasminuser"))
      .filter(d(col("date")).between(startDate, endDate) &&
        col("city") === city && col("office") === office &&
        col("artisticname") === artisticName)
      .groupBy(col("date"))
      .agg(sum(dbl(col("payableamount"))).as("totalAmount"))
      .orderBy(col("date"))
  }

  /** `earnings.py` — per-day series per platform (UNION ALL when both),
    * then the lambda's client-side pivot (`:162-213`) done in-engine:
    * date-aligned wide columns with null gap-fill (F14). */
  def earningsSeries(r: EarningsRequest): DataFrame = {
    def side(perf: DataFrame, label: String) = {
      val base = perf
        .join(usersSel, perf("_id") === col("us_id"))
        .filter(d(perf("date")) >= lit(r.startDate))
      locPred(r, withUser = true).fold(base)(base.filter)
        .groupBy(perf("date").as("report_date"))
        .agg(sum(dbl(col("total_earnings"))).as("totalAmount"))
        .withColumn("source", lit(label))
    }
    val series = r.platform match {
      case Some(Platform.Jasmin) => side(t.jasminPerf, "Jasmin")
      case Some(Platform.Streamate) => side(t.streamatePerf, "Streamate")
      case None => side(t.streamatePerf, "Streamate")
        .unionByName(side(t.jasminPerf, "Jasmin"))
    }
    series
      .groupBy(col("report_date"))
      .pivot("source", Seq("Jasmin", "Streamate"))
      .agg(first(col("totalAmount")))
      .withColumnsRenamed(Map("Jasmin" -> "jasmin", "Streamate" -> "streamate"))
      .orderBy(col("report_date"))
  }

  /** `detailedRanking.py` — per-model full-outer join of per-platform
    * aggregates, zero-coalesced, with platform share percentages and the
    * post-agg "any sales" filter + pagination (O5) in-engine. */
  def detailedRanking(r: EarningsRequest): DataFrame =
    detailedRankingUnpaged(r)
      .offset((r.page - 1) * r.limit)
      .limit(r.limit)

  /** `detailedRanking.py:229-236` — the page slice plus the response
    * metadata the reference computes around it: `total_results` (count
    * over the full filtered ranking) and `hasMore` (pages left after this
    * one).
    *
    * ONE action for EVERY page where the reference runs two passes
    * (len(all) + slice): `count(*) OVER ()` rides along the ranking
    * plan, so the page rows and the total arrive in the same collect.
    * The global window is a single-partition exchange — fine here by
    * the same argument as W1: the ranking is a POST-aggregation frame
    * of dashboard cardinality (one row per model, SURVEY §2.5), and the
    * sort below it is already global. A past-the-end page slices to
    * zero rows, which would carry no total — so one SENTINEL row of the
    * same windowed frame rides the union and always delivers it; an
    * empty ranking delivers no sentinel and the total is legitimately
    * 0. No page shape triggers a second action (spec-asserted via a
    * QueryExecutionListener). */
  def detailedRankingPaged(r: EarningsRequest): RankingPage = {
    val spark = t.users.sparkSession
    val ranked = detailedRankingUnpaged(r)
      .withColumn("__total", count(lit(1)).over(Window.partitionBy()))
      .orderBy(col("total_sales").desc, col("artisticname").asc)
    val pageRows = ranked
      .offset((r.page - 1) * r.limit)
      .limit(r.limit)
      .withColumn("__page", lit(1))
    val sentinel = ranked.limit(1).withColumn("__page", lit(0))
    val collected = pageRows.unionByName(sentinel).collect()
    val total = collected.headOption
      .map(_.getAs[Long]("__total"))
      .getOrElse(0L) // no sentinel ⇒ the ranking itself is empty
    val pageOnly = collected.filter(_.getAs[Int]("__page") == 1)
    val schema = StructType(pageRows.schema.fields.dropRight(2))
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(pageOnly.map(row =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq.dropRight(2))): _*),
      schema)
    RankingPage(
      rows = rows,
      totalResults = total,
      hasMore = r.page.toLong * r.limit < total)
  }

  private def detailedRankingUnpaged(r: EarningsRequest): DataFrame = {
    def side(perf: DataFrame) = {
      val base = perf
        .join(usersSel, perf("_id") === col("us_id"))
        .filter(between(perf("date"), r))
      locPred(r, withUser = false).fold(base)(base.filter)
        .groupBy(col("us_id"), col("artisticname"), col("city"),
          col("office"), col("room"), col("picture"))
        .agg(
          sum(dbl(col("total_earnings"))).as("sales"),
          sum(int(col("online_seconds")).cast(LongType)).as("time"))
    }
    val jd = side(t.jasminPerf)
      .withColumnsRenamed(Map("us_id" -> "j_id", "artisticname" -> "j_name",
        "city" -> "j_city", "office" -> "j_office", "room" -> "j_room",
        "picture" -> "j_pic", "sales" -> "j_sales", "time" -> "j_time"))
    val sd = side(t.streamatePerf)
      .withColumnsRenamed(Map("us_id" -> "s_id", "artisticname" -> "s_name",
        "city" -> "s_city", "office" -> "s_office", "room" -> "s_room",
        "picture" -> "s_pic", "sales" -> "s_sales", "time" -> "s_time"))
    val z = lit(0.0)
    val js = coalesce(col("j_sales"), z)
    val ss = coalesce(col("s_sales"), z)
    jd.join(sd, col("j_id") === col("s_id"), "full_outer")
      .select(
        coalesce(col("j_id"), col("s_id")).as("_id"),
        coalesce(col("j_name"), col("s_name")).as("artisticname"),
        coalesce(col("j_city"), col("s_city")).as("city"),
        coalesce(col("j_office"), col("s_office")).as("office"),
        coalesce(col("j_room"), col("s_room")).as("room"),
        col("j_pic").as("picture"),
        js.as("jasmin_sales"),
        coalesce(col("j_time"), lit(0L)).as("jasmin_time"),
        ss.as("streamate_sales"),
        coalesce(col("s_time"), lit(0L)).as("streamate_time"),
        round(safeDiv(js, js + ss) * 100, 2).as("jasmin_percentage"),
        round(safeDiv(ss, js + ss) * 100, 2).as("streamate_percentage"),
        (js + ss).as("total_sales"))
      // post-agg row filter, ref `detailedRanking.py:220-221`
      .filter(col("jasmin_sales") > 0 || col("streamate_sales") > 0)
      .orderBy(col("total_sales").desc, col("artisticname").asc)
  }

  /** `earningsByDayOfWeek.py` — avg per ISO weekday with Spanish labels,
    * % of summed daily averages, Sunday-first display order. */
  def earningsByDayOfWeek(r: EarningsRequest): DataFrame = {
    val perf = perfFor(r.platform)
    val joined0 = perf
      .join(usersSel, perf("_id") === col("us_id"))
      .filter(between(perf("date"), r))
    val joined1 = locPred(r, withUser = false).fold(joined0)(joined0.filter)
    val combined = r.userSelected // separate AND, ref `earningsByDayOfWeek.py:65-67`
      .fold(joined1)(u => joined1.filter(col("us_id") === u))
      .select(d(perf("date")).as("day"), dbl(col("total_earnings")).as("earnings"))
    val perDow = combined
      .groupBy(isoDayOfWeek(col("day")).as("day_number"))
      .agg(
        round(sum(col("earnings")), 2).as("TOTAL"),
        round(sum(col("earnings")) / countDistinct(col("day")), 2).as("average_per_day"))
    val totalAvg = perDow.agg(sum(col("average_per_day")).as("total_avg"))
    perDow.crossJoin(broadcast(totalAvg))
      .select(
        spanishDow(col("day_number")).as("DOW"),
        col("TOTAL"),
        col("average_per_day"),
        round(col("average_per_day") / col("total_avg") * 100, 2).as("percentage"),
        col("day_number"))
      .orderBy(sundayFirstRank(col("day_number")))
      .drop("day_number")
  }

  /** `models_earning_distribution.py` — artist ranking by total earnings,
    * top-5 kept, the rest bucketed as 'General', with % of global total. */
  def modelsEarningDistribution(r: EarningsRequest): DataFrame = {
    val perf = perfFor(r.platform)
    val base0 = perf
      .join(usersSel, perf("_id") === col("us_id"))
      .filter(between(perf("date"), r))
    val base = locPred(r, withUser = true).fold(base0)(base0.filter)
    val sortCol =
      if (r.sortDescending) col("total_earnings").desc else col("total_earnings").asc
    val ranked = base
      .groupBy(col("artisticname"))
      .agg(
        max(col("picture")).as("picture"),
        max(col("city")).as("city"),
        max(col("office")).as("office"),
        round(sum(dbl(col("total_earnings"))), 2).as("total_earnings"))
      .withColumn("ranking",
        row_number().over(Window.orderBy(sortCol, col("artisticname").asc)))
    val total = ranked.agg(round(sum(col("total_earnings")), 2).as("total_global"))
    val bucketed = ranked.select(
      when(col("ranking") <= 5, col("artisticname")).otherwise("General").as("artisticname"),
      when(col("ranking") <= 5, col("picture")).otherwise("").as("picture"),
      when(col("ranking") <= 5, col("city")).otherwise("").as("city"),
      when(col("ranking") <= 5, col("office")).otherwise("").as("office"),
      col("total_earnings"))
    val out = bucketed
      .groupBy(col("artisticname"))
      .agg(
        max(col("picture")).as("picture"),
        max(col("city")).as("city"),
        max(col("office")).as("office"),
        round(sum(col("total_earnings")), 2).as("total_earnings"))
      .crossJoin(broadcast(total))
      .select(
        col("artisticname"), col("picture"), col("city"), col("office"),
        col("total_earnings"),
        round(col("total_earnings") / col("total_global") * 100, 2).as("percentage"))
    out.orderBy(
      if (r.sortDescending) col("total_earnings").desc else col("total_earnings").asc)
  }

  /** `needle.py` — current-period total vs the average of the same-length
    * prior period buckets (time unit deduced from the range length, F12;
    * prior window via periodShift, F5). */
  def needle(r: EarningsRequest): DataFrame = {
    val unit = deduceTimeUnit(r.startDate, r.endDate)
    val perf = perfFor(r.platform)
    // ref `needle.py:96-102`: LEFT JOIN + WHERE on the right side — the
    // WHERE nulls out unmatched rows, so semantics equal INNER (kept).
    val joined0 = usersSel.join(perf, perf("_id") === col("us_id"), "left")
    val joined1 = r.userSelected.fold(joined0)(u => joined0.filter(col("us_id") === u))
    val joined = locationsPredicate(r.locations, None, col("office"),
      col("city"), col("us_id")).fold(joined1)(joined1.filter)
    val current = joined
      .filter(between(perf("date"), r))
      .agg(sum(col("total_earnings").cast(DecimalType(10, 2))).as("current_value"))
    val prevStart = periodShift(unit, lit(r.startDate).cast(DateType))
    val prevEnd = periodShift(unit, lit(r.endDate).cast(DateType))
    val bucket = unit match {
      case "day" => dayofmonth(d(perf("date")))
      case "week" => weekofyear(d(perf("date")))
      case "biweek" => (weekofyear(d(perf("date"))) / 2)
      case "month" => month(d(perf("date")))
      case "quarter" => quarter(d(perf("date")))
      case _ => year(d(perf("date")))
    }
    val historical = joined
      .filter(d(perf("date")).between(prevStart, prevEnd))
      .groupBy(bucket.as("bucket"))
      .agg(sum(col("total_earnings").cast(DecimalType(10, 2))).as("total_earnings"))
    val target = historical.agg(avg(col("total_earnings")).as("target_value"))
    current.crossJoin(target)
  }

  /** `profitAvg.py` — literal category dim (Toy/Privada/Otros) LEFT JOIN
    * per-office earnings sums, avg per category, hex colors (J4/U3). */
  def profitAvg(r: EarningsRequest): DataFrame = {
    import t.users.sparkSession.implicits._
    val base = Seq("Toy", "Privada", "Otros").toDF("transmissionType")
    val eap = t.earningsByPerformer
    val earnings0 = eap
      .join(usersSel,
        eap("emailaddress") === col("streamateuser") ||
          eap("emailaddress") === col("jasminuser"))
      .filter(between(eap("date"), r))
    val earnings = locPred(r, withUser = false).fold(earnings0)(earnings0.filter)
      .groupBy(col("office"))
      .agg(sum(coalesce(dbl(col("payableamount")), lit(0.0))).as("payableamount"))
      .withColumn("transmissionType", lit("Otros"))
    base.join(earnings, Seq("transmissionType"), "left")
      .groupBy(col("transmissionType"))
      .agg(coalesce(avg(col("payableamount")), lit(0.0)).as("value"))
      .select(
        col("transmissionType").as("id"),
        col("transmissionType").as("label"),
        col("value"),
        when(col("transmissionType") === "Toy", "#BD0909")
          .when(col("transmissionType") === "Privada", "#EB8326")
          .when(col("transmissionType") === "Otros", "#C9370F")
          .otherwise("#000000").as("color"))
      .orderBy(
        when(col("id") === "Toy", 1)
          .when(col("id") === "Privada", 2)
          .when(col("id") === "Otros", 3).otherwise(4))
  }

  /** `totalProfitReport.py` — category spine (Toy/Privada/Total) with one
    * LEFT JOIN per platform (both → J8 chained left joins); DECIMAL money.
    *
    * DOCUMENTED DEVIATION (reference bug, same policy as SURVEY §7.4.5):
    * in the reference's both-platforms branch the streamate CTE is joined
    * but never read — the projection sums only
    * `earnings_jasmin.payableamount` (`totalProfitReport.py:148`), so the
    * streamate money silently vanishes from the "both" total. Here the
    * both branch adds the streamate sum (`payableamount2` below), which
    * is what every sibling lambda (earnings.py, profitAvg.py) does and
    * plainly what the query intends. To reproduce the reference's buggy
    * output bit-for-bit, pass `Platform.Jasmin` instead of None. */
  def totalProfitReport(r: EarningsRequest): DataFrame = {
    import t.users.sparkSession.implicits._
    val base = Seq("Toy", "Privada", "Total").toDF("transmissionType")
    def side(perf: DataFrame, label: String) = {
      val j0 = perf.join(usersSel, perf("_id") === col("us_id"))
        .filter(between(perf("date"), r))
      locPred(r, withUser = true).fold(j0)(j0.filter)
        .groupBy(col("office"))
        .agg(sum(coalesce(col("total_earnings").cast(DecimalType(38, 0)), lit(0)))
          .as("payableamount"))
        .withColumn("transmissionType", lit(label))
        .select(col("transmissionType"), col("payableamount"))
    }
    val joined = r.platform match {
      case Some(Platform.Jasmin) =>
        base.join(side(t.jasminPerf, "Total"), Seq("transmissionType"), "left")
      case Some(Platform.Streamate) =>
        base.join(side(t.streamatePerf, "Total"), Seq("transmissionType"), "left")
      case None =>
        base
          .join(side(t.jasminPerf, "Total"), Seq("transmissionType"), "left")
          .join(side(t.streamatePerf, "Privada")
            .withColumnRenamed("payableamount", "payableamount2"),
            Seq("transmissionType"), "left")
    }
    val value = joined.columns.toSeq match {
      case cs if cs.contains("payableamount2") =>
        coalesce(sum(coalesce(col("payableamount"), lit(0)) +
          coalesce(col("payableamount2"), lit(0))), lit(0))
      case _ => coalesce(sum(coalesce(col("payableamount"), lit(0))), lit(0))
    }
    joined
      .groupBy(col("transmissionType"))
      .agg(value.as("value"))
      .select(
        col("transmissionType").as("id"),
        col("transmissionType").as("label"),
        col("value"),
        when(col("transmissionType") === "Toy", "#21619A")
          .when(col("transmissionType") === "Privada", "#EB933D")
          .when(col("transmissionType") === "Total", "#219E0D")
          .otherwise("#000000").as("color"))
      .orderBy(
        when(col("id") === "Total", 1)
          .when(col("id") === "Privada", 2)
          .when(col("id") === "Toy", 3).otherwise(4))
  }

  /** `averageProfitability.py` — per-category totals with $/hour
    * (seconds/3600); double division semantics preserved (0/0 → NaN,
    * surfaced as zeros by [[resultWithNanGuard]] like the lambda's
    * client-side guard `:251-263`). */
  def averageProfitability(r: EarningsRequest): DataFrame = {
    import t.users.sparkSession.implicits._
    val base = Seq("Toy", "Privada", "Total").toDF("transmissionType")
    val perf = perfFor(r.platform)
    val j0 = perf.join(usersSel, perf("_id") === col("us_id"))
      .filter(between(perf("date"), r))
    val te = locPred(r, withUser = true).fold(j0)(j0.filter)
      .agg(
        sum(coalesce(dbl(col("total_earnings")), lit(0.0))).as("total_earnings"),
        sum(coalesce(dbl(col("online_seconds")), lit(0.0))).as("total_seconds"))
      .withColumn("transmissionType", lit("Total"))
    base.join(te, Seq("transmissionType"), "inner")
      .groupBy(col("transmissionType"))
      .agg(
        sum(col("total_earnings")).as("total_value"),
        sum(col("total_seconds")).as("total_seconds"))
      .select(
        col("transmissionType").as("id"),
        col("transmissionType").as("label"),
        col("total_value"),
        col("total_seconds"),
        (col("total_value") / (col("total_seconds") / 3600)).as("average_per_hour"),
        when(col("transmissionType") === "Toy", "#21619A")
          .when(col("transmissionType") === "Privada", "#EB933D")
          .when(col("transmissionType") === "Total", "#219E0D")
          .otherwise("#000000").as("color"))
      .orderBy(
        when(col("id") === "Total", 1)
          .when(col("id") === "Privada", 2)
          .when(col("id") === "Toy", 3).otherwise(4))
  }

  /** `src/Athena/weekly_earnings.sql` — weekly rollup (A2). */
  def weeklyEarnings(bronzeEarnings: DataFrame): DataFrame =
    bronzeEarnings
      .groupBy(
        year(d(col("date"))).as("year"),
        weekofyear(d(col("date"))).as("week"))
      .agg(
        sum(dbl(col("payableamount"))).as("totalAmount"),
        sum(dbl(col("onlineseconds"))).as("totalSeconds"))

  /** `queries/earnings_by_day_of_week.sql` — September window, Spanish
    * labels, % against a scalar-subquery total, Monday-first ASC order
    * (the SQL file's own order — differs from the lambda's Sunday-first;
    * both preserved, SURVEY §7.4.1). */
  def earningsByDayOfWeekSql(startDate: String, endDate: String): DataFrame = {
    val eap = t.earningsByPerformer
    val joined = eap
      .join(usersSel,
        eap("emailaddress") === col("streamateuser") ||
          eap("emailaddress") === col("jasminuser"))
      .filter(d(col("date")).between(startDate, endDate))
      .select(d(col("date")).as("day"), dbl(col("payableamount")).as("amount"))
    val total = joined.agg(sum(col("amount")).as("grand_total"))
    joined
      .groupBy(isoDayOfWeek(col("day")).as("day_number"))
      .agg(round(sum(col("amount")), 2).as("TOTAL"),
        sum(col("amount")).as("raw_total"))
      .crossJoin(broadcast(total))
      .select(
        spanishDow(col("day_number")).as("DOW"),
        col("TOTAL"),
        round(col("raw_total") / col("grand_total") * 100, 2).as("percentage"),
        col("day_number"))
      .orderBy(col("day_number").asc)
      .drop("day_number")
  }
}
