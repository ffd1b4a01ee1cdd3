package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** Scalar helpers shared by the domain queries — SURVEY §2.8.
  * All composite built-ins (no custom Expressions needed, SURVEY §7.5). */
object DomainFunctions {

  /** F4: Presto `day_of_week` (ISO, Mon=1..Sun=7). Spark's `dayofweek` is
    * Sun=1..Sat=7 — the known mismatch (SURVEY §7.4.1); `weekday()+1`
    * (Mon=0..Sun=6, +1) reproduces Presto exactly. */
  def isoDayOfWeek(date: Column): Column = weekday(date) + 1

  /** F8: ISO dow → Spanish short weekday label
    * (ref `earnings_by_day_of_week.sql:1-9`). */
  def spanishDow(isoDow: Column): Column =
    when(isoDow === 1, "Lun")
      .when(isoDow === 2, "Mar")
      .when(isoDow === 3, "Mié")
      .when(isoDow === 4, "Jue")
      .when(isoDow === 5, "Vie")
      .when(isoDow === 6, "Sáb")
      .when(isoDow === 7, "Dom")

  /** O2: the dashboards' Sunday-first display rank
    * (ref `earningsByDayOfWeek.py:153-162`). */
  def sundayFirstRank(isoDow: Column): Column =
    when(isoDow === 7, 1).otherwise(isoDow + 1)

  /** F12: time-unit deduction from range length — same thresholds as
    * `needle.py:7-23` (0 / ≤7 / ≤15 / ≤30 / ≤90 / else). */
  def deduceTimeUnit(startDate: String, endDate: String): String = {
    val delta = ChronoUnit.DAYS.between(
      LocalDate.parse(startDate), LocalDate.parse(endDate))
    if (delta == 0) "day"
    else if (delta <= 7) "week"
    else if (delta <= 15) "biweek"
    else if (delta <= 30) "month"
    else if (delta <= 90) "quarter"
    else "year"
  }

  /** F5: Presto `DATE_ADD(unit, -n, d)` for the prior-period comparison
    * (ref `needle.py:113-118`): day→-1d, week→-7d, biweek→-14d,
    * month→-1mo, quarter→-3mo, year→-1y. */
  def periodShift(timeUnit: String, d: Column): Column = timeUnit match {
    case "day" => date_sub(d, 1)
    case "week" => date_sub(d, 7)
    case "biweek" => date_sub(d, 14)
    case "month" => add_months(d, -1)
    case "quarter" => add_months(d, -3)
    case _ => add_months(d, -12)
  }

  /** F9/F13: division with the reference's client-side NaN/∞ guard
    * (`safe_float` `detailedRanking.py:8-19`) folded into the engine:
    * 0/0 and x/0 become 0. */
  def safeDiv(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num / den)

  /** P6: the dynamic locations + user predicate every lambda builds
    * (`filters_main`, ref `earnings.py:51-66`) — typed Columns, so
    * injection-safe by construction; returns None when no filters. */
  def locationsPredicate(locations: Seq[LocationFilter],
      userSelected: Option[String], office: Column, city: Column,
      userId: Column): Option[Column] = {
    val parts =
      locations.flatMap { l =>
        l.officeName.map(office === _).orElse(l.cityName.map(city === _))
      } ++ userSelected.map(userId === _)
    parts.reduceOption(_ || _)
  }
}
