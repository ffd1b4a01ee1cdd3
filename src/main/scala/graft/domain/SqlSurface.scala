package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}

/** M5 — the reference's standalone SQL files runnable via `spark.sql` over
  * registered views (SURVEY §7.2). Presto→Spark dialect translation:
  * `day_of_week(d)` → `weekday(d)+1` (F4), `DATE('lit')` → `DATE 'lit'`,
  * catalog-quoted names → view names. Used by the specs as an independent
  * second implementation to cross-check the DataFrame API.
  */
object SqlSurface {

  def registerViews(spark: SparkSession, t: DomainTables): Unit = {
    t.users.createOrReplaceTempView("bronze_users")
    t.jasminPerf.createOrReplaceTempView("silver_jasmin_model_performance")
    t.streamatePerf.createOrReplaceTempView("silver_streamate_model_performance")
    t.earningsByPerformer.createOrReplaceTempView("silver_earnings_by_performer")
  }

  /** `queries/earnings_by_day.sql` (verbatim semantics, Spark dialect). */
  def earningsByDay(spark: SparkSession, startDate: String, endDate: String,
      city: String, office: String, artisticName: String): DataFrame = {
    validDate(startDate); validDate(endDate)
    spark.sql(s"""
      SELECT eap.date,
             SUM(CAST(eap.payableamount AS DOUBLE)) AS totalAmount
      FROM silver_earnings_by_performer eap
      INNER JOIN bronze_users us
        ON (eap.emailaddress = us.streamateuser OR eap.emailaddress = us.jasminuser)
      WHERE CAST(eap.date AS DATE) BETWEEN DATE'$startDate' AND DATE'$endDate'
        AND us.city = '${sq(city)}'
        AND us.office = '${sq(office)}'
        AND us.artisticname = '${sq(artisticName)}'
      GROUP BY eap.date
      ORDER BY eap.date""")
  }

  /** `queries/earnings_by_day_of_week.sql` — Monday-first ASC order;
    * `day_of_week` translated per SURVEY §7.4.1. */
  def earningsByDayOfWeek(spark: SparkSession, startDate: String,
      endDate: String): DataFrame = {
    validDate(startDate); validDate(endDate)
    spark.sql(s"""
      SELECT CASE
               WHEN weekday(CAST(eap.date AS DATE)) + 1 = 1 THEN 'Lun'
               WHEN weekday(CAST(eap.date AS DATE)) + 1 = 2 THEN 'Mar'
               WHEN weekday(CAST(eap.date AS DATE)) + 1 = 3 THEN 'Mié'
               WHEN weekday(CAST(eap.date AS DATE)) + 1 = 4 THEN 'Jue'
               WHEN weekday(CAST(eap.date AS DATE)) + 1 = 5 THEN 'Vie'
               WHEN weekday(CAST(eap.date AS DATE)) + 1 = 6 THEN 'Sáb'
               WHEN weekday(CAST(eap.date AS DATE)) + 1 = 7 THEN 'Dom'
             END AS DOW,
             ROUND(SUM(CAST(eap.payableamount AS DOUBLE)), 2) AS TOTAL,
             ROUND((SUM(CAST(eap.payableamount AS DOUBLE)) /
               (SELECT SUM(CAST(i.payableamount AS DOUBLE))
                FROM silver_earnings_by_performer i
                INNER JOIN bronze_users ui
                  ON (i.emailaddress = ui.streamateuser OR i.emailaddress = ui.jasminuser)
                WHERE CAST(i.date AS DATE) BETWEEN DATE'$startDate' AND DATE'$endDate')
               ) * 100, 2) AS percentage
      FROM silver_earnings_by_performer eap
      INNER JOIN bronze_users us
        ON (eap.emailaddress = us.streamateuser OR eap.emailaddress = us.jasminuser)
      WHERE CAST(eap.date AS DATE) BETWEEN DATE'$startDate' AND DATE'$endDate'
      GROUP BY weekday(CAST(eap.date AS DATE)) + 1
      ORDER BY weekday(CAST(eap.date AS DATE)) + 1 ASC""")
  }

  /** `src/Athena/weekly_earnings.sql` — Presto WEEK = ISO week =
    * Spark weekofyear (F3). */
  def weeklyEarnings(spark: SparkSession, table: String = "silver_earnings_by_performer"): DataFrame =
    spark.sql(s"""
      SELECT YEAR(CAST(eap.date AS DATE)) AS year,
             weekofyear(CAST(eap.date AS DATE)) AS week,
             SUM(CAST(eap.payableamount AS DOUBLE)) AS totalAmount,
             SUM(CAST(eap.onlineseconds AS DOUBLE)) AS totalSeconds
      FROM $table eap
      GROUP BY YEAR(CAST(eap.date AS DATE)), weekofyear(CAST(eap.date AS DATE))""")

  /** Single-quote escape, mirroring `earnings.py:56-63` — defense-in-depth
    * for the SQL path (the DataFrame path needs none by construction). */
  private def sq(s: String): String = s.replace("'", "''")

  /** Date params go inside a `DATE'...'` literal where `sq` can't help —
    * reject anything that isn't a bare ISO date before interpolating. */
  private def validDate(d: String): Unit =
    require(d.matches("\\d{4}-\\d{2}-\\d{2}"),
      s"not an ISO date: '$d' (date parameters are interpolated into a " +
        "DATE literal and must match yyyy-MM-dd exactly)")
}
