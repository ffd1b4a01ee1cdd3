package graft.domain

import org.apache.spark.sql.DataFrame

/** Domain model of the reference lake (SURVEY §1.2).
  *
  * Silver/bronze tables carry ALL columns as strings — the reference's
  * single most important semantic (crawled JSON, cast at query time;
  * SURVEY §1.3). The query layer applies the same query-time CASTs.
  */
object Schema {
  /** bronze_users — ref `detailedRanking.py:90-98`, `queries/earnings_by_day.sql:4-9`. */
  val usersCols = Seq("_id", "artisticname", "city", "office", "room",
    "picture", "streamateuser", "jasminuser")

  /** silver_{jasmin,streamate}_model_performance — ref
    * `ingestStreamateModelPerformance.py:81-84,153`. */
  val perfCols = Seq("_id", "date", "total_earnings", "online_seconds", "file")

  /** silver_earnings_by_performer — ref `silver_ingest_streamate_mock.py:74-82,89-90`. */
  val earningsByPerformerCols = Seq("performerId", "nickname", "emailaddress",
    "date", "onlineseconds", "payableamount", "_id")
}

/** The platform dispatch parameter (SURVEY §2.2 P8). */
sealed trait Platform
object Platform {
  case object Jasmin extends Platform
  case object Streamate extends Platform
}

/** One location filter entry — office OR city (ref `earnings.py:51-60`). */
final case class LocationFilter(officeName: Option[String] = None,
    cityName: Option[String] = None)

/** The dashboard request body all 7 lambdas parse (ref `earnings.py:30-49`). */
final case class EarningsRequest(
    startDate: String,
    endDate: String,
    locations: Seq[LocationFilter] = Nil,
    userSelected: Option[String] = None,
    platform: Option[Platform] = None,
    sortDescending: Boolean = true,
    page: Int = 1,
    limit: Int = 10) {

  /** F11: request validation the lambdas perform before templating SQL
    * (ref `earnings.py:42-49`, `detailedRanking.py:55-73`): ISO dates,
    * start ≤ end, positive paging. Returns the error messages; empty =
    * valid. */
  def validate: Seq[String] = {
    def parse(s: String, name: String): Either[String, java.time.LocalDate] =
      try Right(java.time.LocalDate.parse(s))
      catch { case _: java.time.format.DateTimeParseException =>
        Left(s"Invalid $name format. Use YYYY-MM-DD.") }
    val dates = (parse(startDate, "start_date"), parse(endDate, "end_date")) match {
      case (Right(a), Right(b)) if a.isAfter(b) =>
        Seq("start_date cannot be after end_date.")
      case (a, b) => a.left.toSeq ++ b.left.toSeq
    }
    dates ++
      (if (page < 1) Seq("page must be >= 1") else Nil) ++
      (if (limit < 1) Seq("limit must be >= 1") else Nil)
  }
}

/** One ranking page plus the response metadata the reference wraps around
  * it (`detailedRanking.py:229-236`: `total_results`, `hasMore`). */
final case class RankingPage(
    rows: DataFrame,
    totalResults: Long,
    hasMore: Boolean)

/** The lake's table handles; any source works (parquet zones, views, test
  * fixtures) — the query layer only sees DataFrames. */
final case class DomainTables(
    users: DataFrame,
    jasminPerf: DataFrame,
    streamatePerf: DataFrame,
    earningsByPerformer: DataFrame)
