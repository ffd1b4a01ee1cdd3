package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic domain fixtures (FIXTURES.md; generator parameters from
  * the reference's `src/mocks/streamate_mock.py:16-72`, seeded here —
  * the reference's generator is unseeded `random`, which we fix).
  *
  * Required spread (FIXTURES.md §2-3): users matched only via
  * streamateuser / only via jasminuser / via neither; shared artisticname
  * across _ids; dates crossing a month AND ISO-week/year boundary
  * (2024-12-28..2025-01-05) plus a full September (all 7 weekdays).
  */
object Fixtures {
  private val cities = Seq("Medellín", "Bogotá", "Cali")
  private val offices = Seq("L1", "L2")

  def users(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = (1 to 9).map { i =>
      val name = if (i <= 2) "Zoe Do Santos" else s"Artist $i" // shared name
      (s"u$i", name, cities((i - 1) % 3), offices((i - 1) % 2), s"R$i",
        s"http://pic/$i.jpg", s"sm$i@models1a.com", s"jm$i@models1a.com")
    } ++ Seq(
      ("u10", "Only Streamate", "Medellín", "L1", "R10", "http://pic/10.jpg",
        "sm10@models1a.com", null),
      ("u11", "Only Jasmin", "Bogotá", "L2", "R11", "http://pic/11.jpg",
        null, "jm11@models1a.com"),
      ("u12", "No Accounts", "Cali", "L1", "R12", "http://pic/12.jpg",
        null, null))
    rows.toDF(Schema.usersCols: _*)
  }

  private def amount(rnd: java.util.Random): String = {
    // uniform(1,10) rounded to 2dp, mirroring streamate_mock.py:21
    val v = 1.0 + rnd.nextDouble() * 9.0
    (math.rint(v * 100) / 100).toString
  }

  /** Daily performance records for user ids u1..u9 (+u10 streamate-only /
    * u11 jasmin-only) over Sep 2024 and the 2024→2025 ISO-year boundary. */
  def perf(spark: SparkSession, platform: String, seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val days =
      (1 to 30).map(d => f"2024-09-$d%02d") ++
        Seq("2024-12-28", "2024-12-29", "2024-12-30", "2024-12-31",
          "2025-01-01", "2025-01-02", "2025-01-03", "2025-01-04", "2025-01-05")
    val ids = (1 to 9).map(i => s"u$i") :+
      (if (platform == "streamate") "u10" else "u11")
    val rows = for {
      id <- ids
      day <- days
      if rnd.nextDouble() < 0.8 // gaps: not every model works every day
    } yield (id, day, amount(rnd), rnd.nextInt(10000).toString,
      s"s3://lake/silver/$platform/${id}_$day.json")
    rows.toDF(Schema.perfCols: _*)
  }

  /** silver_earnings_by_performer rows whose emailaddress hits either the
    * streamateuser or jasminuser side of the OR-join (J2). */
  def earningsByPerformer(spark: SparkSession, seed: Long = 7L): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val emails = (1 to 9).flatMap(i =>
      Seq(s"sm$i@models1a.com", s"jm$i@models1a.com")) ++
      Seq("sm10@models1a.com", "jm11@models1a.com", "ghost@models1a.com")
    val days = (1 to 30).map(d => f"2024-09-$d%02d")
    val rows = for {
      (email, pid) <- emails.zipWithIndex
      day <- days
      if rnd.nextDouble() < 0.7
    } yield (pid.toLong.toString, s"nick$pid", email, day,
      rnd.nextInt(10000).toString, amount(rnd), s"u${pid / 2 + 1}")
    rows.toDF(Schema.earningsByPerformerCols: _*)
  }

  def tables(spark: SparkSession): DomainTables = DomainTables(
    users = users(spark),
    jasminPerf = perf(spark, "jasmin", seed = 1L),
    streamatePerf = perf(spark, "streamate", seed = 2L),
    earningsByPerformer = earningsByPerformer(spark))

  // Nested feed fixture — shape from api/streamate.json:1-38, scale
  // parameters from streamate_mock.py:50-52 (5 studios × 3 performers ×
  // 5 earnings each), deterministic seed.
  final case class FeedEarning(date: String, payableAmount: Double)
  final case class PerformerEarning(date: String, onlineSeconds: Long, payableAmount: Double)
  final case class FeedPerformer(performerId: Long, nickname: String,
      emailAddress: String, earnings: Seq[PerformerEarning])
  final case class FeedStudio(studioId: Long, emailAddress: String,
      earnings: Seq[FeedEarning], performers: Seq[FeedPerformer])
  final case class StreamateFeed(studios: Seq[FeedStudio], data_timestamp: Long)

  def streamateFeed(spark: SparkSession, nStudios: Int = 5,
      nPerformers: Int = 3, nEarnings: Int = 5, seed: Long = 11L): StreamateFeed = {
    val rnd = new java.util.Random(seed)
    def day(): String = f"2024-09-${1 + rnd.nextInt(28)}%02d"
    def amt(): Double = math.rint((1.0 + rnd.nextDouble() * 9.0) * 100) / 100
    val studios = (1 to nStudios).map { s =>
      FeedStudio(
        studioId = s.toLong,
        emailAddress = s"studio$s@models1a.com",
        earnings = (1 to nEarnings).map(_ => FeedEarning(day(), amt())),
        performers = (1 to nPerformers).map { p =>
          FeedPerformer(
            performerId = s.toLong * 1000 + p,
            nickname = s"nick${s}_$p",
            emailAddress = if (s == 1 && p == 1) "sm1@models1a.com"
              else s"perf${s}_$p@models1a.com",
            earnings = (1 to nEarnings).map(_ =>
              PerformerEarning(day(), rnd.nextInt(10000).toLong, amt())))
        })
    }
    StreamateFeed(studios, data_timestamp = 1725148800L)
  }

  def feedDF(spark: SparkSession, feed: StreamateFeed): DataFrame = {
    import spark.implicits._
    Seq(feed).toDF()
  }
}
