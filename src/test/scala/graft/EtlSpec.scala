package graft

import graft.domain.Fixtures
import graft.etl.{BronzeIngest, SilverFlatten}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** E1 flatten invariants (FIXTURES.md §1) + bronze ingest operators. */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private val S = 5; private val P = 3; private val E = 5
  lazy val feed = Fixtures.streamateFeed(spark, S, P, E)
  lazy val feedDf = Fixtures.feedDF(spark, feed)

  test("flatten yields S·E studio rows and S·P·E performer rows") {
    assert(SilverFlatten.studioEarnings(feedDf).count() == S * E)
    assert(SilverFlatten.performerEarnings(feedDf).count() == S * P * E)
  }

  test("flatten preserves the feed's payable totals (sum invariant)") {
    val expectedStudio = feed.studios.flatMap(_.earnings).map(_.payableAmount).sum
    val expectedPerf =
      feed.studios.flatMap(_.performers).flatMap(_.earnings).map(_.payableAmount).sum
    val gotStudio = SilverFlatten.studioEarnings(feedDf)
      .agg(sum($"payableAmount")).head().getDouble(0)
    val gotPerf = SilverFlatten.performerEarnings(feedDf)
      .agg(sum($"payableAmount")).head().getDouble(0)
    assert(math.abs(gotStudio - expectedStudio) < 1e-9)
    assert(math.abs(gotPerf - expectedPerf) < 1e-9)
  }

  test("performer enrich: matching email gets _id, others null (left outer)") {
    val users = Fixtures.users(spark)
    val out = SilverFlatten.performerEarningsWithUser(feedDf, users)
    assert(out.count() == S * P * E)
    val matched = out.filter($"_id".isNotNull)
    assert(matched.select($"emailAddress").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("sm1@models1a.com"))
    assert(matched.count() == E) // one performer's E earnings rows
  }

  test("bronze: stamp, dedup, duplicate diagnostic, schema-align") {
    val batch = Seq(("a", "2024-09-01", 1.0), ("a", "2024-09-01", 2.0),
      ("b", "2024-09-02", 3.0)).toDF("id", "date", "v")
    val stamped = BronzeIngest.stamp(batch, java.time.LocalDate.of(2024, 9, 3))
    assert(stamped.select($"processing_date").distinct().count() == 1)
    assert(BronzeIngest.duplicateCount(batch, Seq("id", "date")) == 1)
    assert(BronzeIngest.dedup(batch, Seq("id", "date")).count() == 2)
    val newBatch = Seq(("c", "2024-09-03")).toDF("id", "date")
    val aligned = BronzeIngest.alignAndAppend(batch, newBatch)
    assert(aligned.count() == 4 &&
      aligned.filter($"id" === "c").head().isNullAt(2))
  }

  test("bronze JSON ingestion infers the nested feed schema") {
    val json =
      """{"studios":[{"studioId":1,"emailAddress":"s@x.com",
        |"earnings":[{"date":"2024-09-01","payableAmount":5.5}],
        |"performers":[{"performerId":1001,"nickname":"n","emailAddress":"p@x.com",
        |"earnings":[{"date":"2024-09-01","onlineSeconds":120,"payableAmount":2.5}]}]}],
        |"data_timestamp":1725148800}""".stripMargin.replaceAll("\n", "")
    val df = BronzeIngest.fromJsonPayloads(spark, Seq(json))
    assert(SilverFlatten.performerEarnings(df).count() == 1)
    assert(SilverFlatten.studioEarnings(df).head().getAs[Double]("payableAmount") == 5.5)
  }

  test("bronze write is partitioned by processing_date (prunable)") {
    val dir = Files.createTempDirectory("bronze").toString
    val batch = Seq(("a", "2024-09-01", 1.0)).toDF("id", "date", "v")
    BronzeIngest.writeBronze(
      BronzeIngest.stamp(batch, java.time.LocalDate.of(2024, 9, 3)), dir)
    assert(new java.io.File(s"$dir/processing_date=2024-09-03").exists())
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("silver job writes both outputs from one feed") {
    val dir = Files.createTempDirectory("silver").toString
    SilverFlatten.run(spark, feedDf, Fixtures.users(spark), dir)
    assert(spark.read.parquet(s"$dir/silver_studios_earnings").count() == S * E)
    assert(spark.read.parquet(s"$dir/silver_earnings_by_performer").count() == S * P * E)
  }

  test("silver job can emit the reference's JSON byte-format (S7)") {
    val dir = Files.createTempDirectory("silver_json").toString
    SilverFlatten.run(spark, feedDf, Fixtures.users(spark), dir, format = "json")
    val back = spark.read.json(s"$dir/silver_earnings_by_performer")
    assert(back.count() == S * P * E)
    assert(back.columns.contains("payableAmount"))
  }

  test("quarantined ingest diverts unparseable payloads, keeps partial rows as data") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.DoubleType)))
    val payloads = Seq(
      """{"_id": "u1", "amount": 10.5}""",
      """{"_id": "u2"}""",                       // missing field -> data (null)
      """{"_id": "u3", "amount": }""",           // invalid JSON -> quarantine
      """not json at all""")                     // garbage -> quarantine
    val (good, bad) =
      BronzeIngest.fromJsonPayloadsQuarantined(spark, payloads, schema)
    val g = good.collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(g == Map("u1" -> Some(10.5), "u2" -> None))
    val q = bad.collect().map(_.getString(0)).toSet
    assert(q == Set("""{"_id": "u3", "amount": }""", "not json at all"),
      "quarantine must keep the original payload bytes for replay")
  }
}
