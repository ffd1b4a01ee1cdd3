package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze→silver refinement of the nested studio feed — SURVEY §2.9 E1,
  * §3.2.
  *
  * The reference's Glue job collects the whole feed to the driver and
  * flattens it with nested Python loops
  * (`silver_ingest_streamate_mock.py:46-86`) — a scalability bug by its
  * own admission. Here both outputs are pure explode pipelines: fully
  * distributed, one Catalyst plan each, no driver materialization. The
  * exploded studios level is shared by both outputs (cache it when
  * materializing both).
  *
  * Feed shape (`api/streamate.json:1-38`):
  * studios[] → {studioId, emailAddress, earnings[], performers[] →
  * {performerId, nickname, emailAddress, earnings[]}}.
  */
object SilverFlatten {

  /** studios[].earnings[] → silver_studios_earnings
    * (ref output `silver_ingest_streamate_mock.py:57-63`). */
  def studioEarnings(feed: DataFrame): DataFrame =
    feed
      .select(explode(col("studios")).as("s"))
      .select(
        col("s.studioId").as("studioId"),
        col("s.emailAddress").as("emailAddress"),
        explode(col("s.earnings")).as("e"))
      .select(
        col("studioId"), col("emailAddress"),
        col("e.date").as("date"),
        col("e.payableAmount").as("payableAmount"))

  /** studios[].performers[].earnings[] → performer-level rows
    * (ref `silver_ingest_streamate_mock.py:66-82`). */
  def performerEarnings(feed: DataFrame): DataFrame =
    feed
      .select(explode(col("studios")).as("s"))
      .select(explode(col("s.performers")).as("p"))
      .select(
        col("p.performerId").as("performerId"),
        col("p.nickname").as("nickname"),
        col("p.emailAddress").as("emailAddress"),
        explode(col("p.earnings")).as("e"))
      .select(
        col("performerId"), col("nickname"), col("emailAddress"),
        col("e.date").as("date"),
        col("e.onlineSeconds").as("onlineSeconds"),
        col("e.payableAmount").as("payableAmount"))

  /** Performer rows enriched with the users dimension `_id` via
    * left-outer join on the streamate account email (J3,
    * ref `silver_ingest_streamate_mock.py:89-90`). */
  def performerEarningsWithUser(feed: DataFrame, users: DataFrame): DataFrame =
    performerEarnings(feed)
      .join(
        broadcast(users.select(
          col("_id"), col("streamateuser"))),
        col("emailAddress") === col("streamateuser"),
        "left_outer")
      .drop("streamateuser")

  /** Full silver job: both outputs from one shared exploded scan.
    * `format="json"` reproduces the reference's silver zone byte-format
    * (S7, `write_dynamic_frame ... format="json"`
    * `silver_ingest_streamate_mock.py:99-111`); parquet (default) is the
    * scale-correct choice (SURVEY §1.3: columnar everywhere, JSON only
    * as an ingest/egress format). */
  def run(spark: SparkSession, feed: DataFrame, users: DataFrame,
      outDir: String, format: String = "parquet"): Unit = {
    val cached = feed.cache()
    studioEarnings(cached)
      .write.mode("overwrite").format(format)
      .save(s"$outDir/silver_studios_earnings")
    performerEarningsWithUser(cached, users)
      .write.mode("overwrite").format(format)
      .save(s"$outDir/silver_earnings_by_performer")
    cached.unpersist()
  }
}
