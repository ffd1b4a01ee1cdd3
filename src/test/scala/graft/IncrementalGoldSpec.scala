package graft

import graft.etl.{IncrementalGold, LakeLayout}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bookmark-driven gold refresh: prunes to new partitions, matches a
  * full recompute after every increment, and is idempotent. */
class IncrementalGoldSpec extends SparkSpec {
  import spark.implicits._

  private def goldAgg(df: DataFrame): DataFrame =
    df.groupBy($"user", $"day")
      .agg(count(lit(1)).as("n_events"), sum($"amount").as("total"))

  test("refresh processes only new partitions and equals a full recompute") {
    val root = Files.createTempDirectory("inc_gold").toString
    val bronze = s"$root/bronze"
    val gold = s"$root/gold"
    val bm = s"$root/bookmark"
    def rows(day: String, usr: Seq[(String, Long)]) =
      usr.map { case (u, a) => (u, java.sql.Date.valueOf(day), a) }
        .toDF("user", "day", "amount")
    // day 1 + day 2 land
    rows("2024-01-01", Seq(("u1", 10L), ("u1", 5L), ("u2", 7L)))
      .unionAll(rows("2024-01-02", Seq(("u1", 1L))))
      .write.partitionBy("day").parquet(bronze)
    val r1 = IncrementalGold.refresh(spark, bronze, gold, bm, "day",
      Seq("user", "day"), goldAgg)
    assert(r1.fromExclusive.isEmpty && r1.newBookmark.contains("2024-01-02"))
    def goldNow() = spark.read.parquet(gold)
      .select($"user", $"day".cast("string"), $"n_events", $"total")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(goldNow() == Set(
      ("u1", "2024-01-01", 2L, 15L), ("u2", "2024-01-01", 1L, 7L),
      ("u1", "2024-01-02", 1L, 1L)))
    // day 3 lands; the delta scan must prune to exactly that partition
    rows("2024-01-03", Seq(("u2", 3L), ("u3", 4L)))
      .withColumn("day", $"day".cast("date"))
      .write.mode("append").partitionBy("day").parquet(bronze)
    val delta = spark.read.parquet(bronze).filter($"day" > lit("2024-01-02"))
    delta.collect()
    assert(LakeLayout.selectedPartitions(delta).head == 1,
      "date predicate must prune the bronze scan to the one new partition")
    val r2 = IncrementalGold.refresh(spark, bronze, gold, bm, "day",
      Seq("user", "day"), goldAgg)
    assert(r2.fromExclusive.contains("2024-01-02")
      && r2.newBookmark.contains("2024-01-03") && r2.rowsUpserted == 2L)
    // gold equals the full recompute
    val full = goldAgg(spark.read.parquet(bronze))
      .select($"user", $"day".cast("string"), $"n_events", $"total")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(goldNow() == full)
    // nothing new -> no-op, bookmark unchanged
    val r3 = IncrementalGold.refresh(spark, bronze, gold, bm, "day",
      Seq("user", "day"), goldAgg)
    assert(r3.rowsUpserted == 0L && r3.newBookmark.contains("2024-01-03"))
    assert(goldNow() == full)
  }

  test("version-bookmark refresh catches the late update a date bookmark misses") {
    val root = Files.createTempDirectory("inc_gold_v").toString
    val bronze = s"$root/bronze"
    val gold = s"$root/gold"
    val bm = s"$root/bookmark"
    val bronzeKeys = Seq("event_id", "day")
    def rows(day: String, evs: Seq[(Long, String, Long)]) =
      evs.map { case (id, u, a) => (id, u, java.sql.Date.valueOf(day), a) }
        .toDF("event_id", "user", "day", "amount")
    def refresh() = IncrementalGold.refreshFromManifest(spark, bronze, gold,
      bm, "day", bronzeKeys, Seq("user", "day"), goldAgg)
    def goldNow() = spark.read.parquet(gold)
      .select($"user", $"day".cast("string"), $"n_events", $"total")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    // v1: two days of events in the bronze manifest table
    graft.etl.ManifestTable.mergeInto(spark,
      rows("2024-01-01", Seq((1L, "u1", 10L), (2L, "u1", 5L), (3L, "u2", 7L)))
        .unionAll(rows("2024-01-02", Seq((4L, "u1", 1L)))),
      bronze, bronzeKeys, "day")
    val r1 = refresh()
    assert(r1.newBookmark.contains("1") && r1.rowsUpserted == 3L)
    assert(goldNow() == Set(
      ("u1", "2024-01-01", 2L, 15L), ("u2", "2024-01-01", 1L, 7L),
      ("u1", "2024-01-02", 1L, 1L)))

    // v2: a LATE UPDATE rewrites an OLD day's event (amount 10 -> 100).
    // `day > bookmark` sees nothing here — the version bookmark must.
    graft.etl.ManifestTable.mergeInto(spark,
      rows("2024-01-01", Seq((1L, "u1", 100L))), bronze, bronzeKeys, "day")
    val r2 = refresh()
    assert(r2.fromExclusive.contains("1") && r2.newBookmark.contains("2"))
    assert(goldNow() == Set(
      ("u1", "2024-01-01", 2L, 105L), // corrected by the late update
      ("u2", "2024-01-01", 1L, 7L),
      ("u1", "2024-01-02", 1L, 1L)),
      "gold must re-aggregate the updated day from its full bronze rows")

    // no new version -> no-op; identical-content merge -> bookmark
    // advances, zero rows re-aggregated
    val r3 = refresh()
    assert(r3.rowsUpserted == 0L && r3.newBookmark.contains("2"))
    graft.etl.ManifestTable.mergeInto(spark,
      rows("2024-01-01", Seq((1L, "u1", 100L))), bronze, bronzeKeys, "day")
    val r4 = refresh()
    assert(r4.rowsUpserted == 0L && r4.newBookmark.contains("3"),
      "identical-content merge must advance the bookmark without work")

    // crash between merge and bookmark: rerun re-processes the same
    // window idempotently (delete the bookmark to simulate the loss)
    new java.io.File(bm).delete()
    val r5 = refresh()
    assert(r5.fromExclusive.isEmpty && goldNow().size == 3,
      "full re-process must converge to the same gold state")
  }

  test("a vacuumed bookmark version degrades to a full re-aggregation, not a throw") {
    // The producer (ContinuousIngest) vacuums with a small retention; a
    // gold consumer refreshing less often than that window finds its
    // bookmarked version gone. That must degrade exactly like a LOST
    // bookmark — full idempotent re-aggregation — not an exception that
    // wedges the consumer until manual intervention.
    val root = Files.createTempDirectory("inc_gold_vac").toString
    val bronze = s"$root/bronze"
    val gold = s"$root/gold"
    val bm = s"$root/bookmark"
    val bronzeKeys = Seq("event_id", "day")
    def rows(day: String, evs: Seq[(Long, String, Long)]) =
      evs.map { case (id, u, a) => (id, u, java.sql.Date.valueOf(day), a) }
        .toDF("event_id", "user", "day", "amount")
    def refresh() = IncrementalGold.refreshFromManifest(spark, bronze, gold,
      bm, "day", bronzeKeys, Seq("user", "day"), goldAgg)
    def goldNow() = spark.read.parquet(gold)
      .select($"user", $"day".cast("string"), $"n_events", $"total")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    graft.etl.ManifestTable.mergeInto(spark,
      rows("2024-01-01", Seq((1L, "u1", 10L))), bronze, bronzeKeys, "day")
    assert(refresh().newBookmark.contains("1")) // bookmark pins v1

    // the producer commits two more versions, then vacuums v1 away
    graft.etl.ManifestTable.mergeInto(spark,
      rows("2024-01-02", Seq((2L, "u2", 20L))), bronze, bronzeKeys, "day")
    graft.etl.ManifestTable.mergeInto(spark,
      rows("2024-01-01", Seq((1L, "u1", 99L))), bronze, bronzeKeys, "day")
    graft.etl.ManifestTable.vacuum(spark, bronze, retainVersions = 1)
    assert(graft.etl.ManifestTable.snapshotAt(spark, bronze, 1).isEmpty,
      "precondition: the bookmarked version must actually be vacuumed")

    val r = refresh()
    assert(r.newBookmark.contains("3"))
    assert(goldNow() == Set(
      ("u1", "2024-01-01", 1L, 99L), ("u2", "2024-01-02", 1L, 20L)),
      "fallback re-aggregation must land the post-vacuum truth, late update included")
    // subsequent refresh is a normal incremental no-op again
    assert(refresh().rowsUpserted == 0L)
  }

  test("gold drops grain groups whose bronze rows were deleted — CDC and degrade paths") {
    val root = Files.createTempDirectory("inc_gold_del").toString
    val bronze = s"$root/bronze"
    val gold = s"$root/gold"
    val bm = s"$root/bookmark"
    val bronzeKeys = Seq("event_id", "day")
    def rows(day: String, evs: Seq[(Long, String, Long)]) =
      evs.map { case (id, u, a) => (id, u, java.sql.Date.valueOf(day), a) }
        .toDF("event_id", "user", "day", "amount")
    def refresh() = IncrementalGold.refreshFromManifest(spark, bronze, gold,
      bm, "day", bronzeKeys, Seq("user", "day"), goldAgg)
    def goldNow() = spark.read.parquet(gold)
      .select($"user", $"day".cast("string"), $"n_events", $"total")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    graft.etl.ManifestTable.mergeInto(spark,
      rows("2024-01-01", Seq((1L, "u1", 10L), (2L, "u2", 7L)))
        .unionAll(rows("2024-01-02", Seq((3L, "u3", 5L)))),
      bronze, bronzeKeys, "day")
    refresh()
    assert(goldNow().size == 3)

    // CDC path: u2's ONLY bronze event is deleted -> the re-aggregated
    // day has no (u2, day) row, and the refresh must REMOVE it from
    // gold, not leave a stale upsert leftover
    assert(graft.etl.ManifestTable.deleteWhere(spark, bronze,
      col("event_id") === 2L) == 1L)
    val r2 = refresh()
    assert(r2.newBookmark.contains("2"))
    assert(goldNow() == Set(
      ("u1", "2024-01-01", 1L, 10L), ("u3", "2024-01-02", 1L, 5L)),
      "a grain group deleted from bronze must disappear from gold")

    // degrade path: delete ALL of day 2, then vacuum the bookmarked
    // version away — the full re-aggregation must REPLACE gold, so the
    // dead date cannot survive (a v0 diff never even lists it)
    assert(graft.etl.ManifestTable.deleteWhere(spark, bronze,
      $"day".cast("string") === "2024-01-02") == 1L)
    graft.etl.ManifestTable.vacuum(spark, bronze, retainVersions = 1)
    assert(graft.etl.ManifestTable.snapshotAt(spark, bronze, 2).isEmpty,
      "precondition: the bookmarked version must actually be vacuumed")
    val r3 = refresh()
    assert(r3.newBookmark.contains("3"))
    assert(goldNow() == Set(("u1", "2024-01-01", 1L, 10L)),
      "the degrade rebuild must drop the fully-deleted date from gold")
  }

  test("date column must be part of the gold grain") {
    val ex = intercept[IllegalArgumentException] {
      IncrementalGold.refresh(spark, "/nope", "/nope2", "/nope3", "day",
        Seq("user"), identity)
    }
    assert(ex.getMessage.contains("idempotent"))
  }
}
