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

  test("date column must be part of the gold grain") {
    val ex = intercept[IllegalArgumentException] {
      IncrementalGold.refresh(spark, "/nope", "/nope2", "/nope3", "day",
        Seq("user"), identity)
    }
    assert(ex.getMessage.contains("idempotent"))
  }
}
