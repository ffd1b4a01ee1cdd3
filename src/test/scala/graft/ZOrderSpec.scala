package graft

import graft.core.T
import graft.etl.ZOrderLayout
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton key is bit-exact, and the clustered layout
  * measurably prunes file scans on BOTH dimensions where a linear sort
  * prunes only one. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton key matches hand-computed bit interleaves") {
    // x=3 (11b) spreads to 101b=5; y=1 spreads to 1, shifted = 2; 5|2=7
    // x=5 (101b) spreads to 10001b=17; y=0 -> 17
    // x=0, y=3 -> spread(3)=5, <<1 = 10
    // x=65535,y=65535 -> all 32 bits set
    val rows = Seq((3L, 1L), (5L, 0L), (0L, 3L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrderLayout.interleave16($"x", $"y").as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(7L, 17L, 10L, 0xFFFFFFFFL))
  }

  test("morton key is bijective on the 16-bit grid and round-trips exactly") {
    val df = spark.range(0, 4096)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val distinctZ = df.select(ZOrderLayout.interleave16($"x", $"y")).distinct().count()
    assert(distinctZ == 4096, "every (x,y) pair must get a unique key")
    val (dx, dy) = ZOrderLayout.deinterleave16(
      ZOrderLayout.interleave16($"x", $"y"))
    val broken = df.select($"x", $"y", dx.as("rx"), dy.as("ry"))
      .filter($"x" =!= $"rx" || $"y" =!= $"ry")
    assert(broken.isEmpty, "deinterleave must invert interleave exactly")
    // and at the domain edges
    val edges = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L), (32768L, 1L))
      .toDF("x", "y")
    val (ex, ey) = ZOrderLayout.deinterleave16(
      ZOrderLayout.interleave16($"x", $"y"))
    assert(edges.select($"x", $"y", ex.as("rx"), ey.as("ry"))
      .filter($"x" =!= $"rx" || $"y" =!= $"ry").isEmpty)
  }

  test("z-ordered layout prunes both dimensions; linear sort prunes only its own") {
    val line = T(spark, "/root/testdata/sf0.01", "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val tmp = Files.createTempDirectory("zorder").toString
    val zPath = s"$tmp/z"
    val linPath = s"$tmp/linear"
    val nFiles = 16

    // grid-normalize so partkey (0..2000 inclusive) and suppkey (0..100
    // inclusive) carry equal weight in the interleave; maxExclusive is
    // max+1 so the max-valued rows stay inside the 2^8 grid
    ZOrderLayout.writeZOrdered(line,
      ZOrderLayout.gridBucket($"l_partkey", 2001),
      ZOrderLayout.gridBucket($"l_suppkey", 101),
      zPath, nFiles)
    line.repartitionByRange(nFiles, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(linPath)

    // 1/8-of-domain range filters on each dimension
    val (zPart, zTotal) = ZOrderLayout.candidateFiles(spark, zPath, "l_partkey", 500, 749)
    val (zSupp, _) = ZOrderLayout.candidateFiles(spark, zPath, "l_suppkey", 40, 51)
    val (linPart, linTotal) = ZOrderLayout.candidateFiles(spark, linPath, "l_partkey", 500, 749)
    val (linSupp, _) = ZOrderLayout.candidateFiles(spark, linPath, "l_suppkey", 40, 51)

    assert(zTotal == nFiles && linTotal == nFiles)
    assert(linPart <= 4, s"linear layout must prune its own sort key hard, opened $linPart")
    assert(linSupp == nFiles,
      "a suppkey filter over the partkey-sorted layout must open every file")
    assert(zPart <= 10, s"z-order must prune partkey filters, opened $zPart/$zTotal")
    assert(zSupp <= 10, s"z-order must prune suppkey filters, opened $zSupp/$zTotal")
    assert(zSupp < linSupp,
      "the whole point: the second dimension prunes under z-order, not under linear sort")

    // layout is a pure reorder: same rows either way
    val a = spark.read.parquet(zPath).agg(count(lit(1)), sum($"l_orderkey")).head()
    val b = spark.read.parquet(linPath).agg(count(lit(1)), sum($"l_orderkey")).head()
    assert(a == b)
  }

  test("events fact z-ordered by (day, user): time-sorted layouts can't prune user filters") {
    // THE canonical lakehouse case: an event log everyone queries by
    // time ranges AND by user. Time-sorted files prune only time.
    val ev = graft.operators.EventOps.events(spark, "/root/testdata/sf0.01")
      .select($"event_id", $"user_id",
        datediff($"ts", to_date(lit("2024-01-01"))).cast("long").as("day"))
    val tmp = Files.createTempDirectory("zorder_ev").toString
    val zPath = s"$tmp/z"
    val linPath = s"$tmp/by_time"
    val nFiles = 16

    ZOrderLayout.writeZOrdered(ev,
      ZOrderLayout.gridBucket($"day", 30),
      ZOrderLayout.gridBucket($"user_id", 150),
      zPath, nFiles)
    ev.repartitionByRange(nFiles, $"day")
      .sortWithinPartitions($"day")
      .write.mode("overwrite").parquet(linPath)

    // ~4-day window and ~1/8 user slice
    val (zDay, zTotal) = ZOrderLayout.candidateFiles(spark, zPath, "day", 10, 13)
    val (zUser, _) = ZOrderLayout.candidateFiles(spark, zPath, "user_id", 40, 57)
    val (linDay, _) = ZOrderLayout.candidateFiles(spark, linPath, "day", 10, 13)
    val (linUser, _) = ZOrderLayout.candidateFiles(spark, linPath, "user_id", 40, 57)
    assert(zTotal == nFiles)
    assert(linDay <= 4, s"time-sorted layout must prune time filters, opened $linDay")
    assert(linUser == nFiles, "user filter over time-sorted files opens everything")
    assert(zDay <= 10 && zUser <= 10,
      s"z-order must prune BOTH dims: day $zDay/$zTotal, user $zUser/$zTotal")
  }
}
