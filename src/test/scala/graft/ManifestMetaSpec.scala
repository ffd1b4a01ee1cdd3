package graft

import graft.etl.ManifestTable
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Metadata tables + timestamp time travel: `history` and `filesMeta`
  * must describe the table from listings alone, and `readAsOf` must
  * resolve instants the way a reader at that instant saw the table. */
class ManifestMetaSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, String, Double)]) =
    rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))

  test("history/filesMeta describe versions and live files; readAsOf resolves instants") {
    val base = Files.createTempDirectory("manifest_meta").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")
    Thread.sleep(5) // commit mtimes must be distinguishable
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 11.0), ("k2", "2024-05-02", 20.0))),
      base, keys, "date")
    Thread.sleep(5)
    ManifestTable.mergeInto(spark,
      frame(Seq(("k3", "2024-07-04", 30.0))), base, keys, "date")

    // history: one row per version, times nondecreasing, shapes right
    val hist = ManifestTable.history(spark, base)
      .orderBy($"version").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val times = hist.map(_.getTimestamp(1).getTime).toSeq
    assert(times == times.sorted, "commit times must be nondecreasing")
    assert(hist.map(_.getInt(2)).toSeq == Seq(1, 2, 2),
      "partition counts per version (2023; 2023+2024; carried)")
    // v3 touched only 2024: exactly one dir carries the v3 prefix
    assert(hist.last.getInt(3) == 1,
      "v3 must have rewritten exactly the touched partition")
    assert(hist.forall(_.getLong(5) == 3L), "schema cols recorded per version")

    // filesMeta: exactly the live snapshot's parquet files, bytes > 0
    val files = ManifestTable.filesMeta(spark, base).collect()
    assert(files.nonEmpty && files.forall(_.getLong(3) > 0L))
    val live = ManifestTable.currentSnapshot(spark, base).get.parts
    assert(files.map(r => (r.getInt(0), r.getString(1))).toSet ==
      live.map { case (y, d) => (y, d) }.toSet,
      "files rows must cover exactly the live (year, dir) set")
    assert(files.forall(_.getString(2).endsWith(".parquet")))

    // readAsOf: each commit instant resolves to that version's state
    def vAt(i: Int) = ManifestTable.readAsOf(spark, base,
      new java.sql.Timestamp(times(i))).count()
    assert(vAt(0) == 1L && vAt(1) == 2L && vAt(2) == 3L)
    // an instant between commits resolves to the earlier version
    assert(ManifestTable.readAsOf(spark, base,
      new java.sql.Timestamp(times(2) - 1)).count() >= 2L)
    // before the table existed: loud error
    intercept[IllegalStateException] {
      ManifestTable.readAsOf(spark, base, new java.sql.Timestamp(times(0) - 1000))
    }
    // far future resolves to the head
    assert(ManifestTable.readAsOf(spark, base,
      new java.sql.Timestamp(times(2) + 60000)).count() == 3L)
  }

  test("vacuumOlderThan expires by age: tags and the head survive, expired history is gone") {
    val base = Files.createTempDirectory("manifest_age").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")
    Thread.sleep(5)
    ManifestTable.mergeInto(spark,
      frame(Seq(("k2", "2024-05-02", 20.0))), base, keys, "date")
    Thread.sleep(5)
    ManifestTable.mergeInto(spark,
      frame(Seq(("k3", "2024-07-04", 30.0))), base, keys, "date")
    val times = ManifestTable.history(spark, base).orderBy($"version")
      .collect().map(_.getTimestamp(1).getTime)

    // cutoff between v1 and v2: v1 expires, v2/v3 stay time-travelable
    ManifestTable.vacuumOlderThan(spark, base,
      new java.sql.Timestamp(times(1) - 1))
    assert(ManifestTable.versions(spark, base) == Seq(2, 3),
      "versions at or before the cutoff must expire")
    assert(ManifestTable.readAt(spark, base, 2).count() == 2L)
    assert(ManifestTable.read(spark, base).count() == 3L)

    // a tag pins an old version through age expiry
    ManifestTable.tag(spark, base, "pinned", Some(2))
    ManifestTable.vacuumOlderThan(spark, base,
      new java.sql.Timestamp(times(2) - 1))
    assert(ManifestTable.versions(spark, base) == Seq(2, 3),
      "a tagged version must survive age expiry")
    assert(ManifestTable.readTag(spark, base, "pinned").count() == 2L)

    // everything old + far-future cutoff: the HEAD is never expired
    assert(ManifestTable.dropTag(spark, base, "pinned"))
    ManifestTable.vacuumOlderThan(spark, base,
      new java.sql.Timestamp(System.currentTimeMillis() + 3600000))
    assert(ManifestTable.versions(spark, base) == Seq(3),
      "the head must survive any cutoff")
    assert(ManifestTable.read(spark, base).count() == 3L)
  }
}
