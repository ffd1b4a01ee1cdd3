package graft

import graft.etl.ManifestTable
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Merge-on-read equality deletes ([[ManifestTable.deleteWhereMoR]]):
  * a delete commits O(matched keys) of tuple data and flips only the
  * manifest — zero data files rewritten — while every read path
  * (read/readAt/readWhere/changes) returns the logical content, the
  * metadata-aggregate path refuses soundly, and merges/compactions fold
  * pending tuples into the data and retire them. */
class MorDeleteSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("id", "date")

  private def frame(rows: Seq[(String, String, Double)]) =
    rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.select($"id", $"v").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def dataDirs(base: String): Map[String, Long] = {
    val dd = new org.apache.hadoop.fs.Path(base, "data")
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dd).map(st => st.getPath.getName ->
      st.getModificationTime).toMap
  }

  private def seed(base: String): Unit =
    ManifestTable.mergeInto(spark, frame(Seq(
      ("k1", "2023-03-01", 10.0), ("k2", "2023-06-02", 20.0),
      ("k3", "2024-05-02", 30.0), ("k4", "2024-07-04", 40.0))),
      base, keys, "date")

  test("MoR delete: logical removal with ZERO data-file movement") {
    val base = Files.createTempDirectory("mor").toString + "/fact"
    seed(base)
    val before = dataDirs(base)
    val vBefore = ManifestTable.currentSnapshot(spark, base).get

    val n = ManifestTable.deleteWhereMoR(spark, base, $"id" === "k2", keys)
    assert(n == 1L)
    val snap = ManifestTable.currentSnapshot(spark, base).get
    // partition pointers unchanged; one new d-dir holds the tuple
    assert(snap.parts == vBefore.parts,
      "a MoR delete must move no partition pointers")
    assert(snap.deletes.size == 1 && snap.deletes.head.startsWith("d"))
    val after = dataDirs(base)
    assert(before.forall { case (dir, mtime) => after.get(dir).contains(mtime) },
      "existing data dirs must be untouched byte-for-byte")

    // logical content on every read path
    assert(asMap(ManifestTable.read(spark, base)).keySet ==
      Set("k1", "k3", "k4"))
    assert(ManifestTable.readWhere(spark, base, $"id" === "k2").count() == 0L)
    assert(ManifestTable.readWhere(spark, base, $"v" >= 20.0)
      .select($"id").collect().map(_.getString(0)).toSet == Set("k3", "k4"))
    // time travel: the pre-delete version still shows the row
    assert(asMap(ManifestTable.readAt(spark, base, vBefore.version))
      .contains("k2"))
    // deleting an already-pending key is a counted no-op
    assert(ManifestTable.deleteWhereMoR(spark, base, $"id" === "k2", keys) == 0L)
  }

  test("CDC reports MoR deletes the version they commit") {
    val base = Files.createTempDirectory("morc").toString + "/fact"
    seed(base)
    val v1 = ManifestTable.currentSnapshot(spark, base).get.version
    assert(ManifestTable.deleteWhereMoR(spark, base,
      $"id".isin("k1", "k3"), keys) == 2L)
    val v2 = ManifestTable.currentSnapshot(spark, base).get.version
    val diff = ManifestTable.changes(spark, base, v1, v2, keys)
      .select($"change", $"id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(diff == Set("delete" -> "k1", "delete" -> "k3"),
      s"MoR deletes must surface as change='delete' rows, got $diff")
  }

  test("merge folds pending tuples of touched years; re-insert resurrects") {
    val base = Files.createTempDirectory("morm").toString + "/fact"
    seed(base)
    assert(ManifestTable.deleteWhereMoR(spark, base,
      $"id".isin("k1", "k3"), keys) == 2L) // k1 in 2023, k3 in 2024
    // merge touches 2023 only: k1's tuple folds (and k1 re-inserted →
    // resurrected with the NEW value); k3's 2024 tuple must survive
    ManifestTable.mergeInto(spark, frame(Seq(("k1", "2023-03-01", 11.0))),
      base, keys, "date")
    val snap = ManifestTable.currentSnapshot(spark, base).get
    assert(asMap(ManifestTable.read(spark, base)) ==
      Map("k1" -> 11.0, "k2" -> 20.0, "k4" -> 40.0),
      "re-inserted key resurrects; untouched-year delete stays applied")
    assert(snap.deletes.nonEmpty,
      "the untouched year's tuple must still pend")
    // ...and a merge touching 2024 retires the last tuple
    ManifestTable.mergeInto(spark, frame(Seq(("k5", "2024-01-01", 50.0))),
      base, keys, "date")
    val snap2 = ManifestTable.currentSnapshot(spark, base).get
    assert(snap2.deletes.isEmpty, "all tuples consumed after both folds")
    assert(asMap(ManifestTable.read(spark, base)) ==
      Map("k1" -> 11.0, "k2" -> 20.0, "k4" -> 40.0, "k5" -> 50.0))
  }

  test("compaction is the fold: applies tuples, clears the pending set") {
    val base = Files.createTempDirectory("morf").toString + "/fact"
    seed(base)
    assert(ManifestTable.deleteWhereMoR(spark, base, $"v" >= 30.0, keys) == 2L)
    val logical = asMap(ManifestTable.read(spark, base))
    assert(logical.keySet == Set("k1", "k2"))
    ManifestTable.compact(spark, base)
    val snap = ManifestTable.currentSnapshot(spark, base).get
    assert(snap.deletes.isEmpty, "compaction must retire every tuple")
    assert(asMap(ManifestTable.read(spark, base)) == logical,
      "the fold must not change logical content")
    // the folded delete dirs age out of data/ with vacuum, like any
    // superseded version dir
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    assert(!dataDirs(base).keySet.exists(_.startsWith("d")),
      "folded tuple dirs must be vacuumable")
    assert(asMap(ManifestTable.read(spark, base)) == logical)
  }

  test("statsAgg refuses while tuples pend and recovers after the fold") {
    val base = Files.createTempDirectory("mors").toString + "/fact"
    seed(base)
    assert(ManifestTable.statsAgg(spark, base, "v").exists(_.rows == 4L))
    ManifestTable.deleteWhereMoR(spark, base, $"id" === "k1", keys)
    assert(ManifestTable.statsAgg(spark, base, "v").isEmpty,
      "physical stats overstate logical content while tuples pend")
    ManifestTable.compact(spark, base)
    assert(ManifestTable.statsAgg(spark, base, "v").exists(_.rows == 3L),
      "after the fold the stats are exact again")
  }

  test("restore rolls back by pointer: content, CDC inverse, MoR state") {
    val base = Files.createTempDirectory("morr").toString + "/fact"
    seed(base)
    val good = ManifestTable.currentSnapshot(spark, base).get.version
    val goodContent = asMap(ManifestTable.read(spark, base))
    // two bad commits: an overwrite and a MoR delete
    ManifestTable.mergeInto(spark, frame(Seq(("k1", "2023-03-01", 666.0))),
      base, keys, "date")
    ManifestTable.deleteWhereMoR(spark, base, $"id" === "k3", keys)
    val bad = ManifestTable.currentSnapshot(spark, base).get.version
    assert(asMap(ManifestTable.read(spark, base)) ==
      goodContent + ("k1" -> 666.0) - "k3")

    val restored = ManifestTable.restore(spark, base, good)
    assert(restored == bad + 1)
    assert(asMap(ManifestTable.read(spark, base)) == goodContent,
      "restore must return the exact target-version content")
    val snap = ManifestTable.currentSnapshot(spark, base).get
    assert(snap.deletes.isEmpty,
      "restoring to a pre-delete version must drop the pending tuples")
    // the undo is an ordinary CDC event: k1 back to 10.0, k3 re-inserted
    val diff = ManifestTable.changes(spark, base, bad, restored, keys)
      .select($"change", $"id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(diff == Set("update" -> "k1", "insert" -> "k3"),
      s"restore CDC must be the inverse diff, got $diff")
    // history rolls FORWARD: the bad version stays time-travel readable
    assert(asMap(ManifestTable.readAt(spark, base, bad))
      .get("k1").contains(666.0))
    // a restored table keeps merging normally
    ManifestTable.mergeInto(spark, frame(Seq(("k9", "2025-01-01", 90.0))),
      base, keys, "date")
    assert(asMap(ManifestTable.read(spark, base)) ==
      goodContent + ("k9" -> 90.0))
    // restoring a vacuumed version fails loudly
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    intercept[IllegalStateException] {
      ManifestTable.restore(spark, base, good)
    }
  }

  test("vacuum keeps pending delete dirs referenced by retained snapshots") {
    val base = Files.createTempDirectory("morv").toString + "/fact"
    seed(base)
    ManifestTable.deleteWhereMoR(spark, base, $"id" === "k4", keys)
    // burn a version so the delete's commit is not the newest
    ManifestTable.mergeInto(spark, frame(Seq(("k9", "2025-02-02", 90.0))),
      base, keys, "date")
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    assert(asMap(ManifestTable.read(spark, base)).keySet ==
      Set("k1", "k2", "k3", "k9"),
      "a pending (2024) tuple's dir must survive vacuum while referenced")
  }
}
