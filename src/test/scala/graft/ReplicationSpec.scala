package graft

import graft.etl.ManifestTable
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Table replication on the engine's own primitives
  * ([[ManifestTable.applyChanges]]): a replica consuming the primary's
  * CDC feed version window by version window converges to the
  * primary's content after EVERY kind of primary operation — merges,
  * copy-on-write deletes, merge-on-read deletes, and a restore (whose
  * inverse diff replays like any other change). Each sync costs
  * O(changed rows): upserts via the OCC merge, deletes via one MoR
  * tuple commit on the replica. */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("id", "date")

  private def frame(rows: Seq[(String, String, Double)]) =
    rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.select($"id", $"v").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("a replica consuming the CDC feed converges through every operation") {
    val primary = Files.createTempDirectory("repl_p").toString + "/fact"
    val replica = Files.createTempDirectory("repl_r").toString + "/fact"

    def sync(from: Int, to: Int): Unit =
      ManifestTable.applyChanges(spark, replica,
        ManifestTable.changes(spark, primary, from, to, keys), keys, "date")
    def converged(step: String): Unit =
      assert(asMap(ManifestTable.read(spark, replica)) ==
        asMap(ManifestTable.read(spark, primary)),
        s"replica diverged after $step")

    // v1: initial load → full feed of inserts
    ManifestTable.mergeInto(spark, frame(Seq(
      ("k1", "2023-03-01", 10.0), ("k2", "2023-06-02", 20.0),
      ("k3", "2024-05-02", 30.0), ("k4", "2024-07-04", 40.0))),
      primary, keys, "date")
    sync(0, 1); converged("initial load")

    // v2: update + insert
    ManifestTable.mergeInto(spark, frame(Seq(
      ("k1", "2023-03-01", 11.0), ("k5", "2025-01-01", 50.0))),
      primary, keys, "date")
    sync(1, 2); converged("merge")

    // v3: copy-on-write delete
    assert(ManifestTable.deleteWhere(spark, primary, $"id" === "k2") == 1L)
    sync(2, 3); converged("CoW delete")

    // v4: merge-on-read delete — the replica's apply is also MoR
    assert(ManifestTable.deleteWhereMoR(spark, primary,
      $"id" === "k3", keys) == 1L)
    sync(3, 4); converged("MoR delete")
    assert(ManifestTable.currentSnapshot(spark, replica).get.deletes.nonEmpty,
      "the replica's delete arm must be tuple-based, not a rewrite")

    // v5: restore the primary to v2 — the inverse diff replays normally
    val v5 = ManifestTable.restore(spark, primary, 2)
    sync(4, v5); converged("restore")
    assert(asMap(ManifestTable.read(spark, replica)).keySet ==
      Set("k1", "k2", "k3", "k4", "k5"))

    // a catch-up sync spanning several versions at once also converges
    val replica2 = Files.createTempDirectory("repl_r2").toString + "/fact"
    ManifestTable.applyChanges(spark, replica2,
      ManifestTable.changes(spark, primary, 0, v5, keys), keys, "date")
    assert(asMap(ManifestTable.read(spark, replica2)) ==
      asMap(ManifestTable.read(spark, primary)),
      "one wide-window sync must equal the stepwise replica")
  }
}
