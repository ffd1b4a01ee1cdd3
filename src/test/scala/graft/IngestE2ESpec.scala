package graft

import graft.streaming.IngestE2E
import org.apache.spark.sql.functions._

/** Structural assertions over the DECLARED end-to-end ingest query
  * (`s25_ingest_e2e`) — the oracle hash-checks the per-date rollup;
  * this spec pins the three merge-path facts the rollup's values derive
  * from, by reading the published table directly at sf0.001:
  *
  *  - every PLANTED byte-copy (ids ≥ 10,000,000) was dropped by the
  *    persisted-index probe — none reached the table;
  *  - every UPDATED re-arrival was UPSERTED: the key holds exactly one
  *    row carrying the +1000 `n_chars` and the ` upd<id>` text suffix;
  *  - the WAP merge published exactly one version per non-empty batch
  *    (a rejected or double-staged batch shifts the version count).
  */
class IngestE2ESpec extends SparkSpec {
  import spark.implicits._

  test("planted dups dropped, updates upserted, one published version per batch") {
    val dir = "/root/testdata/sf0.001"
    val rollup = IngestE2E.ingestE2E(spark, dir).collect()
    assert(rollup.nonEmpty && rollup.map(_.getLong(1)).sum > 0,
      "the published table must not be empty")

    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val corpus =
      s"${sys.props("java.io.tmpdir")}/graft_stream/ie_$safe/corpus"
    val table = graft.etl.ManifestTable.read(spark, corpus)
      .select($"doc_id", $"n_chars", $"text").cache()
    try {
      // planted byte-copies must have been dropped by the index probe
      val planted = table.filter($"doc_id" >= 10000000L).count()
      assert(planted == 0, s"$planted planted dup(s) leaked past the probe")

      // updated keys: exactly one row each, carrying the update payload
      val updatedIds = graft.core.T(spark, dir, "documents")
        .select($"doc_id".cast("long").as("doc_id"))
        .filter($"doc_id" % 3 === 0 && $"doc_id" % 10 === 3)
        .collect().map(_.getLong(0)).toSet
      assert(updatedIds.nonEmpty, "fixture must contain update keys")
      val updRows = table.filter($"doc_id".isin(updatedIds.toSeq: _*))
        .collect()
      assert(updRows.map(_.getLong(0)).toSet == updatedIds,
        "every updated key must be present")
      // the toSet comparison alone would collapse a duplicated key (an
      // insert-instead-of-update regression) — pin row count too
      assert(updRows.length == updatedIds.size,
        s"updated keys must be unique: ${updRows.length} rows for " +
          s"${updatedIds.size} keys")
      updRows.foreach { r =>
        assert(r.getString(2).contains(s" upd${r.getLong(0)}"),
          s"doc ${r.getLong(0)} must carry the updated text")
      }

      // WAP published exactly one version per (non-empty) batch
      val versions = graft.etl.ManifestTable.history(spark, corpus).count()
      assert(versions == 3L,
        s"expected 3 published versions (one per batch), saw $versions")
    } finally table.unpersist()
  }
}
