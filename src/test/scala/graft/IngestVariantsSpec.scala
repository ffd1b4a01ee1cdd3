package graft

import graft.streaming.IngestE2E
import org.apache.spark.sql.functions._

/** Structural assertions over the two round-16 e2e ingest variants —
  * the oracles hash-check the per-date rollups; these pin the merge-path
  * facts the rollups derive from, by reading the published tables
  * directly at sf0.001:
  *
  *  - `s26_ingest_e2e_fuzzy` (τ = 0.8, exact candidates): the fuzzy
  *    plants land on BOTH sides of the τ boundary — some accepted as
  *    genuinely-new (J = n/(n+8) < 0.8 for short docs), some dropped as
  *    near-dups — so the regime the query exists to pin is actually
  *    exercised; updated keys stay unique.
  *  - `s27_ingest_delete_sync`: deleted docs are gone from the
  *    published table; byte-copies of their texts, arriving AFTER the
  *    maintenance purge, are ACCEPTED; and the NEGATIVE CONTROL — the
  *    identical script without the maintenance leg — rejects exactly
  *    the copies the purge freed (ghost index rows linger between
  *    maintenance runs, the documented conservative behavior).
  */
class IngestVariantsSpec extends SparkSpec {
  import spark.implicits._

  private val Offset = 10000000L
  private def safe(dir: String) = dir.replaceAll("[^A-Za-z0-9]", "_")
  private def corpusOf(tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_stream/ie_${safe(sf0001)}$tag/corpus"

  test("s26: fuzzy plants split across the tau boundary; updated keys unique") {
    val rollup = IngestE2E.ingestE2EFuzzy(spark, sf0001).collect()
    assert(rollup.nonEmpty && rollup.map(_.getLong(1)).sum > 0)
    val table = graft.etl.ManifestTable.read(spark, corpusOf("_fz"))
      .select($"doc_id", $"n_chars", $"text").cache()
    try {
      val planted = graft.core.T(spark, sf0001, "documents")
        .select($"doc_id".cast("long").as("doc_id"))
        .filter($"doc_id" % 3 === 0 && $"doc_id" % 5 === 0)
        .collect().map(_.getLong(0) + Offset).toSet
      assert(planted.nonEmpty, "fixture must contain fuzzy plants")
      val accepted = table.filter($"doc_id" >= Offset)
        .collect().map(_.getLong(0)).toSet
      assert(accepted.subsetOf(planted))
      assert(accepted.nonEmpty,
        "no fuzzy plant was accepted — every J = n/(n+8) cleared τ; the " +
          "fixture no longer exercises the accept side of the boundary")
      assert(accepted != planted,
        "every fuzzy plant was accepted — none was caught as a near-dup; " +
          "the fixture no longer exercises the drop side of the boundary")

      val updatedIds = graft.core.T(spark, sf0001, "documents")
        .select($"doc_id".cast("long").as("doc_id"))
        .filter($"doc_id" % 3 === 0 && $"doc_id" % 10 === 3)
        .collect().map(_.getLong(0)).toSet
      val updRows = table.filter($"doc_id".isin(updatedIds.toSeq: _*)).collect()
      assert(updRows.length == updRows.map(_.getLong(0)).distinct.length,
        "an updated key holds duplicate rows — insert-instead-of-update")
    } finally table.unpersist()
  }

  test("s28: update-reindex frees the OLD text's copies, still rejects the NEW text's") {
    val rollup = IngestE2E.ingestUpdateReindex(spark, sf0001).collect()
    assert(rollup.nonEmpty && rollup.map(_.getLong(1)).sum > 0)
    val updatedIds = graft.core.T(spark, sf0001, "documents")
      .select($"doc_id".cast("long").as("doc_id"))
      .filter($"doc_id" % 3 === 0 && $"doc_id" % 10 === 3)
      .collect().map(_.getLong(0)).toSet
    assert(updatedIds.nonEmpty, "fixture must contain update keys")
    def copies(corpus: String): (Set[Long], Set[Long]) = {
      val t = graft.etl.ManifestTable.read(spark, corpus)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      (t.filter(id => id >= Offset && id < 2 * Offset),
        t.filter(_ >= 2 * Offset))
    }
    val (oldAccepted, newAccepted) = copies(corpusOf("_ur"))
    assert(oldAccepted.nonEmpty,
      "no OLD-text copy was accepted — the superseded generation still " +
        "ghost-matches, so the update-reindex purge did not happen")
    assert(newAccepted.isEmpty,
      s"NEW-text copies ${newAccepted} were accepted — the reindexed " +
        "current generation is missing from the index")

    // negative control: skip the update-reindex maintenance — the
    // superseded generation's ghost rows must reject the old-text copies
    IngestE2E.runIngestUpdateReindex(spark, sf0001,
      s"${sys.props("java.io.tmpdir")}/graft_stream/ie_${safe(sf0001)}_urn",
      "ingest_e2e_" + safe(sf0001).toLowerCase + "_urn", withReindex = false)
    val (oldGhosted, _) = copies(corpusOf("_urn"))
    assert(oldGhosted.subsetOf(oldAccepted))
    assert(oldGhosted != oldAccepted,
      "the no-reindex arm accepted every old-text copy — superseded rows " +
        "rejected nothing, so the declared query no longer witnesses the purge")
  }

  test("s29: vector reindex — old embedding misses, new hits; without it both hit") {
    val res = IngestE2E.ingestVectorReindex(spark, sf0001).collect()
    assert(res.nonEmpty, "fixture must contain gate-passing update keys")
    assert(res.forall(r => r.getLong(1) == 0L && r.getLong(2) == 1L &&
        r.getLong(3) == 0L && r.getLong(4) == 1L),
      s"declared outcome must be (old MISS, new HIT) per doc for BOTH " +
        "vector families: " + res.map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).mkString(", "))
    // negative control: skip the vector-reindex maintenance — the stale
    // vectors still serve their own probes (both old_hit columns flip
    // to 1), proving the declared hash actually witnesses the purge
    val resN = IngestE2E.runIngestVectorReindex(spark, sf0001,
      s"${sys.props("java.io.tmpdir")}/graft_stream/ie_${safe(sf0001)}_vrn",
      "ingest_e2e_" + safe(sf0001).toLowerCase + "_vrn",
      withReindex = false).collect()
    assert(resN.nonEmpty && resN.forall(r =>
      r.getLong(1) == 1L && r.getLong(2) == 1L &&
        r.getLong(3) == 1L && r.getLong(4) == 1L),
      "without the vector reindex BOTH generations must serve in both " +
        "families (old_hit 1, new_hit 1): " +
        resN.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).mkString(", "))
  }

  test("s30: the blind window rejects every shingled old-text copy") {
    val rollup = IngestE2E.ingestBlindWindow(spark, sf0001).collect()
    assert(rollup.nonEmpty && rollup.map(_.getLong(1)).sum > 0)
    val table = graft.etl.ManifestTable.read(spark, corpusOf("_bw"))
      .select($"doc_id", $"text").cache()
    try {
      val updatedIds = graft.core.T(spark, sf0001, "documents")
        .select($"doc_id".cast("long").as("doc_id"))
        .filter($"doc_id" % 3 === 0 && $"doc_id" % 10 === 3)
        .collect().map(_.getLong(0)).toSet
      assert(updatedIds.nonEmpty, "fixture must contain update keys")
      // the updates themselves merged (the ghost generation is of a
      // LIVE doc whose current text moved on)
      val updTexts = table.filter($"doc_id".isin(updatedIds.toSeq: _*))
        .select($"text").collect().map(_.getString(0))
      assert(updTexts.nonEmpty && updTexts.forall(_.contains(" upd")),
        "updated docs must carry the NEW text in the published table")
      // every copy of the OLD text that HAS shingles is rejected against
      // the lingering superseded generation (shingle-less copies have
      // nothing to probe with and pass in every regime — the s27 note)
      val accepted = table.filter($"doc_id" >= Offset)
        .select($"doc_id").collect().map(_.getLong(0) - Offset).toSet
      val shingled = graft.core.T(spark, sf0001, "documents")
        .select($"doc_id".cast("long").as("doc_id"),
          size(split(lower(trim(regexp_replace(
            graft.operators.TextOps.scrubPii($"text"), "\\s+", " "))),
            " ")).as("n_toks"))
        .filter($"doc_id" % 3 === 0 && $"doc_id" % 10 === 3 &&
          $"n_toks" >= 3)
        .collect().map(_.getLong(0)).toSet
      assert(shingled.nonEmpty, "fixture must contain shingled update keys")
      assert(accepted.intersect(shingled).isEmpty,
        s"shingled old-text copies ${accepted.intersect(shingled)} were " +
          "accepted — the ghost generation rejected nothing, so the " +
          "declared blind-window hash no longer witnesses it")
    } finally table.unpersist()
  }

  test("s27: purge frees the deleted texts' copies; without maintenance the ghosts reject them") {
    val rollup = IngestE2E.ingestDeleteSync(spark, sf0001).collect()
    assert(rollup.nonEmpty && rollup.map(_.getLong(1)).sum > 0)
    val deleted = graft.core.T(spark, sf0001, "documents")
      .select($"doc_id".cast("long").as("doc_id"))
      .filter($"doc_id" % 3 === 0 && $"doc_id" % 10 === 6)
      .collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty, "fixture must contain delete keys")

    def copiesIn(corpus: String): Set[Long] = {
      val t = graft.etl.ManifestTable.read(spark, corpus)
      assert(t.filter($"doc_id".isin(deleted.toSeq: _*)).count() == 0,
        "a deleted doc survived in the published table")
      t.filter($"doc_id" >= Offset).select($"doc_id")
        .collect().map(_.getLong(0)).toSet
    }
    val withPurge = copiesIn(corpusOf("_ds"))
    assert(withPurge.nonEmpty,
      "no resurrected copy was accepted after the purge — delete-sync " +
        "left ghost rows, or the copies failed upstream of the probe")

    // negative control: same script, maintenance leg skipped — the
    // ghost rows must reject exactly the copies the purge freed
    // (shingle-less copies pass in both arms: nothing to probe with)
    IngestE2E.runIngestDeleteSync(spark, sf0001,
      s"${sys.props("java.io.tmpdir")}/graft_stream/ie_${safe(sf0001)}_dsn",
      "ingest_e2e_" + safe(sf0001).toLowerCase + "_dsn",
      withMaintenance = false)
    val withGhosts = copiesIn(corpusOf("_dsn"))
    assert(withGhosts.subsetOf(withPurge))
    assert(withGhosts != withPurge,
      "the no-maintenance arm accepted every copy — ghost rows did not " +
        "reject anything, so the declared query no longer witnesses the purge")
  }
}
