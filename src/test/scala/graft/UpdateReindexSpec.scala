package graft

import graft.etl.{IndexCompaction, IndexDeleteSync, ManifestTable, MinhashIndex, TextIndex}
import graft.streaming.ContinuousIngest
import org.apache.spark.sql.functions._

/** The UPDATE-REINDEX protocol in isolation — the machinery behind
  * `s28_ingest_update_reindex`: an updated doc otherwise keeps BOTH
  * generations' rows in the MinHash index under one id (ghost matches
  * for copies of the retired text, double-counted intersections). The
  * sync purges the superseded generation during the fold and re-appends
  * the current version exactly-once; the fold PROTECTS the reindex
  * partition from its own Remove set, which is what makes every crash
  * window replay to convergence — including the nastiest one (crash
  * after the reindex append committed, before the bookmark advanced),
  * where an unprotected replay would purge the replacement it just
  * wrote and the exactly-once append would refuse to restore it. */
class UpdateReindexSpec extends SparkSpec {
  import spark.implicits._

  private def freshNames(): (String, String, String) = {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    (java.nio.file.Files.createTempDirectory(s"urx_$tag").toString + "/corpus",
      s"urx_idx_$tag",
      java.nio.file.Files.createTempDirectory(s"urxb_$tag").toString + "/bm")
  }

  private def docs(ids: Seq[Long], suffix: Long => String) =
    ids.map(i => (i, s"alpha bravo charlie d$i e$i f$i${suffix(i)}",
      java.sql.Date.valueOf("2024-03-01")))
      .toDF("doc_id", "text", "doc_date")

  private def generations(idx: String, id: Long): Long =
    spark.table(s"${idx}_sizes").filter(col("doc_id") === id).count()

  test("pendingFull: updates-only window yields a reindex set; empty window advances") {
    val (corpus, _, bookmark) = freshNames()
    val keys = Seq("doc_id", "doc_date")
    ManifestTable.mergeInto(spark, docs(1L to 10L, _ => ""), corpus, keys, "doc_date")
    val v1 = ManifestTable.currentSnapshot(spark, corpus).get.version
    IndexDeleteSync.advance(spark, bookmark, v1)
    // updates only — no deletes — must still surface as a SyncSet
    ManifestTable.mergeInto(spark,
      docs(Seq(5L, 10L), i => s" upd$i"), corpus, keys, "doc_date")
    val ss = IndexDeleteSync.pendingFull(spark, corpus, bookmark, keys).get
    assert(ss.deletes.isEmpty, "no deletes in this window")
    val reidx = ss.reindex.get.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(reidx == Set(5L, 10L))
    assert(ss.reindex.get.filter($"doc_id" === 5L).head.getAs[String]("text")
      .endsWith("upd5"), "reindex rows must carry the CURRENT content")
    // the bookmark must NOT have advanced (the caller applies first)
    assert(IndexDeleteSync.pendingFull(spark, corpus, bookmark, keys).isDefined)
    IndexDeleteSync.advance(spark, bookmark, ss.toVersion)
    assert(IndexDeleteSync.pendingFull(spark, corpus, bookmark, keys).isEmpty)
  }

  test("purge+reindex leaves ONE current generation and survives every crash-window replay") {
    val (corpus, idx, bookmark) = freshNames()
    val keys = Seq("doc_id", "doc_date")
    val base = docs(1L to 10L, _ => "")
    ManifestTable.mergeInto(spark, base, corpus, keys, "doc_date")
    MinhashIndex.build(spark, base, idx)
    IndexDeleteSync.advance(spark, bookmark,
      ManifestTable.currentSnapshot(spark, corpus).get.version)
    // the updates merge AND append (the per-batch pipeline legs) — the
    // index now holds BOTH generations under the updated ids
    val upd = docs(Seq(3L, 7L), i => s" upd$i")
    ManifestTable.mergeInto(spark, upd, corpus, keys, "doc_date")
    MinhashIndex.append(spark, upd, idx, "b1")
    assert(generations(idx, 3L) == 2, "both generations present pre-sync")

    val ss = IndexDeleteSync.pendingFull(spark, corpus, bookmark, keys).get
    val reidxId = s"reidx-v${ss.toVersion}"
    val updIds = ss.reindex.get.select($"doc_id").distinct()
    def applyMinhashLeg(): Unit = {
      MinhashIndex.compact(spark, idx,
        Some(IndexCompaction.Remove(updIds)), protect = Some(reidxId))
      MinhashIndex.append(spark, ss.reindex.get, idx, reidxId)
    }
    // crash window A: fold ran, append did not — replay converges
    MinhashIndex.compact(spark, idx,
      Some(IndexCompaction.Remove(updIds)), protect = Some(reidxId))
    assert(generations(idx, 3L) == 0, "fold purged both stale generations")
    applyMinhashLeg()
    assert(generations(idx, 3L) == 1, "exactly the current generation")
    // the surviving rows are the NEW text's: a probe with the OLD text
    // finds nothing, a probe with the NEW text matches
    val oldProbe = MinhashIndex.incrementalPairs(spark,
      docs(Seq(3L), _ => "").withColumn("doc_id", lit(333L)), idx, 1.0)
    assert(oldProbe.count() == 0, "superseded text must not ghost-match")
    val newProbe = MinhashIndex.incrementalPairs(spark,
      docs(Seq(3L), i => s" upd$i").withColumn("doc_id", lit(333L)), idx, 1.0)
    assert(newProbe.count() == 1, "current text must match the reindexed rows")

    // crash window B (the protect fact): append committed, bookmark
    // NOT advanced — the replay's fold must not purge the replacement
    applyMinhashLeg()
    assert(generations(idx, 3L) == 1,
      "replay after the append committed must keep the current generation")
    assert(MinhashIndex.incrementalPairs(spark,
      docs(Seq(3L), i => s" upd$i").withColumn("doc_id", lit(333L)), idx, 1.0)
      .count() == 1, "current rows survive the replayed fold")
    IndexDeleteSync.advance(spark, bookmark, ss.toVersion)
    assert(IndexDeleteSync.pendingFull(spark, corpus, bookmark, keys).isEmpty)
  }

  test("insert-then-update within ONE window: the net 'insert' row still reindexes") {
    // the CDC endpoint diff collapses insert+update to a single
    // change='insert' row — pendingFull therefore carries INSERTS as
    // candidates too, and the stale-generation witness (committed
    // count != 1) picks out exactly the ids that actually hold a
    // superseded generation
    val (corpus, idx, bookmark) = freshNames()
    val keys = Seq("doc_id", "doc_date")
    val base = docs(1L to 5L, _ => "")
    ManifestTable.mergeInto(spark, base, corpus, keys, "doc_date")
    MinhashIndex.build(spark, base, idx)
    IndexDeleteSync.advance(spark, bookmark,
      ManifestTable.currentSnapshot(spark, corpus).get.version)
    // window: id 42 INSERTED (gen 1 indexed) then UPDATED (gen 2 indexed)
    val ins = docs(Seq(42L), _ => " genone")
    ManifestTable.mergeInto(spark, ins, corpus, keys, "doc_date")
    MinhashIndex.append(spark, ins, idx, "b1")
    val upd = docs(Seq(42L), _ => " gentwo")
    ManifestTable.mergeInto(spark, upd, corpus, keys, "doc_date")
    MinhashIndex.append(spark, upd, idx, "b2")
    assert(generations(idx, 42L) == 2)

    val ss = IndexDeleteSync.pendingFull(spark, corpus, bookmark, keys).get
    val cand = ss.reindex.get
    assert(cand.filter($"doc_id" === 42L).head.getAs[String]("text")
      .endsWith("gentwo"), "the net-insert row must carry the CURRENT content")
    // the witness: 42 is stale (2 committed generations); a plain
    // single-generation doc in the candidates would NOT be
    val stale = MinhashIndex.staleGenerationIds(spark, idx,
      cand.select($"doc_id")).collect().map(_.getLong(0)).toSet
    assert(stale == Set(42L))
    val reidxId = s"reidx-v${ss.toVersion}"
    MinhashIndex.compact(spark, idx,
      Some(IndexCompaction.Remove(cand.select($"doc_id")
        .join(stale.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi"))),
      protect = Some(reidxId))
    MinhashIndex.append(spark, cand.join(stale.toSeq.toDF("doc_id"),
      Seq("doc_id"), "left_semi"), idx, reidxId)
    assert(generations(idx, 42L) == 1, "exactly the current generation")
    assert(MinhashIndex.incrementalPairs(spark,
      docs(Seq(42L), _ => " genone").withColumn("doc_id", lit(333L)), idx, 1.0)
      .count() == 0, "the within-window superseded generation must be purged")
    assert(MinhashIndex.incrementalPairs(spark,
      docs(Seq(42L), _ => " gentwo").withColumn("doc_id", lit(333L)), idx, 1.0)
      .count() == 1, "the current generation must match")
  }

  // --- cross-family crash windows: the replay decision is PER FAMILY ---
  // A crash between the MinHash leg and the TextIndex leg previously
  // stranded the BM25 index: the shared MinHash-only witness reported
  // "healthy" once the MinHash re-append committed, so the replay
  // computed reindex=None and the text index either kept both
  // generations forever (crash before its compact) or permanently lost
  // the updated docs (crash between its compact and its append). Each
  // family now intersects the CDC candidates with a witness from its
  // OWN per-doc table + batch log.

  private def crossFamilyFixture(): (ContinuousIngest.Config, String) = {
    val (corpus, idx, _) = freshNames()
    val txt = s"${idx}_txt"
    val keys = Seq("doc_id", "doc_date")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = idx,
      textIndexName = Some(txt))
    val base = docs(1L to 10L, _ => "")
    ManifestTable.mergeInto(spark, base, corpus, keys, "doc_date")
    MinhashIndex.build(spark, base, idx)
    TextIndex.build(spark, base, txt)
    IndexDeleteSync.advance(spark, ContinuousIngest.deleteBookmarkPath(cfg),
      ManifestTable.currentSnapshot(spark, corpus).get.version)
    // per-batch legs: the update merged and appended to BOTH families,
    // so both hold two generations under the updated ids
    val upd = docs(Seq(3L, 7L), i => s" upd$i")
    ManifestTable.mergeInto(spark, upd, corpus, keys, "doc_date")
    MinhashIndex.append(spark, upd, idx, "b1")
    TextIndex.append(spark, upd, txt, "b1")
    assert(generations(idx, 3L) == 2)
    assert(doclenGenerations(txt, 3L) == 2)
    (cfg, txt)
  }

  private def doclenGenerations(txt: String, id: Long): Long =
    spark.table(s"${txt}_doclens").filter(col("doc_id") === id).count()

  /** Replays the first maintenance attempt's MinHash leg to completion
    * (purge + committed reindex append), exactly the state a crash
    * right before the TextIndex leg leaves behind. Returns the reindex
    * batch id and the candidate frame the attempt computed. */
  private def runMinhashLegOnly(cfg: ContinuousIngest.Config)
      : (String, org.apache.spark.sql.DataFrame) = {
    val ss = IndexDeleteSync.pendingFull(spark, cfg.corpusPath,
      ContinuousIngest.deleteBookmarkPath(cfg), cfg.keys).get
    val reidxId = s"reidx-v${ss.toVersion}"
    val updIds = ss.reindex.get.select($"doc_id").distinct()
    MinhashIndex.compact(spark, cfg.indexName,
      Some(IndexCompaction.Remove(updIds)), protect = Some(reidxId))
    MinhashIndex.append(spark, ss.reindex.get, cfg.indexName, reidxId)
    assert(generations(cfg.indexName, 3L) == 1, "MinHash leg committed pre-crash")
    (reidxId, ss.reindex.get)
  }

  test("crash after the MinHash leg committed: replay converges the TextIndex leg") {
    val (cfg, txt) = crossFamilyFixture()
    runMinhashLegOnly(cfg)
    assert(doclenGenerations(txt, 3L) == 2,
      "the text index still holds both generations at the crash point")
    // REPLAY: the full maintenance pass — the MinHash family's own
    // witness now reports healthy, but the text family's must not
    ContinuousIngest.maintain(spark, cfg)
    assert(generations(cfg.indexName, 3L) == 1)
    assert(doclenGenerations(txt, 3L) == 1,
      "replay must purge+reindex the text family independently")
    // the postings hold exactly ONE generation's rows per (token, doc)
    assert(spark.table(s"${txt}_postings")
      .filter($"doc_id" === 3L && $"token" === "d3").count() == 1,
      "superseded postings purged")
    assert(TextIndex.search(spark, txt, Seq("upd3"), topK = 5)
      .filter($"doc_id" === 3L).count() == 1,
      "the current generation serves")
    // converged: the bookmark advanced, nothing pending
    assert(IndexDeleteSync.pendingFull(spark, cfg.corpusPath,
      ContinuousIngest.deleteBookmarkPath(cfg), cfg.keys).isEmpty)
  }

  test("crash between the text purge and the text re-append: replay restores the docs") {
    val (cfg, txt) = crossFamilyFixture()
    val (reidxId, reindexRows) = runMinhashLegOnly(cfg)
    // ...and the text leg's COMPACT also ran (purging both generations)
    // before the crash — the worst window: the docs are GONE from the
    // text index and the MinHash witness says nothing needs doing
    TextIndex.compact(spark, txt,
      Some(IndexCompaction.Remove(reindexRows.select($"doc_id").distinct())),
      protect = Some(reidxId))
    assert(doclenGenerations(txt, 3L) == 0,
      "the text index lost the docs at the crash point")
    ContinuousIngest.maintain(spark, cfg)
    assert(doclenGenerations(txt, 3L) == 1,
      "the per-family witness (zero committed generations) must trigger the re-append")
    assert(TextIndex.search(spark, txt, Seq("upd3"), topK = 5)
      .filter($"doc_id" === 3L).count() == 1)
    assert(generations(cfg.indexName, 3L) == 1, "MinHash family untouched by the replay")
  }

  test("stale witness flags a half-done reindex (zero committed generations)") {
    val (corpus, idx, bookmark) = freshNames()
    val base = docs(1L to 5L, _ => "")
    ManifestTable.mergeInto(spark, base, corpus, Seq("doc_id", "doc_date"), "doc_date")
    MinhashIndex.build(spark, base, idx)
    // simulate: the fold purged doc 3's stale rows, the replacement
    // append crashed UNCOMMITTED (partial partition, no marker) — the
    // witness must treat the orphan rows as absent, or the replay would
    // skip the re-append and the next fold would drop the doc entirely
    MinhashIndex.applyDeletes(spark, idx, Seq(3L).toDF("doc_id"))
    MinhashIndex.writeBucketed(Seq((3L, 5L)).toDF("doc_id", "n_sh"),
      s"${idx}_sizes", 32, append = true, "reidx-v9", "doc_id")
    val stale = MinhashIndex.staleGenerationIds(spark, idx,
      Seq(1L, 3L).toDF("doc_id")).collect().map(_.getLong(0)).toSet
    assert(stale == Set(3L),
      s"uncommitted orphan rows must not count as a healthy generation: $stale")
  }
}
