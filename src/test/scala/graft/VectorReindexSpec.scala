package graft

import graft.etl.{IndexCompaction, IndexDeleteSync, LshIndex, ManifestTable, MinhashIndex}
import graft.operators.{IvfIndex, SimilarityOps}
import graft.streaming.{ContinuousIngest, IngestE2E}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The EMBEDDING-family update-reindex protocol in isolation — the
  * machinery behind `s29_ingest_vector_reindex`: an updated doc's stale
  * VECTOR otherwise keeps serving ANN probes until the doc is deleted
  * (the one index-staleness class the text-side reindex can't reach,
  * since vectors aren't derivable from the text diff — they ride the
  * CDC rows when the stream feeds an embedding column). Each family
  * makes its replay decision from its OWN stale witness, so every crash
  * window — including cross-family ones — replays to convergence. */
class VectorReindexSpec extends SparkSpec {
  import spark.implicits._

  private val Off = 77000000L

  private def freshNames(): (String, String, String) = {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    (java.nio.file.Files.createTempDirectory(s"vrx_$tag").toString + "/corpus",
      s"vrx_idx_$tag", s"vrx_ann_$tag")
  }

  private def docs(ids: Seq[Long], suffix: Long => String, neg: Boolean) =
    ids.map(i => (i, s"alpha bravo charlie d$i e$i f$i${suffix(i)}",
      java.sql.Date.valueOf("2024-03-01")))
      .toDF("doc_id", "text", "doc_date")
      .withColumn("embedding", IngestE2E.vecExpr(neg))

  private def vecsOf(df: DataFrame) =
    df.select(col("doc_id").as("vec_id"), col("embedding"))

  private def vectorRows(ann: String, id: Long): Long =
    spark.table(s"${ann}_vectors").filter(col("vec_id") === id).count()

  /** Does an ANN probe with doc `id`'s embedding (old or new form) find
    * the doc at cosine >= 0.999? The probe id is offset past the corpus
    * range in the same select that derives the vector FROM THE ORIGINAL
    * id, so the search's self-id filter can't eat the match. */
  private def probeHits(ann: String, id: Long, neg: Boolean): Boolean = {
    val q = Seq(id).toDF("doc_id")
      .select((col("doc_id") + Off).as("vec_id"),
        IngestE2E.vecExpr(neg).as("embedding"))
    LshIndex.search(spark, q, ann, topK = 10)
      .filter(col("cosine_sim") >= 0.999 && col("neighbor_id") === id)
      .count() > 0
  }

  /** Corpus + MinHash + LSH over base docs; updates merged AND appended
    * to both families (the per-batch legs) — both hold two generations
    * under the updated ids at return. */
  private def fixture(): (ContinuousIngest.Config, String) = {
    val (corpus, idx, ann) = freshNames()
    val keys = Seq("doc_id", "doc_date")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = idx,
      annIndexName = Some(ann), annDims = IngestE2E.VecDims)
    val base = docs(1L to 10L, _ => "", neg = false)
    ManifestTable.mergeInto(spark, base, corpus, keys, "doc_date")
    MinhashIndex.build(spark, base, idx)
    LshIndex.build(spark, vecsOf(base), ann, dims = IngestE2E.VecDims)
    IndexDeleteSync.advance(spark, ContinuousIngest.deleteBookmarkPath(cfg),
      ManifestTable.currentSnapshot(spark, corpus).get.version)
    val upd = docs(Seq(3L, 7L), i => s" upd$i", neg = true)
    ManifestTable.mergeInto(spark, upd, corpus, keys, "doc_date")
    MinhashIndex.append(spark, upd, idx, "b1")
    LshIndex.append(spark, vecsOf(upd), ann, "b1")
    assert(vectorRows(ann, 3L) == 2, "both vectors present pre-sync")
    (cfg, ann)
  }

  test("maintenance purges the stale vector; old probe flips MISS, new probe HITS") {
    val (cfg, ann) = fixture()
    // negative control first: BOTH generations serve before maintenance
    assert(probeHits(ann, 3L, neg = false), "stale vector still serves pre-sync")
    assert(probeHits(ann, 3L, neg = true), "current vector serves pre-sync")
    ContinuousIngest.maintain(spark, cfg)
    assert(vectorRows(ann, 3L) == 1, "exactly the current vector remains")
    assert(!probeHits(ann, 3L, neg = false),
      "the OLD embedding must MISS after the purge")
    assert(probeHits(ann, 3L, neg = true),
      "the NEW embedding must HIT the reindexed vector")
    // converged: bookmark advanced, nothing pending
    assert(IndexDeleteSync.pendingFull(spark, cfg.corpusPath,
      ContinuousIngest.deleteBookmarkPath(cfg), cfg.keys).isEmpty)
  }

  test("crash between the vector purge and the re-append: replay restores the doc") {
    val (cfg, ann) = fixture()
    val ss = IndexDeleteSync.pendingFull(spark, cfg.corpusPath,
      ContinuousIngest.deleteBookmarkPath(cfg), cfg.keys).get
    val reidxId = s"reidx-v${ss.toVersion}"
    LshIndex.compact(spark, ann,
      Some(IndexCompaction.Remove(ss.reindex.get.select($"doc_id").distinct())),
      protect = Some(reidxId))
    assert(vectorRows(ann, 3L) == 0, "the vectors are GONE at the crash point")
    ContinuousIngest.maintain(spark, cfg)
    assert(vectorRows(ann, 3L) == 1,
      "the witness (zero committed generations) must trigger the re-append")
    assert(probeHits(ann, 3L, neg = true))
    assert(!probeHits(ann, 3L, neg = false))
  }

  test("crash after the text legs committed: replay converges the vector leg independently") {
    val (cfg, ann) = fixture()
    // the MinHash leg ran to completion pre-crash (its own witness then
    // reports healthy on replay); the ANN leg never started
    val ss = IndexDeleteSync.pendingFull(spark, cfg.corpusPath,
      ContinuousIngest.deleteBookmarkPath(cfg), cfg.keys).get
    val reidxId = s"reidx-v${ss.toVersion}"
    val updIds = ss.reindex.get.select($"doc_id").distinct()
    MinhashIndex.compact(spark, cfg.indexName,
      Some(IndexCompaction.Remove(updIds)), protect = Some(reidxId))
    MinhashIndex.append(spark, ss.reindex.get, cfg.indexName, reidxId)
    assert(vectorRows(ann, 3L) == 2, "vector family untouched at the crash point")
    ContinuousIngest.maintain(spark, cfg)
    assert(vectorRows(ann, 3L) == 1,
      "replay must purge+reindex the vector family independently")
    assert(!probeHits(ann, 3L, neg = false))
    assert(probeHits(ann, 3L, neg = true))
  }

  test("replay after the vector re-append committed keeps the replacement (protect + witness)") {
    val (cfg, ann) = fixture()
    val ss = IndexDeleteSync.pendingFull(spark, cfg.corpusPath,
      ContinuousIngest.deleteBookmarkPath(cfg), cfg.keys).get
    val reidxId = s"reidx-v${ss.toVersion}"
    val updIds = ss.reindex.get.select($"doc_id").distinct()
    // the whole ANN leg ran pre-crash; the bookmark never advanced
    LshIndex.compact(spark, ann,
      Some(IndexCompaction.Remove(updIds)), protect = Some(reidxId))
    LshIndex.append(spark, ss.reindex.get
      .select($"doc_id".as("vec_id"), $"embedding"), ann, reidxId)
    assert(vectorRows(ann, 3L) == 1)
    ContinuousIngest.maintain(spark, cfg)
    assert(vectorRows(ann, 3L) == 1,
      "the replayed fold must not purge the committed replacement")
    assert(probeHits(ann, 3L, neg = true))
    assert(!probeHits(ann, 3L, neg = false))
  }

  test("chunk family: the update re-chunks the NEW text exactly once") {
    val (corpus, idx, _) = freshNames()
    val cn = s"vrx_ch_${java.util.UUID.randomUUID().toString.take(8)}"
    val keys = Seq("doc_id", "doc_date")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = idx,
      chunkIndexName = Some(cn))
    val base = docs(1L to 10L, _ => "", neg = false).drop("embedding")
    ManifestTable.mergeInto(spark, base, corpus, keys, "doc_date")
    MinhashIndex.build(spark, base, idx)
    LshIndex.build(spark,
      SimilarityOps.chunkIndexFrame(spark, base, cfg.chunkDims), cn,
      dims = cfg.chunkDims)
    IndexDeleteSync.advance(spark, ContinuousIngest.deleteBookmarkPath(cfg),
      ManifestTable.currentSnapshot(spark, corpus).get.version)
    val upd = docs(Seq(3L), i => s" upd$i extra tokens beyond the stride " +
      "so the chunk count moves", neg = false).drop("embedding")
    ManifestTable.mergeInto(spark, upd, corpus, keys, "doc_date")
    MinhashIndex.append(spark, upd, idx, "b1")
    LshIndex.append(spark,
      SimilarityOps.chunkIndexFrame(spark, upd, cfg.chunkDims), cn, "b1")
    val span = SimilarityOps.ChunkIdSpan
    def chunkRows(id: Long): Long = spark.table(s"${cn}_vectors")
      .filter(expr(s"vec_id div $span") === id).count()
    def gen0Rows(id: Long): Long = spark.table(s"${cn}_vectors")
      .filter(expr(s"vec_id div $span") === id &&
        expr(s"vec_id % $span = 0")).count()
    assert(gen0Rows(3L) == 2, "both generations' chunk-0 rows pre-sync")
    ContinuousIngest.maintain(spark, cfg)
    assert(gen0Rows(3L) == 1, "exactly one generation after the reindex")
    val expected = SimilarityOps
      .chunkIndexFrame(spark, upd, cfg.chunkDims).count()
    assert(chunkRows(3L) == expected,
      "the stored chunks are exactly the CURRENT text's chunking")
  }

  test("chunk family: crash between the chunk purge and the re-append replays to convergence") {
    val (corpus, idx, _) = freshNames()
    val cn = s"vrx_chc_${java.util.UUID.randomUUID().toString.take(8)}"
    val keys = Seq("doc_id", "doc_date")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = idx,
      chunkIndexName = Some(cn))
    val base = docs(1L to 10L, _ => "", neg = false).drop("embedding")
    ManifestTable.mergeInto(spark, base, corpus, keys, "doc_date")
    MinhashIndex.build(spark, base, idx)
    LshIndex.build(spark,
      SimilarityOps.chunkIndexFrame(spark, base, cfg.chunkDims), cn,
      dims = cfg.chunkDims)
    IndexDeleteSync.advance(spark, ContinuousIngest.deleteBookmarkPath(cfg),
      ManifestTable.currentSnapshot(spark, corpus).get.version)
    val upd = docs(Seq(3L), i => s" upd$i", neg = false).drop("embedding")
    ManifestTable.mergeInto(spark, upd, corpus, keys, "doc_date")
    MinhashIndex.append(spark, upd, idx, "b1")
    LshIndex.append(spark,
      SimilarityOps.chunkIndexFrame(spark, upd, cfg.chunkDims), cn, "b1")
    val span = SimilarityOps.ChunkIdSpan
    def gen0Rows(id: Long): Long = spark.table(s"${cn}_vectors")
      .filter(expr(s"vec_id div $span") === id &&
        expr(s"vec_id % $span = 0")).count()
    assert(gen0Rows(3L) == 2)
    // crash simulation: the chunk purge ran (every stored chunk of the
    // doc removed, reidx partition protected) but the re-append did not
    val ss = IndexDeleteSync.pendingFull(spark, corpus,
      ContinuousIngest.deleteBookmarkPath(cfg), keys).get
    val reidxId = s"reidx-v${ss.toVersion}"
    val chunkIds = spark.table(s"${cn}_vectors")
      .filter(expr(s"vec_id div $span") === 3L).select($"vec_id")
      .localCheckpoint()
    LshIndex.compact(spark, cn, Some(IndexCompaction.Remove(chunkIds)),
      protect = Some(reidxId))
    assert(gen0Rows(3L) == 0, "the doc's chunks are GONE at the crash point")
    ContinuousIngest.maintain(spark, cfg)
    assert(gen0Rows(3L) == 1,
      "the chunk witness (zero chunk-0 rows) must trigger the re-append")
    val expected = SimilarityOps
      .chunkIndexFrame(spark, upd, cfg.chunkDims).count()
    assert(spark.table(s"${cn}_vectors")
      .filter(expr(s"vec_id div $span") === 3L).count() == expected,
      "the restored chunks are exactly the CURRENT text's chunking")
  }

  test("IVF family: crash between the purge and the re-append replays to convergence") {
    val (corpus, idx, _) = freshNames()
    val p = java.nio.file.Files.createTempDirectory("vrx_ivfc").toString + "/ivf"
    val keys = Seq("doc_id", "doc_date")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = idx,
      ivfIndexPath = Some(p), annDims = IngestE2E.VecDims)
    val base = docs(1L to 10L, _ => "", neg = false)
    ManifestTable.mergeInto(spark, base, corpus, keys, "doc_date")
    MinhashIndex.build(spark, base, idx)
    IvfIndex.buildIndexDir(spark, vecsOf(base), p, k = 4)
    IndexDeleteSync.advance(spark, ContinuousIngest.deleteBookmarkPath(cfg),
      ManifestTable.currentSnapshot(spark, corpus).get.version)
    val upd = docs(Seq(3L, 7L), i => s" upd$i", neg = true)
    ManifestTable.mergeInto(spark, upd, corpus, keys, "doc_date")
    MinhashIndex.append(spark, upd, idx, "b1")
    IvfIndex.appendIndexDir(spark, vecsOf(upd), p, "b1")
    def rows(id: Long): Long =
      spark.read.parquet(p).filter(col("vec_id") === id).count()
    assert(rows(3L) == 2)
    // crash simulation: the fold-with-deletes purged BOTH generations,
    // the re-append never ran
    IvfIndex.compactIndexDir(spark, p, Some(IndexCompaction.Remove(
      Seq(3L, 7L).toDF("vec_id"))))
    assert(rows(3L) == 0, "the vectors are GONE at the crash point")
    ContinuousIngest.maintain(spark, cfg)
    assert(rows(3L) == 1,
      "the IVF witness (zero committed rows) must trigger the re-append")
    val q = Seq(3L).toDF("doc_id")
      .select((col("doc_id") + Off).as("vec_id"),
        IngestE2E.vecExpr(neg = true).as("embedding"))
    assert(IvfIndex.searchIndexDirAuto(spark, p, q, topK = 5, nprobe = 4)
      .filter(col("neighbor_id") === 3L && col("cosine_sim") >= 0.999)
      .count() == 1, "the restored vector is the CURRENT generation's")
  }

  test("IVF family: stale vector purged, current re-appended, witness converges") {
    val (corpus, idx, _) = freshNames()
    val p = java.nio.file.Files.createTempDirectory("vrx_ivf").toString + "/ivf"
    val keys = Seq("doc_id", "doc_date")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = idx,
      ivfIndexPath = Some(p), annDims = IngestE2E.VecDims)
    val base = docs(1L to 10L, _ => "", neg = false)
    ManifestTable.mergeInto(spark, base, corpus, keys, "doc_date")
    MinhashIndex.build(spark, base, idx)
    IvfIndex.buildIndexDir(spark, vecsOf(base), p, k = 4)
    IndexDeleteSync.advance(spark, ContinuousIngest.deleteBookmarkPath(cfg),
      ManifestTable.currentSnapshot(spark, corpus).get.version)
    val upd = docs(Seq(3L, 7L), i => s" upd$i", neg = true)
    ManifestTable.mergeInto(spark, upd, corpus, keys, "doc_date")
    MinhashIndex.append(spark, upd, idx, "b1")
    IvfIndex.appendIndexDir(spark, vecsOf(upd), p, "b1")
    def rows(id: Long): Long =
      spark.read.parquet(p).filter(col("vec_id") === id).count()
    assert(rows(3L) == 2, "both vectors present pre-sync")
    assert(IvfIndex.staleGenerationIdsDir(spark, p, Seq(3L, 5L).toDF("doc_id"))
      .collect().map(_.getLong(0)).toSet == Set(3L),
      "the witness flags exactly the multi-generation candidate")
    ContinuousIngest.maintain(spark, cfg)
    assert(rows(3L) == 1, "exactly the current vector remains")
    assert(IvfIndex.staleGenerationIdsDir(spark, p,
      Seq(3L, 7L).toDF("doc_id")).isEmpty, "witness healthy post-sync")
    // the surviving vector is the NEW one: an exact-vector search finds
    // the doc at cosine 1 with the negated embedding
    val q = Seq(3L).toDF("doc_id")
      .select((col("doc_id") + Off).as("vec_id"),
        IngestE2E.vecExpr(neg = true).as("embedding"))
    val hit = IvfIndex.searchIndexDirAuto(spark, p, q, topK = 5, nprobe = 4)
    assert(hit.filter(col("neighbor_id") === 3L &&
      col("cosine_sim") >= 0.999).count() == 1)
  }
}
