package graft

import graft.etl.{IndexCompaction, IndexDeleteSync, LshIndex, ManifestTable, MinhashIndex, TextIndex}
import graft.streaming.ContinuousIngest
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Deletion maintenance end to end: docs deleted from the corpus must
  * stop existing in the MinHash / BM25 / LSH indexes — no ghost
  * candidates in probes, BM25 stats shrunk to the surviving corpus,
  * idempotent under replay, and degrading to live-set reconciliation
  * when the CDC bookmark's diff window has been vacuumed away. */
class IndexDeleteSpec extends SparkSpec {
  import spark.implicits._

  private val day = java.sql.Date.valueOf("2024-01-15")
  private def words(tag: String, n: Int) =
    (1 to n).map(k => s"${tag}_$k").mkString(" ")
  private def emb(id: Long): Array[Float] =
    Array.tabulate(8)(k => ((id * 31 + k * 7) % 13 - 6).toFloat)
  private def doc(id: Long) =
    (id, words(s"d$id", 16), "en", "srcA", 16L, day, emb(id))
  private def frame(ids: Seq[Long]) =
    ids.map(doc).toDF("doc_id", "text", "lang", "source", "n_chars",
      "doc_date", "embedding")

  private def dropFamily(names: Seq[String]): Unit =
    names.flatMap(n => Seq(s"${n}_banded", s"${n}_shingles", s"${n}_sizes",
      s"${n}_postings", s"${n}_doclens", s"${n}_stats",
      s"${n}_buckets", s"${n}_vectors", s"${n}_meta"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def ids(table: String, idCol: String): Set[Long] =
    spark.table(table).select(col(idCol)).distinct()
      .collect().map(_.getLong(0)).toSet

  private def ivfIds(path: String): Set[Long] =
    spark.read.parquet(path).select(col("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet

  test("corpus deletes propagate to all four index families via the CDC sync") {
    val corpus = Files.createTempDirectory("idel").toString + "/corpus"
    val (mh, ti, ann) = ("idel_mh", "idel_ti", "idel_ann")
    val ivf = Files.createTempDirectory("idel_ivf").toString + "/index"
    val keys = Seq("doc_id", "doc_date")
    val bookmark = corpus + "/_index_delete_bookmark"
    def applyAll(ds: IndexCompaction.DeleteSet): Unit = {
      MinhashIndex.compact(spark, mh, Some(ds))
      TextIndex.compact(spark, ti, Some(ds))
      LshIndex.compact(spark, ann, Some(ds))
      graft.operators.IvfIndex.compactIndexDir(spark, ivf, Some(ds))
    }
    try {
      ManifestTable.mergeInto(spark, frame(1L to 10L), corpus, keys, "doc_date")
      val docs = ManifestTable.read(spark, corpus)
      MinhashIndex.build(spark, docs, mh)
      TextIndex.build(spark, docs, ti)
      LshIndex.build(spark, docs.select($"doc_id".as("vec_id"), $"embedding"),
        ann, dims = 8)
      graft.operators.IvfIndex.buildIndexDir(spark,
        docs.select($"doc_id".as("vec_id"), $"embedding"), ivf, k = 4, iters = 2)

      // ---- first sync: no bookmark yet → RECONCILE mode. Docs 1,2 were
      // deleted BEFORE the bookmark ever existed — the CDC window can't
      // know them, the live-set sweep must.
      assert(ManifestTable.deleteWhere(spark, corpus,
        $"doc_id".isin(1L, 2L)) == 2L)
      val r1 = IndexDeleteSync.sync(spark, corpus, bookmark, keys)(applyAll)
      assert(r1.exists(_.mode == "reconcile"), s"expected reconcile, got $r1")
      val live1 = (3L to 10L).toSet
      assert(ids(s"${mh}_sizes", "doc_id") == live1)
      assert(ids(s"${mh}_banded", "doc_id") == live1)
      assert(ids(s"${mh}_shingles", "doc_id") == live1)
      assert(ids(s"${ti}_postings", "doc_id") == live1)
      assert(ids(s"${ti}_doclens", "doc_id") == live1)
      assert(ids(s"${ann}_vectors", "vec_id") == live1)
      assert(ids(s"${ann}_buckets", "vec_id") == live1)
      assert(ivfIds(ivf) == live1, "IVF lists must shed the reconciled ghosts")

      // ---- second round: bookmark in place → CDC mode
      assert(ManifestTable.deleteWhere(spark, corpus, $"doc_id" === 3L) == 1L)
      val r2 = IndexDeleteSync.sync(spark, corpus, bookmark, keys)(applyAll)
      assert(r2.exists(r => r.mode == "cdc" && r.deleteRows == 1L),
        s"expected cdc with 1 delete, got $r2")
      val live2 = (4L to 10L).toSet
      assert(ids(s"${mh}_sizes", "doc_id") == live2)
      assert(ids(s"${ti}_doclens", "doc_id") == live2)
      assert(ids(s"${ann}_vectors", "vec_id") == live2)
      assert(ivfIds(ivf) == live2, "IVF lists must shed the CDC-deleted doc")

      // no ghost candidates: a byte-copy of deleted doc 3 probes clean,
      // while a copy of live doc 4 still hits
      val probe = frame(Seq(3L)).withColumn("doc_id", lit(300L))
      assert(MinhashIndex.incrementalPairs(spark, probe, mh).isEmpty,
        "probe must not surface candidates from deleted docs")
      val probeLive = frame(Seq(4L)).withColumn("doc_id", lit(400L))
      assert(!MinhashIndex.incrementalPairs(spark, probeLive, mh).isEmpty,
        "live docs must still be probe-visible")

      // BM25: deleted doc's tokens retrieve nothing; stats shrank to the
      // live corpus (doc count AND the served scores match a fresh build)
      assert(TextIndex.search(spark, ti, Seq("d3_1", "d3_7")).isEmpty)
      val stats = spark.table(s"${ti}_stats").collect().head
      assert(stats.getAs[Long]("n_docs") == live2.size.toLong,
        "BM25 n_docs must reflect the surviving corpus")
      TextIndex.build(spark, ManifestTable.read(spark, corpus), "idel_ti_rb")
      val terms = Seq("d4_1", "d9_3", "d10_16")
      assert(TextIndex.search(spark, ti, terms).collect().map(_.toSeq).toSet ==
        TextIndex.search(spark, "idel_ti_rb", terms).collect().map(_.toSeq).toSet,
        "served BM25 must be bit-identical to a rebuild over the live corpus")

      // ANN: deleted ids never appear as neighbors
      val q = frame(Seq(42L)).select($"doc_id".as("vec_id"), $"embedding")
      val neighbors = LshIndex.search(spark, q, ann, topK = 10)
        .select($"neighbor_id").collect().map(_.getLong(0)).toSet
      assert(neighbors.intersect(Set(1L, 2L, 3L)).isEmpty,
        s"deleted ids surfaced as ANN neighbors: $neighbors")
      val ivfNeighbors = graft.operators.IvfIndex.searchIndexDirAuto(spark,
        ivf, q, topK = 10, nprobe = 4)
        .select($"neighbor_id").collect().map(_.getLong(0)).toSet
      assert(ivfNeighbors.intersect(Set(1L, 2L, 3L)).isEmpty,
        s"deleted ids surfaced as IVF neighbors: $ivfNeighbors")
      // and a retrain PRESERVES the purge: it folds from the purged
      // lists, so ghosts cannot resurrect (forced via minK growth)
      assert(graft.operators.IvfIndex.retrainIndexDir(spark, ivf,
        iters = 2, minK = 8))
      assert(ivfIds(ivf) == live2, "retrain must not resurrect deleted docs")

      // ---- replay: no version advance → no-op
      assert(IndexDeleteSync.sync(spark, corpus, bookmark, keys)(applyAll).isEmpty)

      // ---- a merge-only advance (no deletes): bookmark moves, families
      // untouched (apply never called)
      ManifestTable.mergeInto(spark, frame(Seq(20L)), corpus, keys, "doc_date")
      var applied = false
      assert(IndexDeleteSync.sync(spark, corpus, bookmark, keys)(_ => applied = true).isEmpty)
      assert(!applied, "an insert-only window must not trigger any fold")

      // ---- vacuumed bookmark → degrade to RECONCILE, not a throw.
      // Churn versions past retention, then vacuum the bookmark away.
      assert(ManifestTable.deleteWhere(spark, corpus, $"doc_id" === 4L) == 1L)
      ManifestTable.mergeInto(spark, frame(Seq(21L)), corpus, keys, "doc_date")
      ManifestTable.vacuum(spark, corpus, retainVersions = 1)
      // index the still-live late arrivals so reconcile's retain set
      // matches what should survive (20,21 were never indexed — retain
      // would not add them; only REMOVALS are the sync's job, so index
      // the new docs first, as ContinuousIngest would have)
      val late = ManifestTable.read(spark, corpus)
        .filter($"doc_id".isin(20L, 21L))
      MinhashIndex.append(spark, late, mh, "late")
      TextIndex.append(spark, late, ti, "late")
      LshIndex.append(spark, late.select($"doc_id".as("vec_id"), $"embedding"),
        ann, "late")
      graft.operators.IvfIndex.appendIndexDir(spark,
        late.select($"doc_id".as("vec_id"), $"embedding"), ivf, "late")
      val r3 = IndexDeleteSync.sync(spark, corpus, bookmark, keys)(applyAll)
      assert(r3.exists(_.mode == "reconcile"),
        s"vacuumed bookmark must degrade to reconcile, got $r3")
      val live3 = (5L to 10L).toSet + 20L + 21L
      assert(ids(s"${mh}_sizes", "doc_id") == live3)
      assert(ids(s"${ti}_doclens", "doc_id") == live3)
      assert(ids(s"${ann}_vectors", "vec_id") == live3)
      assert(ivfIds(ivf) == live3,
        "IVF reconcile must sweep ghosts and keep late-indexed arrivals")

      // rebuild equivalence after all the churn: the maintained MinHash
      // index equals a from-scratch build over the live corpus
      MinhashIndex.build(spark, ManifestTable.read(spark, corpus), "idel_mh_rb")
      def rows(table: String, cols: String*): Set[Seq[Any]] =
        spark.table(table).select(cols.map(col): _*).collect().map(_.toSeq).toSet
      assert(rows(s"${mh}_sizes", "doc_id", "n_sh") ==
        rows("idel_mh_rb_sizes", "doc_id", "n_sh"))
      assert(rows(s"${mh}_banded", "doc_id", "band", "bucket") ==
        rows("idel_mh_rb_banded", "doc_id", "band", "bucket"))
    } finally dropFamily(Seq(mh, ti, ann, "idel_ti_rb", "idel_mh_rb"))
  }

  test("a merge-on-read corpus delete rides the same maintenance feed") {
    // deleteWhereMoR commits only tuples (no partition rewrite); the
    // next maintain's compaction folds them into the corpus AND its CDC
    // window reports them, so the index purge needs nothing new
    val corpus = Files.createTempDirectory("idel_mor").toString + "/corpus"
    val mh = "idelmor_mh"
    val keys = Seq("doc_id", "doc_date")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh)
    try {
      ManifestTable.mergeInto(spark, frame(1L to 8L), corpus, keys, "doc_date")
      MinhashIndex.build(spark, ManifestTable.read(spark, corpus), mh)
      ContinuousIngest.maintain(spark, cfg) // establish the bookmark
      assert(ManifestTable.deleteWhereMoR(spark, corpus,
        $"doc_id".isin(2L, 5L), keys) == 2L)
      // corpus reads exclude immediately; the index still has ghosts
      assert(ManifestTable.read(spark, corpus).count() == 6L)
      assert(ids(s"${mh}_sizes", "doc_id") == (1L to 8L).toSet)
      ContinuousIngest.maintain(spark, cfg)
      val live = Set(1L, 3L, 4L, 6L, 7L, 8L)
      assert(ids(s"${mh}_sizes", "doc_id") == live,
        "the MoR delete must reach the index through the same CDC feed")
      assert(ids(s"${mh}_banded", "doc_id") == live)
      assert(ManifestTable.currentSnapshot(spark, corpus).get.deletes.isEmpty,
        "maintain's compaction is the fold — tuples retired")
      assert(ManifestTable.read(spark, corpus).count() == 6L)
    } finally dropFamily(Seq(mh))
  }

  test("ContinuousIngest.maintain applies corpus deletes during its compaction pass") {
    val corpus = Files.createTempDirectory("idel_ci").toString + "/corpus"
    val (mh, ti, ann) = ("idelci_mh", "idelci_ti", "idelci_ann")
    val ivf = Files.createTempDirectory("idelci_ivf").toString + "/index"
    val keys = Seq("doc_id", "doc_date")
    val ck = "idelci_ck"
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      textIndexName = Some(ti), annIndexName = Some(ann), annDims = 8,
      ivfIndexPath = Some(ivf), chunkIndexName = Some(ck))
    def chunkDocs(path: String): Set[Long] =
      spark.table(s"${ck}_vectors")
        .select((col("vec_id") / graft.operators.SimilarityOps.ChunkIdSpan)
          .cast("long").as("d"))
        .distinct().collect().map(_.getLong(0)).toSet
    try {
      ManifestTable.mergeInto(spark, frame(1L to 8L), corpus, keys, "doc_date")
      val docs = ManifestTable.read(spark, corpus)
      MinhashIndex.build(spark, docs, mh)
      TextIndex.build(spark, docs, ti)
      LshIndex.build(spark, docs.select($"doc_id".as("vec_id"), $"embedding"),
        ann, dims = 8)
      graft.operators.IvfIndex.buildIndexDir(spark,
        docs.select($"doc_id".as("vec_id"), $"embedding"), ivf, k = 8, iters = 2)
      LshIndex.build(spark,
        graft.operators.SimilarityOps.chunkIndexFrame(spark, docs, 8),
        ck, dims = 8)
      // establish the bookmark (first maintain reconciles — no deletes yet)
      ContinuousIngest.maintain(spark, cfg)
      assert(ids(s"${mh}_sizes", "doc_id") == (1L to 8L).toSet)

      // a compliance delete lands between maintenance runs; the next
      // maintain's compaction must sweep the ghosts from every family
      assert(ManifestTable.deleteWhere(spark, corpus,
        $"doc_id".isin(2L, 5L)) == 2L)
      ContinuousIngest.maintain(spark, cfg)
      val live = Set(1L, 3L, 4L, 6L, 7L, 8L)
      assert(ids(s"${mh}_sizes", "doc_id") == live)
      assert(ids(s"${mh}_banded", "doc_id") == live)
      assert(ids(s"${ti}_postings", "doc_id") == live)
      assert(ids(s"${ann}_buckets", "vec_id") == live)
      assert(ivfIds(ivf) == live,
        "maintain's delete feed must reach the IVF lists too")
      assert(chunkDocs(ck) == live,
        "the DOC-level delete feed must translate to the chunk index's " +
          "composite ids and purge every deleted doc's chunks")
      assert(spark.table(s"${ti}_stats").collect().head
        .getAs[Long]("n_docs") == live.size.toLong)

      // maintain again with nothing new: a stable no-op
      ContinuousIngest.maintain(spark, cfg)
      assert(ids(s"${mh}_sizes", "doc_id") == live)
      assert(ivfIds(ivf) == live)
      assert(chunkDocs(ck) == live)
    } finally {
      dropFamily(Seq(mh, ti, ann))
      LshIndex.dropAll(spark, "idelci_ck")
    }
  }
}
