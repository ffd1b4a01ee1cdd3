package graft

import graft.etl.{BatchLog, LshIndex, ManifestTable, MinhashIndex, TextIndex}
import graft.streaming.ContinuousIngest
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end spec for the composed continuous-ingest pipeline — the
  * round-7 definition of done: N micro-batches through
  * gates→near-dup→merge→index→compact/vacuum with crashes injected at
  * the protocol seams, then corpus AND index asserted equal to a
  * from-scratch batch rebuild.
  *
  * Doc geometry: 16 distinct tokens per doc — passes every gate
  * (n_tokens 16 ≥ 10; top-2gram frac 1/15 ≤ 0.09; dup-token frac 0) —
  * and a one-word edit gives trigram Jaccard 11/17 ≈ 0.65 ≥ the 0.5
  * near-dup threshold, so dup/fresh decisions are unambiguous.
  */
class ContinuousIngestSpec extends SparkSpec {
  import spark.implicits._

  private val idx = "ci_idx"
  private val rebuilt = "ci_rebuild"
  private val day = java.sql.Date.valueOf("2024-01-15")

  private def words(tag: String, n: Int) =
    (1 to n).map(k => s"${tag}_$k").mkString(" ")
  private def doc(id: Long, text: String) =
    (id, text, "en", "srcA", text.length.toLong, day)
  private def frame(rows: Seq[(Long, String, String, String, Long, java.sql.Date)]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars", "doc_date")

  test("continuous ingest: gates, cross-batch dedup, crash seams, rebuild equivalence") {
    val src = Files.createTempDirectory("ci_src").toString + "/data"
    val cp = Files.createTempDirectory("ci_cp").toString
    val corpus = Files.createTempDirectory("ci_corpus").toString + "/corpus"
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = idx,
      compactEvery = 2)

    def corpusIds(): Set[Long] = ManifestTable.read(spark, corpus)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    def indexIds(): Seq[Long] = spark.table(s"${idx}_sizes")
      .select($"doc_id").collect().map(_.getLong(0)).toSeq

    try {
      // ---- batch 1: ten mutually-distinct docs, all accepted; index built
      val batch1 = frame((1L to 10L).map(i => doc(i, words(s"b$i", 16))))
      batch1.write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        ContinuousIngest.start(spark,
          spark.readStream.schema(schema).parquet(src), cp, cfg)
          .awaitTermination()
      }
      run()
      assert(corpusIds() == (1L to 10L).toSet)
      assert(indexIds().sorted == (1L to 10L).toSeq,
        "index holds exactly the accepted docs")

      // ---- batch 2: every rejection path at once
      val fresh = words("f", 16)
      val batch2 = frame(Seq(
        doc(100L, words("b1", 15) + " changed"), // near-dup of corpus doc 1
        doc(101L, fresh),                        // fresh, kept
        doc(102L, fresh.replace("f_16", "altered")), // within-batch near-dup
        doc(103L, words("b2", 16)),              // byte-copy of corpus doc 2
        doc(104L, words("g", 16))))              // fresh, kept
      batch2.write.mode("append").parquet(src)
      run() // batch id 1 → maintenance fires ((1+1) % 2 == 0)
      val after2 = (1L to 10L).toSet + 101L + 104L
      assert(corpusIds() == after2,
        "corpus near-dup, within-batch near-dup and byte-copy all rejected")
      assert(indexIds().sorted == after2.toSeq.sorted,
        "index tracks the corpus exactly, post-compaction")

      // ---- crash seam 1: checkpoint commit lost AFTER all effects —
      // the whole micro-batch replays with the same content; merge must
      // upsert idempotently and the index append must be a logged no-op
      val commits = new java.io.File(cp, "commits")
      val last = commits.listFiles().map(_.getName)
        .filter(_.forall(_.isDigit)).map(_.toInt).max
      assert(new java.io.File(commits, last.toString).delete())
      new java.io.File(commits, s".$last.crc").delete()
      run()
      assert(corpusIds() == after2, "replayed micro-batch is a corpus no-op")
      assert(indexIds().sorted == after2.toSeq.sorted,
        "replayed append must not duplicate index rows")

      // ---- crash seam 2: died between MERGE and INDEX. Simulate the
      // first attempt by hand (merge lands, index append never runs, the
      // stream checkpoint never commits), then let the stream replay the
      // batch: accept decisions recompute identically (the probe reads
      // the INDEX, which the crashed attempt never touched), the merge
      // replays as an idempotent upsert, the append then runs once.
      val batch3 = frame(Seq(
        doc(200L, words("h", 16)),               // fresh, kept
        doc(201L, words("g", 15) + " changed"))) // near-dup of corpus doc 104
      // standalone accepted() pins its gates-internal localCheckpoint;
      // outside ingestBatch (whose finally drops per-batch pins) the
      // caller owns the cleanup — without it the block leaks into the
      // shared spec session and trips every later suite's RDD guard
      val pinnedBeforeAcc3 = spark.sparkContext.getPersistentRDDs.keySet
      val acc3 = ContinuousIngest.accepted(spark, frame(Seq(
        doc(200L, words("h", 16)), doc(201L, words("g", 15) + " changed"))), cfg)
      assert(acc3.select($"doc_id").collect().map(_.getLong(0)).toSet == Set(200L))
      ManifestTable.mergeInto(spark, acc3, corpus, cfg.keys, cfg.dateCol) // then: crash
      (spark.sparkContext.getPersistentRDDs -- pinnedBeforeAcc3.toSeq)
        .values.foreach(_.unpersist(blocking = false))
      batch3.write.mode("append").parquet(src)
      run()
      val after3 = after2 + 200L
      assert(corpusIds() == after3, "merge replay converges, no duplicate rows")
      assert(ManifestTable.read(spark, corpus).count() == after3.size,
        "no (doc_id, doc_date) row duplicated by the double merge")
      assert(indexIds().sorted == after3.toSeq.sorted,
        "index append ran exactly once despite the replayed merge")

      // ---- crash seam 3: died INSIDE a future batch's index append —
      // plant partial rows under the batch id the next micro-batch will
      // use; the append's purge arm must drop them before re-appending.
      val nextBid = s"b${last + 2}" // batch3 replayed as id last+1
      MinhashIndex.writeBucketed(
        Seq((9999L, 1L)).toDF("doc_id", "n_sh"),
        s"${idx}_sizes", nBuckets = 32, append = true, nextBid, "doc_id")
      val batch4 = frame(Seq(doc(300L, words("k", 16))))
      batch4.write.mode("append").parquet(src)
      run()
      val after4 = after3 + 300L
      assert(corpusIds() == after4)
      val finalIdx = indexIds()
      assert(!finalIdx.contains(9999L),
        "partial rows from the crashed append attempt must be purged")
      assert(finalIdx.sorted == after4.toSeq.sorted)

      // ---- from-scratch rebuild equivalence: a batch rebuild of the
      // index over the final corpus must agree with the incrementally
      // maintained one, table for table (modulo the batch_id tag).
      MinhashIndex.build(spark, ManifestTable.read(spark, corpus), rebuilt)
      def rows(table: String, cols: String*): Set[Seq[Any]] =
        spark.table(table).select(cols.map(col): _*)
          .collect().map(_.toSeq).toSet
      assert(rows(s"${idx}_sizes", "doc_id", "n_sh") ==
        rows(s"${rebuilt}_sizes", "doc_id", "n_sh"))
      assert(rows(s"${idx}_banded", "doc_id", "band", "bucket") ==
        rows(s"${rebuilt}_banded", "doc_id", "band", "bucket"))
      assert(rows(s"${idx}_shingles", "doc_id", "shingle") ==
        rows(s"${rebuilt}_shingles", "doc_id", "shingle"))
      // and the maintained index answers a probe exactly like the rebuild
      val probe = frame(Seq(doc(400L, words("b5", 15) + " changed")))
      val viaMaintained = MinhashIndex
        .incrementalPairs(spark, probe, idx)
        .select($"doc_old", $"doc_new").collect().map(_.toSeq).toSet
      val viaRebuild = MinhashIndex
        .incrementalPairs(spark, probe, rebuilt)
        .select($"doc_old", $"doc_new").collect().map(_.toSeq).toSet
      assert(viaMaintained == viaRebuild && viaMaintained.nonEmpty,
        "probe answers must be identical against maintained and rebuilt index")
    } finally {
      Seq(idx, rebuilt).foreach { n =>
        Seq(s"${n}_banded", s"${n}_shingles", s"${n}_sizes", s"${n}_meta")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
    }
  }

  test("sketch leg: per-batch grids, rebuild equivalence, delete subtraction, fold") {
    val src = Files.createTempDirectory("cis_src").toString + "/data"
    val cp = Files.createTempDirectory("cis_cp").toString
    val corpus = Files.createTempDirectory("cis_corpus").toString + "/corpus"
    val (mh, sk, ref) = ("cis_mh", "cis_sk", "cis_ref")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      compactEvery = 2, sketchName = Some(sk))
    val probes = Seq("b1_1", "b3_2", "b9_5", "b11_16", "missing")
    def est(name: String): Map[String, Long] =
      graft.etl.SketchStore.estimate(spark, name, probes).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def refOverCorpus(): Map[String, Long] = {
      graft.etl.SketchStore.build(spark, ManifestTable.read(spark, corpus), ref)
      est(ref)
    }
    try {
      val batch1 = frame((1L to 6L).map(i => doc(i, words(s"b$i", 16))))
      batch1.write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        ContinuousIngest.start(spark,
          spark.readStream.schema(schema).parquet(src), cp, cfg)
          .awaitTermination()
      }
      run() // batch 0: cold build of the sketch
      frame((7L to 12L).map(i => doc(i, words(s"b$i", 16))))
        .write.mode("append").parquet(src)
      run() // batch 1: append leg + maintenance (fold) fires
      // the maintained sketch answers exactly like a fresh grid over the
      // accumulated corpus (cell-wise linearity)
      assert(est(sk) == refOverCorpus(), "maintained sketch drifted from rebuild")
      assert(est(sk)("b9_5") >= 1L && est(sk)("b11_16") >= 1L)
      // maintenance folded the two batch partitions into one grid
      val parts = spark.table(graft.etl.SketchStore.cellsTable(sk))
        .select($"batch_id").distinct().collect().map(_.getString(0)).toSeq
      assert(parts == Seq(BatchLog.BuildId), s"fold left partitions: $parts")
      // corpus deletion propagates as a negative-cell subtraction
      ManifestTable.deleteWhere(spark, corpus, col("doc_id") >= 7L)
      ContinuousIngest.maintain(spark, cfg)
      // the fresh-grid equality IS the deletion contract (point-zero
      // assertions would be hash-collision-dependent)
      val postDelete = est(sk)
      assert(postDelete == refOverCorpus(),
        "post-delete sketch must equal a fresh grid over the survivors")
      assert(postDelete("b1_1") >= 1L, "surviving docs must stay counted")
    } finally {
      (Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta") ++
        Seq(sk, ref).flatMap(n => Seq(s"${n}_cells", s"${n}_meta")))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("multi-index ingest: BM25 and ANN artifacts stay rebuild-equivalent through crashes") {
    val src = Files.createTempDirectory("cim_src").toString + "/data"
    val cp = Files.createTempDirectory("cim_cp").toString
    val corpus = Files.createTempDirectory("cim_corpus").toString + "/corpus"
    val (mh, ti, ann) = ("cim_mh", "cim_ti", "cim_ann")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      compactEvery = 2, textIndexName = Some(ti), annIndexName = Some(ann),
      annDims = 8)
    // deterministic 8-dim embedding per doc id
    def emb(id: Long): Array[Float] =
      Array.tabulate(8)(k => ((id * 31 + k * 7) % 13 - 6).toFloat)
    def docE(id: Long, text: String) =
      (id, text, "en", "srcA", text.length.toLong, day, emb(id))
    def frameE(rows: Seq[(Long, String, String, String, Long, java.sql.Date, Array[Float])]) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars", "doc_date", "embedding")

    try {
      val batch1 = frameE((1L to 10L).map(i => docE(i, words(s"b$i", 16))))
      batch1.write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        ContinuousIngest.start(spark,
          spark.readStream.schema(schema).parquet(src), cp, cfg)
          .awaitTermination()
      }
      run()
      // batch 2: one corpus near-dup (rejected) + two fresh docs, then a
      // crash-replay of the whole micro-batch (checkpoint commit lost
      // AFTER all three index appends — the worst benign seam: every leg
      // must no-op individually on its own batch log)
      val batch2 = frameE(Seq(
        docE(100L, words("b1", 15) + " changed"),
        docE(101L, words("f", 16)),
        docE(102L, words("g", 16))))
      batch2.write.mode("append").parquet(src)
      run() // maintenance fires: all three families compact
      val commits = new java.io.File(cp, "commits")
      val last = commits.listFiles().map(_.getName)
        .filter(_.forall(_.isDigit)).map(_.toInt).max
      assert(new java.io.File(commits, last.toString).delete())
      new java.io.File(commits, s".$last.crc").delete()
      run()
      val expect = (1L to 10L).toSet + 101L + 102L
      val corpusDf = ManifestTable.read(spark, corpus)
      assert(corpusDf.select($"doc_id").collect().map(_.getLong(0)).toSet == expect)

      // BM25: the maintained index must answer EXACTLY like a fresh
      // build over the final corpus — postings, doc lengths, AND the
      // global stats row (doc count, avgdl) all have to agree or the
      // scores drift.
      TextIndex.build(spark, corpusDf, "cim_ti_rb")
      val terms = Seq("b1_1", "f_3", "changed", "g_16")
      val served = TextIndex.search(spark, ti, terms)
        .collect().map(_.toSeq).toSet
      val rebuilt = TextIndex.search(spark, "cim_ti_rb", terms)
        .collect().map(_.toSeq).toSet
      assert(served.nonEmpty && served == rebuilt,
        "BM25 scores must be bit-identical to a from-scratch rebuild")

      // ANN: same for the LSH index (buckets + vectors + plane params).
      LshIndex.build(spark,
        corpusDf.select($"doc_id".as("vec_id"), $"embedding"),
        "cim_ann_rb", dims = 8)
      val queries = frameE(Seq(docE(500L, words("q", 16)), docE(501L, words("r", 16))))
        .select($"doc_id".as("vec_id"), $"embedding")
      val servedAnn = LshIndex.search(spark, queries, ann)
        .collect().map(_.toSeq).toSet
      val rebuiltAnn = LshIndex.search(spark, queries, "cim_ann_rb")
        .collect().map(_.toSeq).toSet
      assert(servedAnn.nonEmpty && servedAnn == rebuiltAnn,
        "ANN results must be identical to a from-scratch rebuild")
    } finally {
      (Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta") ++
        Seq(ti, "cim_ti_rb").flatMap(n =>
          Seq(s"${n}_postings", s"${n}_doclens", s"${n}_stats", s"${n}_meta")) ++
        Seq(ann, "cim_ann_rb").flatMap(n =>
          Seq(s"${n}_buckets", s"${n}_vectors", s"${n}_meta")))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("maintenance regrows the ANN geometry mid-stream; appends and probes follow the flip") {
    val src = Files.createTempDirectory("cir_src").toString + "/data"
    val cp = Files.createTempDirectory("cir_cp").toString
    val corpus = Files.createTempDirectory("cir_corpus").toString + "/corpus"
    val (mh, ann) = ("cir_mh", "cir_ann")
    // occupancy target 1: any corpus past 2^4 vectors outgrows the
    // cold-build default of 4 planes, so the SECOND batch's maintenance
    // (compactEvery = 2) must regrow — the in-stream path of what
    // LshRegrowSpec proves standalone
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      compactEvery = 2, annIndexName = Some(ann), annDims = 8,
      annTargetOccupancy = 1)
    def emb(id: Long): Array[Float] =
      Array.tabulate(8)(k => ((id * 31 + k * 7) % 13 - 6).toFloat)
    def docE(id: Long, text: String) =
      (id, text, "en", "srcA", text.length.toLong, day, emb(id))
    def frameE(rows: Seq[(Long, String, String, String, Long, java.sql.Date, Array[Float])]) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars", "doc_date", "embedding")
    try {
      frameE((1L to 30L).map(i => docE(i, words(s"b$i", 16)))).write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        ContinuousIngest.start(spark,
          spark.readStream.schema(schema).parquet(src), cp, cfg)
          .awaitTermination()
      }
      run() // batch 0: cold build at the default 4 planes
      frameE((31L to 40L).map(i => docE(i, words(s"c$i", 16))))
        .write.mode("append").parquet(src)
      run() // batch 1 + maintenance: compact, then regrow fires
      val meta = graft.etl.IndexMeta.read(spark, ann)
      val planes = meta("planes_per_table").toInt
      assert(meta("generation") == "1", "maintenance must have regrown once")
      assert(planes > 4, s"geometry must have widened, still at $planes")
      assert(LshIndex.exists(spark, ann),
        "the serving generation must resolve after the flip")

      // batch 2 appends AFTER the flip — must land in the new geometry
      frameE((41L to 45L).map(i => docE(i, words(s"d$i", 16))))
        .write.mode("append").parquet(src)
      run()
      val corpusDf = ManifestTable.read(spark, corpus)
      assert(corpusDf.count() == 45)
      // served results == fresh build at the regrown geometry over the
      // final corpus (the rebuild-equivalence bar, at the NEW planes)
      LshIndex.build(spark,
        corpusDf.select($"doc_id".as("vec_id"), $"embedding"),
        "cir_ann_rb", planesPerTable = planes, dims = 8)
      val queries = frameE(Seq(docE(500L, words("q", 16))))
        .select($"doc_id".as("vec_id"), $"embedding")
      val served = LshIndex.search(spark, queries, ann)
        .collect().map(_.toSeq).toSet
      val fresh = LshIndex.search(spark, queries, "cir_ann_rb")
        .collect().map(_.toSeq).toSet
      assert(served.nonEmpty && served == fresh,
        "post-regrow serving must equal a fresh build at the derived geometry")
    } finally {
      Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(ann, "cir_ann_rb").foreach(LshIndex.dropAll(spark, _))
    }
  }

  test("IVF ingest leg: cold build, exactly-once appends, mid-stream retrain, quantizer-consistent serving") {
    import graft.operators.IvfIndex
    val src = Files.createTempDirectory("civ_src").toString + "/data"
    val cp = Files.createTempDirectory("civ_cp").toString
    val corpus = Files.createTempDirectory("civ_corpus").toString + "/corpus"
    val ivf = Files.createTempDirectory("civ_ivf").toString + "/index"
    val mh = "civ_mh"
    // compactEvery = 2: the SECOND batch's maintenance must find the
    // corpus has outgrown the 4-doc cold build's quantizer (autoK(4) = 8
    // floored, but only 4 vectors → 4 trained centroids; 60+ vectors →
    // autoK ≥ 8 ≥ 2×4) and retrain — the in-stream path of what
    // IvfRetrainSpec proves standalone
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      compactEvery = 2, ivfIndexPath = Some(ivf), annDims = 8)
    def emb(id: Long): Array[Float] =
      Array.tabulate(8)(k => ((id * 31 + k * 7) % 13 - 6).toFloat)
    def docE(id: Long, text: String) =
      (id, text, "en", "srcA", text.length.toLong, day, emb(id))
    def frameE(rows: Seq[(Long, String, String, String, Long, java.sql.Date, Array[Float])]) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars", "doc_date", "embedding")
    try {
      frameE((1L to 4L).map(i => docE(i, words(s"b$i", 16)))).write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        ContinuousIngest.start(spark,
          spark.readStream.schema(schema).parquet(src), cp, cfg)
          .awaitTermination()
      }
      run() // batch 0: cold build under the batch's own id
      assert(IvfIndex.existsDir(spark, ivf))
      val kCold = IvfIndex.readCentroids(spark, ivf).count()
      assert(kCold == 4L, s"4-doc cold build trains 4 centroids, got $kCold")

      frameE((5L to 64L).map(i => docE(i, words(s"c$i", 16))))
        .write.mode("append").parquet(src)
      run() // batch 1 + maintenance: the corpus outgrew the quantizer → retrain
      val kGrown = IvfIndex.readCentroids(spark, ivf).count()
      assert(kGrown == IvfIndex.autoK(64L),
        s"maintenance must retrain to autoK(64) = ${IvfIndex.autoK(64L)}, got $kGrown")

      // batch 2 appends AFTER the retrain — the dir-resolved quantizer
      // keeps the append consistent with the swapped lists
      frameE((65L to 70L).map(i => docE(i, words(s"d$i", 16))))
        .write.mode("append").parquet(src)
      run()
      val corpusIds = ManifestTable.read(spark, corpus)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(corpusIds == (1L to 70L).toSet)
      val lists = spark.read.parquet(ivf)
      assert(lists.select($"vec_id").collect().map(_.getLong(0)).toSet == corpusIds,
        "every accepted doc's vector in the lists, exactly the corpus")
      assert(lists.count() == 70L, "exactly once — no replay duplicates")
      // serving consistency: the on-disk probe equals the in-memory
      // probe over (lists, persisted quantizer) — assignment and
      // centroids agree after the cold build, a retrain, and appends
      val queries = frameE(Seq(docE(500L, words("q", 16))))
        .select($"doc_id".as("vec_id"), $"embedding")
      val onDisk = IvfIndex.searchIndexDirAuto(spark, ivf, queries,
        topK = 5, nprobe = 3).collect().toSeq
      val inMem = IvfIndex.search(spark,
        lists.select($"cluster_id", $"vec_id", $"v"),
        IvfIndex.readCentroids(spark, ivf), queries,
        topK = 5, nprobe = 3).collect().toSeq
      assert(onDisk.nonEmpty && onDisk == inMem)
    } finally {
      Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("chunk-index leg: continuous RAG ingestion stays rebuild-equivalent across batches") {
    import graft.operators.SimilarityOps
    val src = Files.createTempDirectory("cck_src").toString + "/data"
    val cp = Files.createTempDirectory("cck_cp").toString
    val corpus = Files.createTempDirectory("cck_corpus").toString + "/corpus"
    val (mh, ck) = ("cck_mh", "cck_ck")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      compactEvery = 2, chunkIndexName = Some(ck))
    // long-enough docs to chunk (window 64 / stride 48): 80 tokens → 2 chunks
    def doc80(id: Long, tag: String) =
      (id, (1 to 80).map(i => s"${tag}_$i").mkString(" "), "en", "srcA",
        400L, day)
    try {
      frame((1L to 6L).map(i => doc80(i, s"b$i"))).write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        ContinuousIngest.start(spark,
          spark.readStream.schema(schema).parquet(src), cp, cfg)
          .awaitTermination()
      }
      run() // batch 0: cold chunk-index build
      assert(graft.etl.LshIndex.exists(spark, ck))
      frame((7L to 10L).map(i => doc80(i, s"c$i")))
        .write.mode("append").parquet(src)
      run() // batch 1 appends + maintenance compacts the chunk family
      val corpusDf = ManifestTable.read(spark, corpus)
      assert(corpusDf.count() == 10)
      // every corpus doc contributes its chunks, composite-keyed
      val span = 1000000L
      val docsInIndex = spark.table(s"${ck}_vectors")
        .select(($"vec_id" / span).cast("long").as("d")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(docsInIndex == (1L to 10L).toSet,
        s"chunk index must cover every accepted doc, got $docsInIndex")
      // rebuild equivalence: served probe == fresh build over the final
      // corpus' chunk frame, at the same geometry
      val planes = graft.etl.IndexMeta.read(spark, ck)("planes_per_table").toInt
      LshIndex.build(spark,
        SimilarityOps.chunkIndexFrame(spark, corpusDf, cfg.chunkDims),
        "cck_rb", planesPerTable = planes, dims = cfg.chunkDims)
      val queries = SimilarityOps.chunkIndexFrame(spark,
        frame(Seq(doc80(500L, "b3"))), cfg.chunkDims) // near doc 3's chunks
      val served = LshIndex.search(spark, queries, ck, topK = 4)
        .collect().map(_.toSeq).toSet
      val rebuilt = LshIndex.search(spark, queries, "cck_rb", topK = 4)
        .collect().map(_.toSeq).toSet
      assert(served.nonEmpty && served == rebuilt,
        "served chunk retrieval must equal a from-scratch rebuild")
    } finally {
      Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(ck, "cck_rb").foreach(LshIndex.dropAll(spark, _))
    }
  }

  test("quality gate: dirty batch rejected whole, reports published, metadata path opens no files") {
    import graft.etl.DataQuality
    import graft.etl.DataQuality._
    val src = Files.createTempDirectory("ciq_src").toString + "/data"
    val cp = Files.createTempDirectory("ciq_cp").toString
    val corpus = Files.createTempDirectory("ciq_corpus").toString + "/corpus"
    val mh = "ciq_idx"
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      batchChecks = Seq(
        Completeness("lang", "batch.lang"),
        NonNegative("n_chars", "batch.n_chars")),
      tableChecks = Seq(
        MinRows("corpus", 1.0),
        NonNegative("n_chars", "corpus.n_chars"),
        Completeness("text", "corpus.text")))
    def corpusIds(): Set[Long] = ManifestTable.read(spark, corpus)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    def report(): Seq[(String, String, String, Long, Long)] =
      ManifestTable.read(spark, ContinuousIngest.dqReportPath(cfg))
        .select($"batch_id", $"scope", $"check_name", $"passed",
          $"from_metadata")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSeq
    try {
      frame((1L to 6L).map(i => doc(i, words(s"q$i", 16)))).write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        ContinuousIngest.start(spark,
          spark.readStream.schema(schema).parquet(src), cp, cfg)
          .awaitTermination()
      }

      // ---- clean batch: accepted, both report scopes published
      run()
      assert(corpusIds() == (1L to 6L).toSet)
      val r0 = report()
      assert(r0.filter(r => r._1 == "b0" && r._2 == "batch")
        .map(_._3).toSet ==
        Set("completeness(batch.lang)", "non_negative(batch.n_chars)"))
      assert(r0.filter(_._2 == "batch").forall(_._4 == 1L))
      // table scope: min_rows + non_negative answer from zone-map
      // metadata (from_metadata=1); string completeness needs the scan
      val tbl = r0.filter(r => r._1 == "b0" && r._2 == "table")
        .map(r => r._3 -> ((r._4, r._5))).toMap
      assert(tbl("min_rows(corpus)") == ((1L, 1L)))
      assert(tbl("non_negative(corpus.n_chars)") == ((1L, 1L)))
      assert(tbl("completeness(corpus.text)") == ((1L, 0L)))

      // ---- dirty batch: doc 8 has a null lang → completeness 0.5 < 1
      // → the WHOLE batch is rejected (doc 7 too), with the failure row
      // published — rejection is observable, never silent
      Seq((7L, words("q7", 16), "en", "srcA", 16L, day),
        (8L, words("q8", 16), null.asInstanceOf[String], "srcA", 16L, day))
        .toDF("doc_id", "text", "lang", "source", "n_chars", "doc_date")
        .write.mode("append").parquet(src)
      run()
      assert(corpusIds() == (1L to 6L).toSet, "dirty batch must not merge")
      assert(!spark.table(s"${mh}_sizes").select($"doc_id")
        .collect().map(_.getLong(0)).toSet.exists(Set(7L, 8L)),
        "dirty batch must not reach the index legs")
      val r1 = report().filter(_._1 == "b1")
      assert(r1.exists(r => r._2 == "batch" &&
        r._3 == "completeness(batch.lang)" && r._4 == 0L),
        "the failing check's report row must be published")
      assert(r1.forall(_._2 == "batch"),
        "a rejected batch publishes no table-health rows (nothing merged)")

      // ---- the stream continues: a later clean batch lands normally
      frame(Seq(doc(9L, words("q9", 16)), doc(10L, words("q10", 16))))
        .write.mode("append").parquet(src)
      run()
      assert(corpusIds() == (1L to 6L).toSet + 9L + 10L)
      assert(report().exists(r => r._1 == "b2" && r._2 == "table"))

      // ---- the provable checks are ZERO-Spark-job driver work: count
      // jobs between two sentinels (listener events arrive in order)
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        // wait until the async listener bus is quiet (no new job-start
        // events for 500 ms), absorbing stragglers from earlier actions
        def settled(): Int = {
          val deadline = System.nanoTime() + 10_000_000_000L
          var last = -1
          while (System.nanoTime() < deadline) {
            val n = jobs.get()
            if (n == last) return n
            last = n; Thread.sleep(500)
          }
          jobs.get()
        }
        val n0 = settled()
        spark.range(1).count() // measure the sentinel's own job cost
        val n1 = settled()
        val sentinelCost = n1 - n0
        assert(sentinelCost >= 1, "sentinel action must register")
        val proved = Seq(MinRows("corpus", 1.0),
          NonNegative("n_chars", "corpus.n_chars"))
          .map(DataQuality.provableFromMetadata(spark, corpus, _))
        assert(proved.forall(_.exists(_.passed)))
        spark.range(1).count()
        assert(settled() - n1 == sentinelCost,
          "provableFromMetadata must launch ZERO Spark jobs")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally {
      Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("WAP merge: the post-merge audit catches what a batch gate cannot; quarantine invisible at every version") {
    import graft.etl.DataQuality
    import graft.etl.DataQuality._
    val src = Files.createTempDirectory("ciw_src").toString + "/data"
    val cp = Files.createTempDirectory("ciw_cp").toString
    val corpus = Files.createTempDirectory("ciw_corpus").toString + "/corpus"
    val mh = "ciw_idx"
    // uniqueness of `source` is a MERGED-state property: any single batch
    // with distinct sources passes it trivially, but a batch whose source
    // already exists in the corpus breaks it only AFTER the upsert folds —
    // exactly the class of check the WAP path exists for
    val checks: Seq[RowCheck] = Seq(
      Uniqueness("source", "corpus.source"),
      NonNegative("n_chars", "corpus.n_chars"))
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      wapAudit = true, batchChecks = checks)
    def srcDoc(id: Long, tag: String, source: String) =
      (id, words(tag, 16), "en", source, 16L, day)
    def rows(rs: Seq[(Long, String, String, String, Long, java.sql.Date)]) =
      rs.toDF("doc_id", "text", "lang", "source", "n_chars", "doc_date")
    def corpusIds(): Set[Long] = ManifestTable.read(spark, corpus)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    try {
      rows(Seq(srcDoc(1L, "w1", "srcA"), srcDoc(2L, "w2", "srcB"),
        srcDoc(3L, "w3", "srcC"))).write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        ContinuousIngest.start(spark,
          spark.readStream.schema(schema).parquet(src), cp, cfg)
          .awaitTermination()
      }

      // ---- clean batch: audited on the post-merge state, published
      run()
      assert(corpusIds() == Set(1L, 2L, 3L))
      assert(ManifestTable.versions(spark, corpus) == Seq(1))

      // ---- poisoned batch: doc 4 reuses srcB. The batch ALONE passes
      // every configured check (proving the pre-merge gate is blind to
      // this), but the staged post-merge state has srcB twice
      val bad = rows(Seq(srcDoc(4L, "w4", "srcB")))
      assert(DataQuality.allPassed(DataQuality.report(Seq(
        DataQuality.rowChecks(bad, checks)))),
        "precondition: the batch gate would have PASSED this batch")
      bad.write.mode("append").parquet(src)
      run()
      assert(corpusIds() == Set(1L, 2L, 3L), "rejected batch must not merge")
      assert(ManifestTable.versions(spark, corpus) == Seq(1),
        "a rejected WAP batch must not consume a version")
      assert(!ManifestTable.readAt(spark, corpus, 1)
        .select($"doc_id").collect().map(_.getLong(0)).contains(4L),
        "time travel must not see quarantined bytes either")
      // zero readable trace on disk: every data dir is referenced by a
      // committed manifest (the staged rewrite was abandoned)
      val dd = new org.apache.hadoop.fs.Path(corpus, "data")
      val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val live = ManifestTable.versions(spark, corpus)
        .flatMap(ManifestTable.snapshotAt(spark, corpus, _))
        .flatMap(s => s.parts.values ++ s.deletes).toSet
      assert(fs.listStatus(dd).map(_.getPath.getName).forall(live.contains),
        "the rejected stage's dirs must be abandoned, not leaked")
      assert(!spark.table(s"${mh}_sizes").select($"doc_id")
        .collect().map(_.getLong(0)).contains(4L),
        "a rejected batch must not reach the index legs")
      // ...but the rejection is observable: the audit report published
      val rep = ManifestTable.read(spark, ContinuousIngest.dqReportPath(cfg))
        .filter($"batch_id" === "b1" && $"scope" === "wap_audit")
        .select($"check_name", $"passed").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rep("uniqueness(corpus.source)") == 0L,
        "the failing audit row must be published")
      assert(rep("non_negative(corpus.n_chars)") == 1L)

      // ---- the stream continues: a later clean batch lands normally
      rows(Seq(srcDoc(5L, "w5", "srcE"))).write.mode("append").parquet(src)
      run()
      assert(corpusIds() == Set(1L, 2L, 3L, 5L))
      assert(ManifestTable.versions(spark, corpus) == Seq(1, 2))
    } finally {
      Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("sketch reconcile audit: an over-deleted grid fails the turnstile floor and a rebuild heals it") {
    val src = Files.createTempDirectory("cisa_src").toString + "/data"
    val cp = Files.createTempDirectory("cisa_cp").toString
    val corpus = Files.createTempDirectory("cisa_corpus").toString + "/corpus"
    val (mh, sk, ref) = ("cisa_mh", "cisa_sk", "cisa_ref")
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      sketchName = Some(sk), sketchAuditTokens = 8)
    val probes = Seq("p1_1", "p3_2", "p6_16")
    def est(name: String): Map[String, Long] =
      graft.etl.SketchStore.estimate(spark, name, probes).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def auditViolations(): Long = graft.etl.SketchStore
      .audit(spark, ManifestTable.read(spark, corpus), sk, 8)
      .filter($"under_ok" === 0L || $"over_ok" === 0L).count()
    try {
      frame((1L to 6L).map(i => doc(i, words(s"p$i", 16))))
        .write.parquet(src)
      val schema = spark.read.parquet(src).schema
      val deadline = System.nanoTime() + 30_000_000_000L
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      ContinuousIngest.start(spark,
        spark.readStream.schema(schema).parquet(src), cp, cfg)
        .awaitTermination()
      // healthy grid: maintenance audits it and leaves it alone
      assert(auditViolations() == 0L, "a fresh grid must pass its own audit")
      ContinuousIngest.maintain(spark, cfg)
      assert(est(sk)("p1_1") >= 1L)

      // OVER-DELETION: subtract docs that were never removed from the
      // corpus — each append/delete leg is individually exactly-once,
      // but nothing in the turnstile itself can catch an operator
      // feeding it a wrong pre-image. Estimates drop below exact counts.
      graft.etl.SketchStore.applyDeletes(spark,
        frame(Seq(doc(1L, words("p1", 16)), doc(2L, words("p2", 16)))),
        sk, "phantom-del")
      assert(auditViolations() > 0L,
        "the audit must flag estimates below exact counts (turnstile floor)")

      // the reconcile sweep detects the broken grid and heals by rebuild:
      // post-maintenance estimates equal a fresh grid over the corpus
      ContinuousIngest.maintain(spark, cfg)
      assert(auditViolations() == 0L, "maintenance must heal a failing grid")
      graft.etl.SketchStore.build(spark, ManifestTable.read(spark, corpus), ref)
      assert(est(sk) == est(ref),
        "the healed sketch must equal a from-scratch grid")
    } finally {
      (Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta") ++
        Seq(sk, ref).flatMap(n => Seq(s"${n}_cells", s"${n}_meta")))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("drift watch: a batch that passes every floor but slides from the stream is stamped") {
    import graft.etl.DataQuality._
    val corpus = Files.createTempDirectory("cid_corpus").toString + "/corpus"
    val mh = "cid_idx"
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      batchChecks = Seq(Completeness("lang", "batch.lang", threshold = 0.5)),
      driftTolerance = Some(0.05), driftWindow = 5)
    def mixed(b: Int, nullFrac: Double): org.apache.spark.sql.DataFrame = {
      val n = 8
      (1 to n).map { i =>
        val lang = if (i <= (n * nullFrac).round) null.asInstanceOf[String] else "en"
        (b * 100L + i, words(s"dw${b}_$i", 16), lang, "srcA", 16L, day)
      }.toDF("doc_id", "text", "lang", "source", "n_chars", "doc_date")
    }
    try {
      // six healthy batches (completeness 1.0), then a 25%-null slide —
      // 0.75 still passes the 0.5 floor, but sits 0.25 off the trailing
      // mean: the drift watch must stamp it
      (0 to 5).foreach(b =>
        ContinuousIngest.ingestBatch(spark, mixed(b, 0.0), b, cfg))
      ContinuousIngest.ingestBatch(spark, mixed(6, 0.25), 6, cfg)
      val rep = ManifestTable.read(spark, ContinuousIngest.dqReportPath(cfg))
        .filter(col("check_name") === "completeness(batch.lang)")
        .select(col("batch_id"), col("passed"), col("drifted"), col("drift"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), Option(r.getAs[java.lang.Long]("drifted")),
            Option(r.getAs[java.lang.Double]("drift"))))).toMap
      // every batch passed the absolute floor
      assert(rep.values.forall(_._1 == 1L))
      // the slide is stamped: drift -0.25 beyond the 0.05 tolerance
      assert(rep("b6")._2.contains(1L), s"b6 must be stamped drifted: $rep")
      assert(rep("b6")._3.exists(d => math.abs(d + 0.25) < 1e-9))
      // healthy steady-state batches with full history are NOT flagged
      assert(rep("b5")._2.contains(0L))
      // early batches (<window history) carry no verdict at all
      assert(rep("b2")._2.isEmpty)
      // the corpus itself accepted all seven batches (advisory, not a gate)
      assert(ManifestTable.read(spark, corpus).count() == 7L * 8L)
    } finally {
      Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("declared bloom columns ride the streaming merge: point reads and deletes prune") {
    val src = Files.createTempDirectory("cib_src").toString + "/data"
    val cp = Files.createTempDirectory("cib_cp").toString
    val corpus = Files.createTempDirectory("cib_corpus").toString + "/corpus"
    val mh = "cib_idx"
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      bloomCols = Seq("doc_id"))
    try {
      frame((1L to 20L).map(i => doc(i, words(s"cb$i", 16)))).write.parquet(src)
      val schema = spark.read.parquet(src).schema
      ContinuousIngest.start(spark,
        spark.readStream.schema(schema).parquet(src), cp, cfg)
        .awaitTermination()
      val snap = ManifestTable.currentSnapshot(spark, corpus).get
      assert(snap.bloomCols == Seq("doc_id"),
        "the config's bloom columns must persist as a table property")
      val unit = new org.apache.hadoop.fs.Path(
        s"$corpus/data/${snap.parts.head._2}/part_year=${snap.parts.head._1}")
      val fsx = unit.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fsx.exists(graft.etl.FileBlooms.sidecarPath(unit)),
        "the streamed merge must build the bloom sidecar")
      // the compliance path: point read and point delete by doc id
      assert(ManifestTable.readWhere(spark, corpus, col("doc_id") === 7L)
        .count() == 1L)
      assert(ManifestTable.deleteWhere(spark, corpus, col("doc_id") === 7L) == 1L)
      assert(ManifestTable.read(spark, corpus).filter(col("doc_id") === 7L)
        .count() == 0L)
    } finally {
      Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
