package graft

import graft.etl.{BatchLog, IndexCompaction, LshIndex, MinhashIndex, TextIndex}
import org.apache.spark.sql.functions._

/** Compaction folds a batch-accreted index back to one file per bucket
  * WITHOUT changing a single probe answer or plan property — and only
  * committed batches survive the fold. */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val isNew = col("doc_id") % 10 === 0

  test("minhash index: fold shrinks files, probe rows and exchange-free plan survive") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val corpus = docs.filter(!isNew)
    try {
      MinhashIndex.build(spark, corpus.filter(col("doc_id") % 3 === 0), "icspec_mh")
      MinhashIndex.append(spark, corpus.filter(col("doc_id") % 3 === 1), "icspec_mh", "b1")
      MinhashIndex.append(spark, corpus.filter(col("doc_id") % 3 === 2), "icspec_mh", "b2")
      val t = MinhashIndex.tables("icspec_mh")
      val probeBefore = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "icspec_mh")
        .collect().toSeq
      assert(probeBefore.nonEmpty, "probe found no pairs — vacuous test")
      val filesBefore = IndexCompaction.fileCount(spark, t.shingles)
      assert(filesBefore > 32, s"3 batches x 32 buckets should exceed 32 files, got $filesBefore")
      val rowsBefore = spark.table(t.shingles).count()

      // plant an ORPHAN partition: a crashed append that never committed
      // its marker — compaction must fold it away, not carry it
      MinhashIndex.writeBucketed(
        graft.operators.DedupOps.shingleRows(corpus.limit(5)),
        t.shingles, 32, append = true, "dead-batch", "doc_id", "shingle")

      MinhashIndex.compact(spark, "icspec_mh")

      assert(IndexCompaction.fileCount(spark, t.shingles) == 32,
        "fold must leave exactly one file per bucket")
      assert(spark.table(t.shingles).count() == rowsBefore,
        "committed rows fold losslessly; the orphan partition is dropped")
      assert(spark.table(t.shingles).select($"batch_id").distinct().count() == 1,
        "every surviving row carries the fresh build tag")
      assert(MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "icspec_mh")
        .collect().toSeq.toSet == probeBefore.toSet,
        "compaction must be probe-invisible")
      // bucketed distribution survives the swap: corpus still in place
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        PlanChecks.assertCorpusInPlace(
          MinhashIndex.incrementalPairs(spark, docs.filter(isNew), "icspec_mh"),
          "icspec_mh", expectedScans = 3)
      }
      // a late replay of a long-folded batch is STILL a no-op: the log
      // keeps its markers as tombstones through compaction
      MinhashIndex.append(spark,
        corpus.filter(col("doc_id") % 3 === 1), "icspec_mh", "b1")
      assert(spark.table(t.shingles).count() == rowsBefore,
        "a folded batch's marker must survive compaction")
    } finally
      Seq("_banded", "_shingles", "_sizes", "_meta")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS icspec_mh$sfx"))
  }

  test("re-compaction keeps the folded rows even when the build used a custom batch id") {
    // Regression (round 9): ContinuousIngest builds the index under the
    // triggering micro-batch's id, so BatchLog.BuildId was never in the
    // committed log. The first compact folded every row into a BuildId
    // partition; the SECOND compact then classified that partition as an
    // uncommitted orphan and folded the index to empty — total data loss
    // on a routine maintenance re-run. compactFamily now commits its own
    // output id before folding.
    val docs = graft.core.T(spark, sf0001, "documents")
    try {
      MinhashIndex.build(spark, docs.filter(!isNew), "icspec_rc",
        buildBatchId = "b0")
      val t = MinhashIndex.tables("icspec_rc")
      val rows = spark.table(t.sizes).count()
      assert(rows > 0)
      MinhashIndex.compact(spark, "icspec_rc")
      assert(spark.table(t.sizes).count() == rows, "first compact lossless")
      MinhashIndex.compact(spark, "icspec_rc")
      assert(spark.table(t.sizes).count() == rows,
        "re-compaction must not orphan its own previous fold output")
    } finally
      Seq("_banded", "_shingles", "_sizes", "_meta")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS icspec_rc$sfx"))
  }

  test("a crashed default-id build's partial rows stay orphans through compaction") {
    // Round-10 advice: compactFamily used to pre-commit BatchLog.BuildId
    // itself, which legitimized the partial rows of a standalone
    // default-id build that crashed before its own marker commit — the
    // fold then carried a half-built index's rows as committed data.
    // The fold now stages under a fresh per-run id, so BuildId is only
    // ever committed by a build that COMPLETED.
    val docs = graft.core.T(spark, sf0001, "documents")
    try {
      MinhashIndex.build(spark, docs.filter(!isNew), "icspec_cb",
        buildBatchId = "b0")
      val t = MinhashIndex.tables("icspec_cb")
      val rows = spark.table(t.shingles).count()
      // plant the crash artifact: a default-id rebuild wrote SOME shingle
      // rows under BuildId, then died before committing the marker
      MinhashIndex.writeBucketed(
        graft.operators.DedupOps.shingleRows(docs.filter(isNew).limit(5)),
        t.shingles, 32, append = true, BatchLog.BuildId, "doc_id", "shingle")
      assert(spark.table(t.shingles).count() > rows)

      MinhashIndex.compact(spark, "icspec_cb")

      assert(spark.table(t.shingles).count() == rows,
        "the crashed build's uncommitted BuildId rows must be excluded, not folded in")
      assert(!BatchLog.committed(spark,
          BatchLog.logDir(spark, "icspec_cb")).contains(BatchLog.BuildId),
        "compaction must never commit BuildId on a crashed build's behalf")
    } finally
      Seq("_banded", "_shingles", "_sizes", "_meta")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS icspec_cb$sfx"))
  }

  test("text + lsh indexes: compaction is search-invisible") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val terms = Seq("spark", "join", "window")
    try {
      TextIndex.build(spark, docs.filter(col("doc_id") % 2 === 0), "icspec_ti")
      TextIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), "icspec_ti", "b1")
      val served = TextIndex.search(spark, "icspec_ti", terms).collect().toSeq
      val postingsBefore = IndexCompaction.fileCount(spark, "icspec_ti_postings")
      TextIndex.compact(spark, "icspec_ti")
      // postings bucket by token and sf0.001 has ~31 distinct tokens:
      // empty buckets write no file, so "one file per NON-EMPTY bucket"
      // is the invariant, not exactly nBuckets
      val postingsAfter = IndexCompaction.fileCount(spark, "icspec_ti_postings")
      assert(postingsAfter <= 32 && postingsAfter < postingsBefore,
        s"fold must shrink to at most one file per bucket " +
          s"($postingsBefore -> $postingsAfter)")
      assert(TextIndex.search(spark, "icspec_ti", terms).collect().toSeq == served,
        "BM25 scores must be bit-identical through compaction")

      LshIndex.build(spark, emb.filter($"vec_id" % 2 === 0), "icspec_lsh")
      LshIndex.append(spark, emb.filter($"vec_id" % 2 === 1), "icspec_lsh", "b1")
      val queries = emb.filter($"vec_id" < 10)
      val found = LshIndex.search(spark, queries, "icspec_lsh")
        .collect().map(_.toSeq).toSet
      LshIndex.compact(spark, "icspec_lsh")
      assert(IndexCompaction.fileCount(spark, "icspec_lsh_vectors") == 32)
      assert(LshIndex.search(spark, queries, "icspec_lsh")
        .collect().map(_.toSeq).toSet == found,
        "ANN results must be identical through compaction")
    } finally
      (Seq("_postings", "_doclens", "_stats", "_meta").map("icspec_ti" + _) ++
        Seq("_buckets", "_vectors", "_meta").map("icspec_lsh" + _))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("an interrupted swap heals: probe works again after the retry") {
    val docs = graft.core.T(spark, sf0001, "documents")
    try {
      MinhashIndex.build(spark, docs.filter(!isNew), "icspec_heal")
      val t = MinhashIndex.tables("icspec_heal")
      val probe = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "icspec_heal")
        .collect().toSeq
      // simulate the one crash window: staged table complete, original
      // dropped, rename never ran
      spark.sql(s"CREATE TABLE ${t.sizes}__compact AS SELECT * FROM ${t.sizes}")
      spark.sql(s"DROP TABLE ${t.sizes}")
      IndexCompaction.heal(spark, t.sizes)
      assert(spark.catalog.tableExists(t.sizes), "heal must finish the rename")
      assert(MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "icspec_heal")
        .collect().toSeq.toSet == probe.toSet)
    } finally
      Seq("_banded", "_shingles", "_sizes", "_meta")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS icspec_heal$sfx"))
  }
}
