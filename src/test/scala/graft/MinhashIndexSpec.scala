package graft

import graft.etl.MinhashIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The persisted corpus-side MinHash band index: probes must (a) return
  * exactly the recompute pipeline's pairs and (b) never shuffle the
  * corpus — every index table is read in place (bucketed on its join
  * keys), with only batch-derived frames crossing an exchange. */
class MinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val isNew = col("doc_id") % 10 === 0

  test("indexed probe equals the recompute pipeline, corpus side exchange-free") {
    val docs = graft.core.T(spark, sf0001, "documents")
    try {
      MinhashIndex.build(spark, docs.filter(!isNew), "mhspec_idx")
      val probe = MinhashIndex.incrementalPairs(spark, docs.filter(isNew), "mhspec_idx")

      // (a) row-for-row equality with the self-contained recompute form
      val recompute = graft.operators.DedupOps
        .minhashNearDups(spark, docs,
          pairPredicate = (a, b) => (a % 10 === 0) =!= (b % 10 === 0))
        .select(
          when(col("doc_a") % 10 === 0, col("doc_b")).otherwise(col("doc_a")).as("doc_old"),
          when(col("doc_a") % 10 === 0, col("doc_a")).otherwise(col("doc_b")).as("doc_new"),
          col("jaccard"))
      val got = probe.collect().toSeq
      assert(got.nonEmpty, "probe found no pairs — vacuous test")
      assert(got.toSet ==
        recompute.collect().toSeq.toSet)

      // (b) plan shape: AQE/broadcast off so the joins take their true
      // distributed (sort-merge) form, then walk the executed plan — no
      // ShuffleExchange subtree may contain an index-table scan.
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val p = MinhashIndex.incrementalPairs(spark, docs.filter(isNew), "mhspec_idx")
        assertCorpusInPlace(p, "mhspec_idx")
        assert(p.collect().toSeq.toSet == got.toSet)
      }
    } finally
      Seq("mhspec_idx_banded", "mhspec_idx_shingles", "mhspec_idx_sizes")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("append maintains the index: probe equals full rebuild, still exchange-free") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val corpus = docs.filter(!isNew)
    try {
      // build over two thirds of the corpus, append the rest per-batch
      MinhashIndex.build(spark, corpus.filter(col("doc_id") % 3 =!= 0), "mhspec_app")
      MinhashIndex.append(spark, corpus.filter(col("doc_id") % 3 === 0), "mhspec_app", "b1")
      val probe = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "mhspec_app")
        .collect().toSeq
      assert(probe.nonEmpty)
      MinhashIndex.build(spark, corpus, "mhspec_full")
      val full = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "mhspec_full")
        .collect().toSeq
      assert(probe.toSet == full.toSet,
        "appended index must answer exactly like a full rebuild")
      // bucketing survives the append: probes stay corpus-exchange-free
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        assertCorpusInPlace(
          MinhashIndex.incrementalPairs(spark, docs.filter(isNew), "mhspec_app"),
          "mhspec_app")
      }
    } finally
      Seq("mhspec_app", "mhspec_full").foreach { n =>
        Seq(s"${n}_banded", s"${n}_shingles", s"${n}_sizes")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
  }

  test("hashed-shingle index answers pair-for-pair like the string index") {
    val docs = graft.core.T(spark, sf0001, "documents")
    try {
      MinhashIndex.build(spark, docs.filter(!isNew), "mhspec_str")
      MinhashIndex.build(spark, docs.filter(!isNew), "mhspec_hash",
        hashedShingles = true)
      assert(!MinhashIndex.isHashed(spark, "mhspec_str"))
      assert(MinhashIndex.isHashed(spark, "mhspec_hash"))
      // the production layout stores longs, not text
      assert(spark.table("mhspec_hash_shingles").schema("shingle").dataType ==
        org.apache.spark.sql.types.LongType)

      val strPairs = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "mhspec_str")
        .collect().toSeq
      val hashPairs = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "mhspec_hash")
        .collect().toSeq
      assert(strPairs.nonEmpty, "probe found no pairs — vacuous test")
      assert(hashPairs.toSet == strPairs.toSet,
        "hashed shingles must not change any pair or any jaccard value")

      // append respects the built mode; probes stay corpus-exchange-free
      MinhashIndex.append(spark, docs.filter(isNew), "mhspec_hash", "b1")
      assert(spark.table("mhspec_hash_shingles").schema("shingle").dataType ==
        org.apache.spark.sql.types.LongType)
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        assertCorpusInPlace(
          MinhashIndex.incrementalPairs(spark,
            docs.filter(isNew).limit(5), "mhspec_hash"),
          "mhspec_hash")
      }
    } finally
      Seq("mhspec_str", "mhspec_hash").foreach { n =>
        Seq(s"${n}_banded", s"${n}_shingles", s"${n}_sizes")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
  }

  test("append is exactly-once: replay is a no-op, a crashed partial converges") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val corpus = docs.filter(!isNew)
    val batch1 = corpus.filter(col("doc_id") % 3 === 0)
    val batch2 = corpus.filter(col("doc_id") % 3 === 1)
    def counts(n: String) = {
      val t = MinhashIndex.tables(n)
      (spark.table(t.banded).count(), spark.table(t.shingles).count(),
        spark.table(t.sizes).count())
    }
    try {
      MinhashIndex.build(spark, corpus.filter(col("doc_id") % 3 === 2), "mhspec_once")
      MinhashIndex.append(spark, batch1, "mhspec_once", "b1")
      val after1 = counts("mhspec_once")
      val probe1 = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "mhspec_once")
        .collect().toSeq
      assert(probe1.nonEmpty, "probe found no pairs — vacuous test")

      // a BLIND re-run of the same batch (checkpoint replay, retried
      // job) must change nothing — rows or probe results
      MinhashIndex.append(spark, batch1, "mhspec_once", "b1")
      assert(counts("mhspec_once") == after1,
        "a replayed append must not duplicate index rows")
      assert(MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "mhspec_once")
        .collect().toSeq.toSet == probe1.toSet)

      // crash injection: a prior attempt of b2 wrote ONLY the shingle
      // table, then died before the log commit. The retry must purge the
      // partial partition and converge to exactly a clean append's state.
      val t = MinhashIndex.tables("mhspec_once")
      MinhashIndex.writeBucketed(
        graft.operators.DedupOps.shingleRows(batch2.limit(7)),
        t.shingles, 32, append = true, "b2", "doc_id", "shingle")
      assert(counts("mhspec_once")._2 > after1._2,
        "injection must actually leave partial rows")
      MinhashIndex.append(spark, batch2, "mhspec_once", "b2")
      // reference state: the same three batches appended without a crash
      MinhashIndex.build(spark, corpus.filter(col("doc_id") % 3 === 2), "mhspec_ref")
      MinhashIndex.append(spark, batch1, "mhspec_ref", "b1")
      MinhashIndex.append(spark, batch2, "mhspec_ref", "b2")
      assert(counts("mhspec_once") == counts("mhspec_ref"),
        "crashed-then-retried append must converge to the clean state")
      assert(MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "mhspec_once")
        .collect().toSeq.toSet ==
        MinhashIndex
          .incrementalPairs(spark, docs.filter(isNew), "mhspec_ref")
          .collect().toSeq.toSet)
    } finally
      Seq("mhspec_once", "mhspec_ref").foreach { n =>
        Seq(s"${n}_banded", s"${n}_shingles", s"${n}_sizes", s"${n}_meta")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
  }

  test("probe or append with a mismatched hash function is an error, not empty results") {
    val docs = graft.core.T(spark, sf0001, "documents")
    try {
      // non-default banding persists in _meta; the probe reads it back
      // instead of trusting call-site defaults (16 perms / 4 bands here —
      // a probe silently assuming 32/8 would derive disjoint buckets)
      MinhashIndex.build(spark, docs.filter(!isNew), "mhspec_meta",
        numPerms = 16, bands = 4)
      val probe = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "mhspec_meta")
        .collect().toSeq
      val recompute = graft.operators.DedupOps
        .minhashNearDups(spark, docs, numPerms = 16, bands = 4,
          pairPredicate = (a, b) => (a % 10 === 0) =!= (b % 10 === 0))
        .count()
      assert(probe.nonEmpty && probe.size == recompute,
        "probe must pick up the build's persisted banding parameters")
      val e = intercept[IllegalArgumentException] {
        MinhashIndex.incrementalPairs(spark, docs.filter(isNew),
          "mhspec_meta", hashFnId = "md5-portable")
      }
      assert(e.getMessage.contains("hash_fn"),
        s"expected the IndexMeta mismatch message, got: ${e.getMessage}")
      val e2 = intercept[IllegalArgumentException] {
        MinhashIndex.append(spark, docs.filter(isNew), "mhspec_meta", "bx",
          hashFnId = "md5-portable")
      }
      assert(e2.getMessage.contains("hash_fn"))
    } finally
      Seq("mhspec_meta_banded", "mhspec_meta_shingles", "mhspec_meta_sizes",
        "mhspec_meta_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  private def assertCorpusInPlace(p: org.apache.spark.sql.DataFrame,
      idxName: String): Unit =
    PlanChecks.assertCorpusInPlace(p, idxName, expectedScans = 3)
}
