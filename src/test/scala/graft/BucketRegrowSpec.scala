package graft

import graft.etl.{IndexCompaction, IndexMeta, LshIndex, MinhashIndex, TextIndex}
import org.apache.spark.sql.functions._

/** Storage-layout growth at compaction: the bucket count a family froze
  * at its cold build re-derives from the accumulated row count during
  * the fold (which rewrites every row anyway). Pure layout — probe
  * results are bit-identical, appends follow the meta's new spec, and
  * the meta-first crash window fails loudly instead of mixing layouts.
  */
class BucketRegrowSpec extends SparkSpec {
  import spark.implicits._

  test("minhash fold at a tiny rows-per-bucket target widens the layout; probe identical") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val isNew = col("doc_id") % 10 === 0
    try {
      MinhashIndex.build(spark, docs.filter(!isNew), "brspec_mh", nBuckets = 8)
      val probe = MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "brspec_mh")
        .collect().map(_.toSeq).toSet
      val rows = spark.table("brspec_mh_shingles").count()
      MinhashIndex.compact(spark, "brspec_mh",
        targetRowsPerBucket = rows / 32 + 1)
      val grown = IndexMeta.read(spark, "brspec_mh")("n_buckets").toInt
      assert(grown > 8 && grown <= 32, s"expected growth from 8, got $grown")
      assert(MinhashIndex
        .incrementalPairs(spark, docs.filter(isNew), "brspec_mh")
        .collect().map(_.toSeq).toSet == probe,
        "bucket count is layout only — probe results must not move")
      // appends after growth land under the new spec (loud mismatch
      // otherwise), and a replay is still a no-op
      MinhashIndex.append(spark, docs.filter(isNew), "brspec_mh", "b_after")
      val counts = spark.table("brspec_mh_shingles").count()
      MinhashIndex.append(spark, docs.filter(isNew), "brspec_mh", "b_after")
      assert(spark.table("brspec_mh_shingles").count() == counts)
    } finally
      Seq("_banded", "_shingles", "_sizes", "_meta")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS brspec_mh$x"))
  }

  test("growth is monotonic and capped; a generous target is a plain fold") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    try {
      LshIndex.build(spark, emb, "brspec_lsh", nBuckets = 16)
      val queries = emb.filter($"vec_id" < 10)
      val served = LshIndex.search(spark, queries, "brspec_lsh")
        .collect().map(_.toSeq).toSet
      // generous target: derived count below current — layout unchanged
      LshIndex.compact(spark, "brspec_lsh", targetRowsPerBucket = 1L << 30)
      assert(IndexMeta.read(spark, "brspec_lsh")("n_buckets").toInt == 16,
        "growth must never shrink the layout")
      // tiny target: growth, capped at 4096, results identical
      LshIndex.compact(spark, "brspec_lsh", targetRowsPerBucket = 1)
      val grown = IndexMeta.read(spark, "brspec_lsh")("n_buckets").toInt
      assert(grown > 16 && grown <= 4096)
      assert(LshIndex.search(spark, queries, "brspec_lsh")
        .collect().map(_.toSeq).toSet == served,
        "ANN results must be bit-identical through layout growth")
    } finally LshIndex.dropAll(spark, "brspec_lsh")
  }

  test("meta-first crash window: an append against a not-yet-folded table fails loudly") {
    val docs = graft.core.T(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    try {
      TextIndex.build(spark, docs.filter($"doc_id" % 10 =!= 0), "brspec_ti",
        nBuckets = 8)
      // simulate the window: meta already grown, fold never ran
      IndexMeta.write(spark, "brspec_ti",
        IndexMeta.read(spark, "brspec_ti") + ("n_buckets" -> "16"))
      val thrown = intercept[Exception] {
        TextIndex.append(spark, docs.filter($"doc_id" % 10 === 0),
          "brspec_ti", "b1")
      }
      assert(thrown.getMessage.toLowerCase.contains("bucket"),
        s"mismatch must name the bucket spec, got: ${thrown.getMessage}")
      // re-running compaction converges the tables to the meta spec...
      TextIndex.compact(spark, "brspec_ti")
      // ...after which the same append lands cleanly
      TextIndex.append(spark, docs.filter($"doc_id" % 10 === 0),
        "brspec_ti", "b2")
      val terms = Seq("data")
      assert(TextIndex.search(spark, "brspec_ti", terms).count() >= 0)
    } finally
      Seq("_postings", "_doclens", "_stats", "_meta")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS brspec_ti$x"))
  }
}
