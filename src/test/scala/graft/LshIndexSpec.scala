package graft

import graft.etl.LshIndex
import org.apache.spark.sql.functions._

/** The persisted LSH ANN index: probes must return exactly the
  * recompute path's ranking and read the corpus in place. */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  test("indexed search equals lshAnn recompute, corpus side exchange-free") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    try {
      LshIndex.build(spark, emb, "lshspec_idx")
      val indexed = LshIndex.search(spark, queries, "lshspec_idx")
        .collect().map(_.toSeq).toSet
      assert(indexed.nonEmpty)
      val recompute = graft.operators.SimilarityOps
        .lshAnn(spark, emb, queries)
        .collect().map(_.toSeq).toSet
      assert(indexed == recompute,
        "indexed search must answer exactly like the recompute path")
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        // the two query-side broadcasts are explicit hints, so the
        // no-broadcast conf only forces the CORPUS-side joins into
        // their true distributed form
        val p = LshIndex.search(spark, queries, "lshspec_idx")
        PlanChecks.assertCorpusInPlace(p, "lshspec_idx", expectedScans = 2)
        assert(p.collect().map(_.toSeq).toSet == indexed)
      }
    } finally
      Seq("lshspec_idx_buckets", "lshspec_idx_vectors")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("append maintains the index: search equals full rebuild, still exchange-free") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    try {
      LshIndex.build(spark, emb.filter($"vec_id" % 3 =!= 0), "lshspec_app")
      LshIndex.append(spark, emb.filter($"vec_id" % 3 === 0), "lshspec_app", "b1")
      val appended = LshIndex.search(spark, queries, "lshspec_app")
        .collect().map(_.toSeq).toSet
      LshIndex.build(spark, emb, "lshspec_full")
      val full = LshIndex.search(spark, queries, "lshspec_full")
        .collect().map(_.toSeq).toSet
      assert(appended.nonEmpty && appended == full,
        "appended index must answer exactly like a full rebuild")
      // a blind replay of the same batch is a no-op: row counts and
      // search results unchanged (the committed-batch-log contract)
      val counts = (spark.table("lshspec_app_buckets").count(),
        spark.table("lshspec_app_vectors").count())
      LshIndex.append(spark, emb.filter($"vec_id" % 3 === 0), "lshspec_app", "b1")
      assert((spark.table("lshspec_app_buckets").count(),
        spark.table("lshspec_app_vectors").count()) == counts,
        "a replayed append must not duplicate index rows")
      assert(LshIndex.search(spark, queries, "lshspec_app")
        .collect().map(_.toSeq).toSet == appended)
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        PlanChecks.assertCorpusInPlace(
          LshIndex.search(spark, queries, "lshspec_app"),
          "lshspec_app", expectedScans = 2)
      }
    } finally
      Seq("lshspec_app", "lshspec_full").foreach { n =>
        Seq(s"${n}_buckets", s"${n}_vectors")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
  }
}
