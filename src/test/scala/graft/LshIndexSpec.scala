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

  test("autoPlanes holds the occupancy bound as the corpus grows") {
    // expected per-table occupancy n / 2^p must stay <= target until the
    // plane cap (where recall economics, not occupancy, rule)
    for (n <- Seq(1L, 1000L, 100000L, 10000000L, 250000000L)) {
      val p = LshIndex.autoPlanes(n, targetOccupancy = 256)
      assert(p >= 4 && p <= 20, s"n=$n p=$p")
      if (p < 20)
        assert(n.toDouble / math.pow(2, p) <= 256.0, s"n=$n p=$p occupancy")
    }
    // monotone: more corpus never means fewer planes
    val ps = Seq(1000L, 100000L, 10000000L).map(LshIndex.autoPlanes(_))
    assert(ps == ps.sorted)
    assert(LshIndex.autoPlanes(Long.MaxValue) == 20, "cap")
  }

  test("buildAuto derives the sizing, records it in meta, probes adapt unchanged") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    try {
      // small target occupancy forces a plane count ABOVE the fixed
      // default — proving the probe follows the meta, not the default
      LshIndex.buildAuto(spark, emb, "lshspec_auto", targetOccupancy = 16)
      val meta = graft.etl.IndexMeta.read(spark, "lshspec_auto")
      val n = emb.count()
      assert(meta("planes_per_table").toInt == LshIndex.autoPlanes(n, 16))
      assert(meta("planes_per_table").toInt > 4,
        "the fixture corpus must exceed the default sizing for this test")
      val got = LshIndex.search(spark, queries, "lshspec_auto")
        .collect().map(_.toSeq).toSet
      // ground truth: the recompute path under the SAME derived params
      val expected = graft.operators.SimilarityOps.lshAnn(spark, emb, queries,
          planesPerTable = meta("planes_per_table").toInt)
        .collect().map(_.toSeq).toSet
      assert(got.nonEmpty && got == expected,
        "auto-sized probe must answer exactly like recompute at the derived params")
    } finally
      Seq("lshspec_auto_buckets", "lshspec_auto_vectors")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("chunk-indexed retrieval: sort-free chunk frame into the index, probe corpus-exchange-free") {
    val docs = graft.core.T(spark, sf0001, "documents")
    try {
      // the operator feeding the index build must carry NO sort — the
      // round-10 review found the presentation orderBy leaking into
      // pipeline reuse unless EliminateSorts happened to fire
      val chunks = graft.operators.CorpusPrepOps.chunkDocuments(docs)
      assert(!chunks.queryExecution.optimizedPlan.toString.contains("Sort"),
        "chunkDocuments must stay sort-free for pipeline reuse")
      val out = graft.operators.SimilarityOps
        .chunkIndexedRetrieval(spark, docs, "chunkidx_t")
      assert(out.count() > 0, "the indexed probe must surface neighbors")
      // serving shape: probe only, corpus side read in place
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val probe = graft.operators.SimilarityOps
          .chunkIndexedRetrieval(spark, docs, "chunkidx_t", buildIndex = false)
        PlanChecks.assertCorpusInPlace(probe, "chunkidx_t", expectedScans = 2)
      }
    } finally graft.etl.LshIndex.dropAll(spark, "chunkidx_t")
  }
}
