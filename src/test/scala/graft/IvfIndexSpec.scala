package graft

import graft.core.T
import graft.operators.IvfIndex
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = T(spark, sf0001, "embeddings")

  test("k-means trains k centroids of the right dimensionality") {
    val centroids = IvfIndex.trainCentroids(spark, emb, k = 8, iters = 2)
    val rows = centroids.collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getSeq[Double](1).length == 64))
  }

  test("index covers every vector exactly once") {
    val (index, _) = IvfIndex.buildIndex(spark, emb, k = 8, iters = 2)
    assert(index.count() == emb.count())
    assert(index.select($"vec_id").distinct().count() == emb.count())
    val clusters = index.groupBy($"cluster_id").count().collect()
    assert(clusters.length > 1, "k-means must produce multiple non-empty lists")
  }

  test("IVF search recall vs brute force is high on clustered embeddings") {
    val (index, centroids) = IvfIndex.buildIndex(spark, emb, k = 8, iters = 3)
    val queries = emb.filter($"vec_id" < 20)
    val approx = IvfIndex.search(spark, index, centroids, queries,
      topK = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // brute force ground truth through the oracle-checked query machinery
    val bf = SparkEntry.queries("sim_cosine_topk")(spark, sf0001)
      .filter($"q_id" < 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (approx & bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall $recall too low for label-clustered data")
  }

  test("on-disk index prunes to the probed list directories and matches in-memory search") {
    val (index, centroids) = IvfIndex.buildIndex(spark, emb, k = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    IvfIndex.writeIndex(index, path)
    val queries = emb.filter($"vec_id" < 3)
    // AQE query-stage wrappers hide scans from TreeNode.collect — flat
    // plan needed for the pruning proof (same caveat as PlanAuditSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val onDisk = IvfIndex.searchIndexDir(spark, path, centroids, queries,
        topK = 5, nprobe = 2)
      val inMem = IvfIndex.search(spark, index, centroids, queries,
        topK = 5, nprobe = 2)
      assert(onDisk.collect().toSeq == inMem.collect().toSeq)
      // the scan must read only the probed partitions, not all k lists
      val k = index.select($"cluster_id").distinct().count()
      val scanned = graft.etl.LakeLayout.selectedPartitions(onDisk)
      assert(scanned.nonEmpty)
      assert(scanned.head <= 3 * 2 && scanned.head < k,
        s"probe must prune to <= queries x nprobe of $k list dirs, scanned ${scanned.head}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("search is deterministic") {
    val (index, centroids) = IvfIndex.buildIndex(spark, emb, k = 4, iters = 1)
    val q = emb.filter($"vec_id" < 5)
    val a = IvfIndex.search(spark, index, centroids, q).collect().toSeq
    val b = IvfIndex.search(spark, index, centroids, q).collect().toSeq
    assert(a == b)
  }

  test("int8 rerank inside the probed lists preserves most of the float ranking") {
    val q = emb.filter($"vec_id" < 10)
    def tops(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val (index, centroids) =
      IvfIndex.buildIndex(spark, emb, k = 8, iters = 2, exactMean = true)
    val float = tops(IvfIndex.search(spark, index, centroids, q))
    val quant = tops(graft.operators.SimilarityOps
      .ivfQuantizedSearch(spark, emb, q))
    val recalls = float.map { case (k, f) =>
      quant(k).intersect(f).size.toDouble / f.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, s"quantized IVF lost too much: avg overlap@5 = $avg")
  }

  test("appendIndex: append equals rebuild with the same centroids; pruning survives") {
    val corpus = emb.filter($"vec_id" % 3 =!= 0)
    val batch = emb.filter($"vec_id" % 3 === 0)
    val (index, centroids) = IvfIndex.buildIndex(spark, corpus, k = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivf_app").toString + "/index"
    IvfIndex.writeIndex(index, path)
    IvfIndex.appendIndex(spark, batch, centroids, path, "b1")
    val queries = emb.filter($"vec_id" < 3)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val appended = IvfIndex.searchIndexDir(spark, path, centroids, queries,
        topK = 5, nprobe = 2).collect().toSeq
      // rebuild the FULL index against the same (corpus-trained) centroids
      val full = IvfIndex.assign(spark,
        emb.select($"vec_id", $"embedding".cast("array<double>").as("v")), centroids)
      val fullPath = java.nio.file.Files.createTempDirectory("ivf_full").toString + "/index"
      IvfIndex.writeIndex(full, fullPath)
      val rebuilt = IvfIndex.searchIndexDir(spark, fullPath, centroids, queries,
        topK = 5, nprobe = 2).collect().toSeq
      assert(appended.nonEmpty && appended == rebuilt,
        "appended index must answer exactly like a rebuild over the same centroids")
      // a blind replay of the same batch is a no-op (committed batch log)
      val rows = spark.read.parquet(path).count()
      IvfIndex.appendIndex(spark, batch, centroids, path, "b1")
      assert(spark.read.parquet(path).count() == rows,
        "a replayed append must not duplicate list rows")
      // a crashed prior attempt (partial batch dir, no log commit)
      // converges on retry instead of double-counting
      IvfIndex.assign(spark,
          batch.limit(5).select($"vec_id", $"embedding".cast("array<double>").as("v")),
          centroids)
        .withColumn("batch_id", lit("b2"))
        .write.mode("append").partitionBy("batch_id", "cluster_id").parquet(path)
      IvfIndex.appendIndex(spark, batch.limit(10), centroids, path, "b2")
      assert(spark.read.parquet(path).count() == rows + 10,
        "retry after a crash must purge the partial batch dir first")
      // appended files land inside per-batch cluster dirs: pruning still
      // applies, bounded by batches x queries x nprobe leaf partitions
      val scanned = graft.etl.LakeLayout.selectedPartitions(
        IvfIndex.searchIndexDir(spark, path, centroids, queries, topK = 5, nprobe = 2))
      assert(scanned.nonEmpty && scanned.head <= 3 * (3 * 2))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("avg-trained and exact-trained IVF agree on recall (bench-vs-verify bound)") {
    // Bench times the avg-trained variant of the exact-trained declared
    // queries (the sanctioned scalar swap); this bounds how far the two
    // can drift as SEARCH QUALITY, not just as plans
    import org.apache.spark.sql.functions._
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    def meanIvfRecall(exact: Boolean): Double =
      graft.operators.SimilarityOps.annRecall(spark, emb, q, exactMean = exact)
        .filter(col("method") === "ivf")
        .agg(avg(col("recall_at_5"))).head().getDouble(0)
    val e = meanIvfRecall(true)
    val a = meanIvfRecall(false)
    assert(e >= 0.6 && a >= 0.6, s"IVF recall collapsed: exact=$e avg=$a")
    assert(math.abs(e - a) <= 0.2,
      s"exact-trained ($e) and avg-trained ($a) recall diverged past the bound")
  }

  test("autoK follows the sqrt(n) sizing within its clamps") {
    import graft.operators.IvfIndex
    assert(IvfIndex.autoK(0L) == 8, "floor on an empty corpus")
    assert(IvfIndex.autoK(100L) == 10)
    assert(IvfIndex.autoK(1000000L) == 1000)
    assert(IvfIndex.autoK(10000000000L) == 65536, "cap at the broadcast budget")
    // monotone: more corpus never means fewer lists
    val ks = Seq(100L, 10000L, 100000000L).map(IvfIndex.autoK(_))
    assert(ks == ks.sorted)
    // the derived k trains and probes like any explicit k
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val k = IvfIndex.autoK(emb.count(), maxK = 16)
    val (index, centroids) = IvfIndex.buildIndex(spark, emb, k = k, iters = 1)
    assert(centroids.count() == k)
    assert(index.select("cluster_id").distinct().count() <= k)
  }
}
