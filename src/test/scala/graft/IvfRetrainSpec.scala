package graft

import graft.core.T
import graft.etl.BatchLog
import graft.operators.IvfIndex
import org.apache.spark.sql.functions._

/** Retrain-on-growth for the persisted IVF index: the quantizer follows
  * the accumulated corpus, the directory swap is crash-healable, and
  * the persisted `_centroids` keep append/search correct across
  * retrains (a caller-held centroid frame goes stale at the first one).
  */
class IvfRetrainSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = T(spark, sf0001, "embeddings")

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("ivf_rt").toString + "/index"

  test("retrain widens k to autoK of the accumulated corpus; lists stay complete and servable") {
    val path = freshPath()
    IvfIndex.buildIndexDir(spark, emb.filter($"vec_id" % 3 === 0), path, k = 4, iters = 2)
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 =!= 0), path, "b1")
    val n = emb.count()
    val kWant = IvfIndex.autoK(n, minK = 8)
    assert(kWant > 4 * 2, "fixture must force growth past the growFactor")
    assert(IvfIndex.retrainIndexDir(spark, path, iters = 2, minK = 8))
    assert(IvfIndex.readCentroids(spark, path).count() == kWant,
      "retrained quantizer must carry autoK(n) centroids")
    // lists cover the full accumulated corpus exactly once
    val lists = spark.read.parquet(path)
    assert(lists.count() == n)
    assert(lists.select($"vec_id").distinct().count() == n)
    // dir-resolved search equals in-memory search over the same data —
    // the persisted quantizer IS the one the lists were assigned with
    val queries = emb.filter($"vec_id" < 3)
    val onDisk = IvfIndex.searchIndexDirAuto(spark, path, queries,
      topK = 5, nprobe = 3).collect().toSeq
    val inMem = IvfIndex.search(spark,
      lists.select($"cluster_id", $"vec_id", $"v"),
      IvfIndex.readCentroids(spark, path), queries,
      topK = 5, nprobe = 3).collect().toSeq
    assert(onDisk.nonEmpty && onDisk == inMem)
    // converged: a second retrain at the same sizing is a no-op
    assert(!IvfIndex.retrainIndexDir(spark, path, iters = 2, minK = 8))
  }

  test("retrain no-ops while the trained k still covers the corpus; appends after retrain follow the new quantizer") {
    val path = freshPath()
    // cold-build already at autoK of the full corpus → nothing to grow
    val kFull = IvfIndex.autoK(emb.count(), minK = 8)
    IvfIndex.buildIndexDir(spark, emb, path, k = kFull, iters = 2)
    assert(!IvfIndex.retrainIndexDir(spark, path, iters = 2, minK = 8))

    // growth path: small build, retrain, then append — the append must
    // assign against the RETRAINED centroids (read from the dir), and a
    // replay of it stays a no-op through the preserved tombstones
    val path2 = freshPath()
    IvfIndex.buildIndexDir(spark, emb.filter($"vec_id" % 3 === 0), path2,
      k = 4, iters = 2)
    assert(IvfIndex.retrainIndexDir(spark, path2, iters = 2, minK = 8))
    val kNew = IvfIndex.readCentroids(spark, path2).count()
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 === 1), path2, "b1")
    val appended = spark.read.parquet(path2)
      .filter($"batch_id" === "b1")
    assert(appended.count() > 0)
    assert(appended.select($"cluster_id").distinct().count() <= kNew)
    val total = spark.read.parquet(path2).count()
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 === 1), path2, "b1")
    assert(spark.read.parquet(path2).count() == total,
      "a replayed append must stay a no-op after the retrain swap")
  }

  test("retrain preserves the folded batches' tombstones: a late replay of an old batch is a no-op") {
    val path = freshPath()
    IvfIndex.buildIndexDir(spark, emb.filter($"vec_id" % 3 === 0), path,
      k = 4, iters = 2)
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 === 1), path, "b1")
    assert(IvfIndex.retrainIndexDir(spark, path, iters = 2, minK = 8))
    val total = spark.read.parquet(path).count()
    // the late replay: b1's rows were folded into the retrain's build
    // partition; its marker must have survived the swap
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 === 1), path, "b1")
    assert(spark.read.parquet(path).count() == total,
      "a long-retrained batch must not re-append")
    assert(BatchLog.committed(spark, BatchLog.logDirAt(path)).contains("b1"))
  }

  test("existsDir heals every swap window before answering; a staged cold build never serves half-built") {
    import org.apache.hadoop.fs.Path
    val path = freshPath()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!IvfIndex.existsDir(spark, path), "nothing on disk yet")
    IvfIndex.buildIndexDir(spark, emb, path, k = 8, iters = 2)
    assert(IvfIndex.existsDir(spark, path))
    // crash window: live renamed away, complete stage waiting — a plain
    // dir-exists probe answers false here and a build-vs-append caller
    // would cold-rebuild from one batch; existsDir must heal first
    fs.rename(new Path(path), new Path(s"${path}__retrain"))
    assert(IvfIndex.existsDir(spark, path),
      "existsDir must promote the complete stage, not report absent")
    // a live dir stripped of its quantizer is a state no crash window
    // produces (builds stage whole) — loud, never a rebuild trigger
    fs.delete(new Path(path, "_centroids"), true)
    val e = intercept[IllegalArgumentException](IvfIndex.existsDir(spark, path))
    assert(e.getMessage.contains("_centroids"), s"loud and explanatory: ${e.getMessage}")
  }

  test("compactIndexDir folds committed batches to one partition and purges the delete set") {
    val path = freshPath()
    IvfIndex.buildIndexDir(spark, emb.filter($"vec_id" % 3 === 0), path, k = 4, iters = 2)
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 === 1), path, "b1")
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 === 2), path, "b2")
    val centroidsBefore = IvfIndex.readCentroids(spark, path)
      .collect().map(_.toSeq).toSet
    val doomed = Seq(0L, 3L, 7L).toDF("id")
    IvfIndex.compactIndexDir(spark, path,
      Some(graft.etl.IndexCompaction.Remove(doomed)))
    val lists = spark.read.parquet(path)
    val expect = emb.select($"vec_id").collect().map(_.getLong(0)).toSet -- Set(0L, 3L, 7L)
    assert(lists.select($"vec_id").collect().map(_.getLong(0)).toSet == expect,
      "ghost ids must be gone, survivors all present")
    assert(lists.select($"vec_id").distinct().count() == expect.size, "exactly once")
    assert(lists.select($"batch_id").distinct().count() == 1,
      "committed batches folded into one partition")
    assert(IvfIndex.readCentroids(spark, path).collect().map(_.toSeq).toSet
      == centroidsBefore, "compaction must not touch the quantizer")
    // probes: no deleted id ever surfaces as a neighbor
    val neighbors = IvfIndex.searchIndexDirAuto(spark, path,
      emb.filter($"vec_id" < 3), topK = 50, nprobe = 4)
      .select($"neighbor_id").collect().map(_.getLong(0)).toSet
    assert(neighbors.intersect(Set(0L, 3L, 7L)).isEmpty,
      s"deleted ids surfaced as IVF neighbors: $neighbors")
    // late replay of a folded batch stays a no-op (tombstones carried)
    val total = spark.read.parquet(path).count()
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 === 1), path, "b1")
    assert(spark.read.parquet(path).count() == total)
  }

  test("retrain applies the delete set: the new quantizer trains on survivors and no ghost survives") {
    val path = freshPath()
    IvfIndex.buildIndexDir(spark, emb.filter($"vec_id" % 3 === 0), path, k = 4, iters = 2)
    IvfIndex.appendIndexDir(spark, emb.filter($"vec_id" % 3 =!= 0), path, "b1")
    val doomed = (0L to 9L).toDF("id")
    assert(IvfIndex.retrainIndexDir(spark, path, iters = 2, minK = 8,
      deletes = Some(graft.etl.IndexCompaction.Remove(doomed))))
    val survivors = emb.filter($"vec_id" >= 10).select($"vec_id")
      .collect().map(_.getLong(0)).toSet
    val lists = spark.read.parquet(path)
    assert(lists.select($"vec_id").collect().map(_.getLong(0)).toSet == survivors,
      "retrain must fold the deletes out before training")
    assert(IvfIndex.readCentroids(spark, path).count() ==
      IvfIndex.autoK(survivors.size.toLong, minK = 8),
      "quantizer sized to the SURVIVING corpus, not the pre-delete count")
    // and a later retrain cannot resurrect them (reads the purged lists)
    assert(!IvfIndex.retrainIndexDir(spark, path, iters = 2, minK = 8))
    assert(spark.read.parquet(path).select($"vec_id")
      .collect().map(_.getLong(0)).toSet == survivors)
  }

  test("every crash window of the swap heals: stage promotes, retired copy restores, leftovers sweep") {
    import org.apache.hadoop.fs.Path
    val path = freshPath()
    IvfIndex.buildIndexDir(spark, emb, path, k = 8, iters = 2)
    val queries = emb.filter($"vec_id" < 3)
    val served = IvfIndex.searchIndexDirAuto(spark, path, queries).collect().toSeq
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // window A: live renamed away, COMPLETE stage waiting → promote
    fs.rename(new Path(path), new Path(s"${path}__retrain"))
    IvfIndex.heal(spark, path)
    assert(IvfIndex.searchIndexDirAuto(spark, path, queries).collect().toSeq == served)

    // window B: live renamed away with an INCOMPLETE stage → restore old
    fs.rename(new Path(path), new Path(s"${path}__old"))
    fs.mkdirs(new Path(s"${path}__retrain")) // no _centroids: incomplete
    IvfIndex.heal(spark, path)
    assert(IvfIndex.searchIndexDirAuto(spark, path, queries).collect().toSeq == served)
    assert(!fs.exists(new Path(s"${path}__retrain")), "incomplete stage swept")

    // window C: crash after the swap, retired copy left behind → sweep
    fs.mkdirs(new Path(s"${path}__old"))
    IvfIndex.heal(spark, path)
    assert(!fs.exists(new Path(s"${path}__old")))
    assert(IvfIndex.searchIndexDirAuto(spark, path, queries).collect().toSeq == served)
  }
}
