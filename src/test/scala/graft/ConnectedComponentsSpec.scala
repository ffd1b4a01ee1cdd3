package graft

import graft.core.T
import graft.operators.{ConnectedComponents, CorpusPipeline, DedupOps}
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class ConnectedComponentsSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  /** driverThreshold = 0 forces the distributed star-contraction path;
    * the default exercises the driver union-find fast path. */
  private def comps(edges: Seq[(Long, Long)],
      driverThreshold: Long = 1000000L): Map[Long, Long] =
    ConnectedComponents.components(spark, edges.toDF("a", "b"),
      driverThreshold = driverThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find oracle. */
  private def ufOracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain, star, and disjoint components resolve to the min id") {
    assert(comps(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(comps(Seq((10L, 7L), (10L, 8L), (10L, 9L))) ==
      Map(7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L))
    assert(comps(Seq((1L, 2L), (5L, 6L), (6L, 7L))) ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("a 60-node chain with shuffled ids converges within the iteration bound") {
    val rnd = new scala.util.Random(7)
    val ids = rnd.shuffle((100L until 160L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val got = comps(edges)
    assert(got.size == 60)
    assert(got.values.toSet == Set(ids.min))
  }

  test("random graphs match a driver-side union-find oracle on BOTH paths") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      val n = 80
      val edges = Seq.fill(70)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val expect = ufOracle(edges)
      assert(comps(edges) == expect, s"trial $trial (driver fast path)")
      assert(comps(edges, driverThreshold = 0L) == expect,
        s"trial $trial (distributed star contraction)")
    }
  }

  test("exhausting maxIter fails loudly instead of returning wrong labels") {
    val edges = (1L to 40L).sliding(2).map(p => (p(0), p(1))).toSeq
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.components(spark, edges.toDF("a", "b"), maxIter = 1,
        driverThreshold = 0L)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("intermediate-round checkpoints are deleted; only the final round remains") {
    val root = java.nio.file.Files.createTempDirectory("cc_ckpt_test").toString
    spark.sparkContext.setCheckpointDir(root)
    val ckptDir = spark.sparkContext.getCheckpointDir.get
    val rnd = new scala.util.Random(3)
    val ids = rnd.shuffle((0L until 50L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val out = ConnectedComponents.components(spark, edges.toDF("a", "b"),
      driverThreshold = 0L)
    assert(out.collect().length == 50) // result readable AFTER cleanup ran
    val p = new org.apache.hadoop.fs.Path(ckptDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val remaining = fs.listStatus(p).length
    // a 50-node shuffled chain takes several rounds; all but the final
    // round's checkpoint must be gone (Spark never cleans these itself)
    assert(remaining <= 1,
      s"intermediate checkpoints leaked: $remaining dirs under $ckptDir")
  }

  test("near-dup filter keeps exactly one doc per connected component") {
    val docs = T(spark, sf0001, "documents")
    val t = CorpusPipeline.Thresholds()
    val compDf = DedupOps.minhashComponents(spark, docs, t.nearDupJaccard)
    val byComp = compDf.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1).toSet }
    assert(byComp.nonEmpty, "corpus has planted near-dups")
    assert(byComp.exists(_._2.size > 2) ||
      byComp.forall(_._2.size >= 2), "components group at least pairs")
    val survivors = CorpusPipeline.nearDupFilter(spark, docs, t)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    byComp.foreach { case (c, members) =>
      val kept = members.intersect(survivors)
      assert(kept == Set(c),
        s"component $c must keep exactly its min (kept: $kept)")
    }
    // docs in no component pass through untouched
    val inComp = byComp.values.flatten.toSet
    val all = docs.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert((all -- inComp).subsetOf(survivors))
  }
}
