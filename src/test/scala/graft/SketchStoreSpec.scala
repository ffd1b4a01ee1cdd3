package graft

import graft.etl.{BatchLog, SketchStore}
import org.apache.spark.sql.DataFrame

class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val b1 = docsOf(
    1L -> "alpha beta alpha gamma",
    2L -> "beta beta delta")
  private val b2 = docsOf(
    3L -> "alpha epsilon",
    4L -> "zeta zeta zeta beta")

  private val probeTokens =
    Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "missing")

  private def estimates(name: String): Map[String, Long] =
    SketchStore.estimate(spark, name, probeTokens).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates never undercount, and a fresh build equals build+append (linearity)") {
    SketchStore.build(spark, b1, "sk_lin_a")
    SketchStore.append(spark, b2, "sk_lin_a", "b2")
    SketchStore.build(spark, b1.union(b2), "sk_lin_b")
    val merged = estimates("sk_lin_a")
    assert(merged == estimates("sk_lin_b"),
      "cell-wise merge must equal the one-shot grid")
    val exact = Map("alpha" -> 3L, "beta" -> 4L, "gamma" -> 1L,
      "delta" -> 1L, "epsilon" -> 1L, "zeta" -> 3L, "missing" -> 0L)
    exact.foreach { case (t, n) =>
      assert(merged(t) >= n, s"$t undercounted: ${merged(t)} < $n")
    }
  }

  test("negative-cell deletes subtract a batch exactly") {
    SketchStore.build(spark, b1.union(b2), "sk_del")
    SketchStore.applyDeletes(spark, b2, "sk_del", "d1")
    SketchStore.build(spark, b1, "sk_b1_only")
    assert(estimates("sk_del") == estimates("sk_b1_only"),
      "deleting b2's pre-image must recover b1's grid")
  }

  test("replayed append is a no-op; a crashed partial partition purges on retry") {
    SketchStore.build(spark, b1, "sk_replay")
    SketchStore.append(spark, b2, "sk_replay", "b2")
    val once = estimates("sk_replay")
    SketchStore.append(spark, b2, "sk_replay", "b2") // blind replay
    assert(estimates("sk_replay") == once, "replay doubled the counts")
    // crash injection: an UNCOMMITTED partial partition for batch b3
    graft.etl.MinhashIndex.writeBucketed(
      Seq((0, 1L, 999L)).toDF("i", "bucket", "c"),
      SketchStore.cellsTable("sk_replay"), 4,
      append = true, "b3", "bucket")
    SketchStore.append(spark, b2, "sk_replay", "b3") // retry purges + lands
    val est = estimates("sk_replay")
    assert(est("beta") == once("beta") + 1L && est("zeta") == once("zeta") + 3L,
      s"retry after crash left residue: $est vs $once")
  }

  test("fold compacts to one grid partition with identical estimates") {
    SketchStore.build(spark, b1, "sk_fold")
    SketchStore.append(spark, b2, "sk_fold", "b2")
    SketchStore.applyDeletes(spark, b1, "sk_fold", "d1")
    val before = estimates("sk_fold")
    SketchStore.fold(spark, "sk_fold")
    assert(estimates("sk_fold") == before, "fold changed estimates")
    val parts = spark.table(SketchStore.cellsTable("sk_fold"))
      .select("batch_id").distinct().collect().map(_.getString(0)).toSeq
    assert(parts == Seq(BatchLog.BuildId), s"fold left partitions: $parts")
    val meta = graft.etl.IndexMeta.read(spark, "sk_fold")
    assert(spark.table(SketchStore.cellsTable("sk_fold")).count() <=
      meta("depth").toLong * meta("width").toLong)
    // the log survives the fold: a replayed batch append stays a no-op
    // even though its rows were folded away from their original partition
    SketchStore.append(spark, b2, "sk_fold", "b2")
    assert(estimates("sk_fold") == before, "replay after fold double-counted")
  }

  test("a crash between fold's drop and rename heals on next touch") {
    SketchStore.build(spark, b1, "sk_heal")
    val before = estimates("sk_heal")
    // stage the folded grid, then simulate the crash window: old table
    // dropped, staged rename never ran
    val t = SketchStore.cellsTable("sk_heal")
    graft.etl.MinhashIndex.writeBucketed(
      spark.table(t).drop("batch_id"), s"${t}__new", 4,
      append = false, BatchLog.BuildId, "bucket")
    spark.sql(s"DROP TABLE $t")
    assert(SketchStore.exists(spark, "sk_heal"), "staged grid must count as existing")
    assert(estimates("sk_heal") == before, "read did not heal the swap")
    SketchStore.append(spark, b2, "sk_heal", "b2") // append after heal works
    assert(estimates("sk_heal")("zeta") == before("zeta") + 3L)
  }
}
