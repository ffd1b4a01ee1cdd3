package graft

import graft.etl.MinhashIndex
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The exact cross-batch probe's opt-in partition pruning — the
  * round-16 verdict's one per-batch full-index-scan, closed: an index
  * built with `exactProbe = true` co-maintains a `_shingles_bysh` side
  * table partitioned by `sh_p = hash(shingle) mod 64`, and
  * [[MinhashIndex.exactIncrementalPairs]] prunes its scan to the
  * partitions the batch's shingles hash into. Results are row-identical
  * to the full-scan rung (same rows, different layout); the pruning is
  * asserted on the EXECUTED plan; and the probe heals the one crash
  * window the protocol leaves (main folded, side re-derive crashed) by
  * batch-partition parity. */
class ExactProbePruneSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Seq[Long]) =
    ids.map(i => (i, s"alpha bravo charlie d$i e$i f$i g$i h$i"))
      .toDF("doc_id", "text")

  private def oneDocProbe(src: Long, as: Long) =
    docs(Seq(src)).withColumn("doc_id", lit(as))

  test("pruned probe matches the full-scan rung row-for-row and scans fewer partitions") {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val full = s"epp_full_$tag"
    val side = s"epp_side_$tag"
    val corpus = docs(1L to 200L)
    MinhashIndex.build(spark, corpus, full)
    MinhashIndex.build(spark, corpus, side, exactProbe = true)
    val probe = oneDocProbe(7L, 900L) // byte-copy — the compliance shape
    def rows(name: String) = MinhashIndex
      .exactIncrementalPairs(spark, probe, name, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSeq
    val a = rows(full)
    val b0full = MinhashIndex.exactIncrementalPairs(spark, probe, side, 0.5)
    val b = b0full.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9))).toSeq
    assert(b.nonEmpty, "the planted copy must match its source")
    assert(a == b, s"pruned and full rungs must agree: $a vs $b")
    // plan-asserted pruning: AQE wraps stages in query-stage nodes that
    // a plain collect cannot descend into, so the scan assertion runs
    // in a no-AQE sibling session (same catalog, same tables)
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    val b0 = MinhashIndex.exactIncrementalPairs(noAqe, probe, side, 0.5)
    b0.collect()
    val plan = b0.queryExecution.executedPlan match {
      case aq: AdaptiveSparkPlanExec => aq.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table.contains("shingles_bysh")) => f
    }
    assert(scans.nonEmpty, "the probe must read the side table")
    val scanned = scans.map(_.selectedPartitions.partitionCount).sum
    val total = spark.sql(s"SHOW PARTITIONS ${side}_shingles_bysh").count()
    assert(scanned > 0 && scanned < total,
      s"expected a pruned scan: read $scanned of $total partitions " +
        "(a one-doc probe's shingles cover a few sh_p values, not all)")
  }

  test("the probe heals a missing side table (fold-crash window) and purges ride the re-derive") {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val name = s"epp_heal_$tag"
    MinhashIndex.build(spark, docs(1L to 50L), name, exactProbe = true)
    MinhashIndex.append(spark, docs(51L to 60L), name, "b1")
    // appended docs are probe-visible through the side table
    assert(MinhashIndex.exactIncrementalPairs(spark,
      oneDocProbe(55L, 900L), name, 0.5).count() == 1)
    // crash simulation: compaction folded the main table but died
    // before the side re-derive — here the side table is gone entirely
    // (the re-derive's dropTable ran, the rewrite did not)
    spark.sql(s"DROP TABLE ${name}_shingles_bysh")
    val healed = MinhashIndex.exactIncrementalPairs(spark,
      oneDocProbe(55L, 900L), name, 0.5)
    assert(healed.count() == 1,
      "the probe must re-derive the side table before trusting it")
    assert(spark.catalog.tableExists(s"${name}_shingles_bysh"),
      "the heal must leave a durable side table behind")
    // a deletion purge rides compaction; the re-derived side table must
    // not keep ghost rows (ghost pairs would wrongly drop resubmissions)
    MinhashIndex.compact(spark, name,
      Some(graft.etl.IndexCompaction.Remove(Seq(55L).toDF("doc_id"))))
    assert(MinhashIndex.exactIncrementalPairs(spark,
      oneDocProbe(55L, 900L), name, 0.5).count() == 0,
      "purged docs must leave the side table with the fold")
    // ...while untouched docs still match through the folded layout
    assert(MinhashIndex.exactIncrementalPairs(spark,
      oneDocProbe(30L, 901L), name, 0.5).count() == 1)
  }

  test("compaction regrows the side-table geometry once rows outgrow the target, and the probe follows the recorded width") {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val name = s"epp_grow_$tag"
    MinhashIndex.build(spark, docs(1L to 200L), name, exactProbe = true)
    val before = MinhashIndex
      .exactIncrementalPairs(spark, oneDocProbe(7L, 900L), name, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSeq
    assert(before.nonEmpty)
    // a tiny rows-per-partition target forces the regrow this corpus
    // would otherwise only hit at hundreds of millions of rows
    MinhashIndex.compact(spark, name, sideRowsPerPart = 10L)
    val meta = graft.etl.IndexMeta.read(spark, name)
    val parts = meta("sh_p_parts").toInt
    assert(parts > 64, s"geometry must widen past the build default, got $parts")
    assert((parts & (parts - 1)) == 0, s"power-of-two widths only, got $parts")
    val grown = s"${name}_shingles_bysh_p$parts"
    assert(spark.catalog.tableExists(grown),
      "the regrown generation must serve under its width-suffixed name")
    assert(!spark.catalog.tableExists(s"${name}_shingles_bysh"),
      "the retired build-geometry generation must be swept after the flip")
    // probe rows identical across the regrow; scan follows the NEW width
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    val probed = MinhashIndex
      .exactIncrementalPairs(noAqe, oneDocProbe(7L, 900L), name, 0.5)
    val after = probed.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9))).toSeq
    assert(after == before, s"regrow must not change probe rows: $after vs $before")
    val plan = probed.queryExecution.executedPlan match {
      case aq: AdaptiveSparkPlanExec => aq.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table.contains(s"bysh_p$parts")) => f
    }
    assert(scans.nonEmpty, "the probe must read the regrown generation")
    val scanned = scans.map(_.selectedPartitions.partitionCount).sum
    val total = spark.sql(s"SHOW PARTITIONS $grown").count()
    assert(scanned > 0 && scanned < total,
      s"pruning must follow the recorded geometry: read $scanned of $total")
    // appends land in the regrown generation and stay probe-visible
    MinhashIndex.append(spark, docs(Seq(500L)), name, "g1")
    assert(MinhashIndex.exactIncrementalPairs(spark,
      oneDocProbe(500L, 901L), name, 0.5).count() == 1,
      "post-regrow appends must write the generation the pointer names")
  }

  test("a replayed append purges its partial side partition (exactly-once)") {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val name = s"epp_replay_$tag"
    MinhashIndex.build(spark, docs(1L to 20L), name, exactProbe = true)
    MinhashIndex.append(spark, docs(Seq(21L)), name, "b1")
    val before = spark.table(s"${name}_shingles_bysh")
      .filter($"doc_id" === 21L).count()
    assert(before > 0, "the append must land side rows")
    // a replay of the SAME batch id is a logged no-op — rows unchanged
    MinhashIndex.append(spark, docs(Seq(21L)), name, "b1")
    assert(spark.table(s"${name}_shingles_bysh")
      .filter($"doc_id" === 21L).count() == before,
      "a replayed append must not duplicate side rows")
  }
}
