package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape audits: the scale claims — pushdown, column pruning,
  * broadcast dims — as regression tests over executed plans. AQE is
  * disabled per test so the tree is flat (query-stage wrappers hide
  * their subplans from TreeNode.collect); the audited shapes — scan
  * pushdown, broadcast selection — are decided before AQE anyway. */
class PlanAuditSpec extends SparkSpec {

  private def executed(name: String) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("date filter is pushed to the parquet scan and columns are pruned (P4)") {
    val scans = executed("p4_date_between")
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_ != "[]")),
      "expected non-empty PushedFilters on the scan")
    assert(scans.forall(f => f.requiredSchema.size < f.relation.dataSchema.size),
      "scan must read a strict subset of the table's columns")
  }

  test("fact-dim join broadcasts the dim side (J1)") {
    val plan = executed("j1_inner_equi_join")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected BroadcastHashJoin in:\n$plan")
  }

  test("decontamination broadcasts the benchmark shingle side (cp)") {
    val plan = executed("cp_decontaminate")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected the eval shingle set to broadcast in:\n$plan")
  }

  test("shard packing keeps the global window off the corpus-sized path (cp)") {
    val plan = executed("cp_pack_shards")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    // any unpartitioned (single-task) window must consume the per-bucket
    // AGGREGATE, never per-document rows
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.isDefined, s"unpartitioned window over non-aggregated input:\n$w")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "per-document running sum must be a partitioned window")
  }

  test("keyset pagination pushes the cursor predicate to the parquet scan (O7)") {
    val scans = executed("o7_keyset_pagination")
      .collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.metadata.get("PushedFilters")
      .exists(_.contains("c_acctbal"))),
      "the seek predicate must reach the scan — that's what makes page N cost page 1")
  }

  test("vocab top-K plans as distributed TakeOrdered, not a full global sort (cp)") {
    val plan = executed("cp_vocab_topk")
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected TakeOrderedAndProject for the top-K in:\n$plan")
  }

  test("weighted sampling is stateless scan keys + a top-k heap, zero shuffles (cp)") {
    val plan = executed("cp_weighted_sample")
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected TakeOrderedAndProject for the sample top-k in:\n$plan")
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"the min-of-w keys are per-row scan expressions — nothing " +
      s"may shuffle before the heap:\n$plan")
  }

  test("dim filter seeds dynamic partition pruning on the year-partitioned fact (s20)") {
    val plan = executed("s20_dpp_join")
    assert(plan.toString.contains("dynamicpruning"),
      s"expected a runtime partition-pruning subquery on the fact scan in:\n$plan")
  }

  test("bucketed fact-fact join + join-key agg run with zero hash exchanges (j12)") {
    val plan = executed("j12_bucketed_join")
    val hashShuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashShuffles.isEmpty,
      s"bucketed join + bucket-key agg must not hash-shuffle (the shuffle " +
        s"was paid at write time); only the presentation sort's range " +
        s"exchange is allowed:\n$plan")
  }

  test("decomposed OR-join runs as shuffled equi-joins, never a nested loop (J2 scale)") {
    val plan = executed("j2_scale_or_join")
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"BNLJ found in:\n$plan")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.size == 2, s"expected both OR branches as shuffled hash joins in:\n$plan")
  }

  test("semantic dedup derives LSH buckets once, self-join reads the reused exchange (sim)") {
    // The plane-dot stage is the expensive scalar; a regression to
    // per-side recomputation doubles it (measured 2x at sf0.1). Audited
    // on the pair stage directly — the full query resolves tiny graphs
    // on the driver, which hides the pair pipeline's plan.
    val df = graft.operators.SimilarityOps.semanticPairs(spark,
      graft.core.T(spark, sf0001, "embeddings"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val i = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (i >= 0) plan.substring(0, i) else plan
    assert("ReusedExchange".r.findAllIn(finalPlan).nonEmpty,
      s"bucket exchange not reused:\n$finalPlan")
    assert("plane_buckets".r.findAllIn(finalPlan).length <= 1,
      "buckets must be computed by ONE native expression site")
  }

  test("repeated passages: equi-joins only, islands window always pair-partitioned (dd)") {
    val plan = executed("dd_repeated_passages")
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"nested-loop join found in:\n$plan")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"cartesian product found in:\n$plan")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the gaps-and-islands window must be (pair, diagonal)-partitioned — " +
        "a global window here would serialize the whole pair set")
  }

  test("MoR delete read: the anti-join broadcasts the tuple set, scan side never shuffles (s16)") {
    val plan = executed("s16_mor_delete_read")
    val antis = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antis.nonEmpty,
      s"pending equality deletes must apply as a BROADCAST left-anti " +
        s"join — a shuffled anti-join moves the whole table for a " +
        s"dimension-sized delete set:\n$plan")
    // stronger form: no hash-partitioned shuffle at all — the read is
    // scan → broadcast-anti → (range) sort; only the presentation
    // sort's range exchange may move rows
    val hashShuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashShuffles.isEmpty,
      s"MoR read must not hash-shuffle the table for its anti-join:\n$plan")
  }

  test("temperature mix: per-source probabilities reach the corpus via broadcast (cp)") {
    // the two scalar crossJoins (Σ√n, budget) are single-row broadcasts —
    // the house-approved shape; the per-source probs table must join the
    // corpus as a BroadcastHashJoin, never shuffling the documents on
    // source
    val plan = executed("cp_temperature_mix")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected the probs side to broadcast in:\n$plan")
  }

  test("boilerplate coverage: broadcast dictionary, no raw window/sort on the gram key (dd)") {
    // Round-6 shape (the round-5 window form owned a reducer per
    // universal gram): the corpus IS window-extracted twice — dictionary
    // derivation + probe, the inverted-index trade — but position rows
    // must reach the shared-gram dictionary via BROADCAST, and no Window
    // operator or gram-keyed sort over raw position rows may exist.
    val df = SparkEntry.queries("dd_boilerplate_ngrams")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val initialIdx = plan.indexOf("== Initial Plan ==")
    val finalPlan =
      if (initialIdx >= 0) plan.substring(0, initialIdx) else plan
    val windowExplodes =
      "Generate explode\\(sequence\\(0,".r.findAllIn(finalPlan).length
    assert(windowExplodes == 2,
      s"expected dictionary + probe extraction (2 explodes), found $windowExplodes in:\n$finalPlan")
    assert(!finalPlan.contains("Window "),
      "no window function may consume gram-partitioned position rows")
    assert(finalPlan.contains("BroadcastHashJoin"),
      "the shared-gram dictionary must join via broadcast")
  }

  test("prefix join: equi-joins only, per-doc rank window, pair-sized verify (dd)") {
    val plan = executed("dd_prefix_filter_join")
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"nested-loop join found in:\n$plan")
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"cartesian product found in:\n$plan")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the prefix rank window must be per-doc partitioned — a global " +
        "window would serialize the shingle table")
    // the verify is one array_intersect per pair (a projection), never a
    // pairs × elements re-join: after the candidate distinct, no further
    // explode may appear (the only Generates are shingle extraction)
    val gens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.size <= 3,
      s"expected only shingle-extraction explodes, found ${gens.size}")
  }

  test("media windowing: per-doc windows, never single-partition (mm)") {
    Seq("mm_voice_segments", "mm_shot_boundaries").foreach { q =>
      val plan = executed(q)
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
        s"$q: every window must be doc-partitioned:\n$plan")
    }
  }

  test("grouping sets: one Expand, one scan (a18)") {
    val plan = executed("a18_grouping_sets")
    val expands = plan.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e }
    assert(expands.size == 1,
      s"three grains must share ONE Expand pass, found ${expands.size}:\n$plan")
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.size == 1, s"one scan must feed all grains, got ${scans.size}")
  }

  test("heavy hitters: the MG aggregate plans into ObjectHashAggregate with a partial stage (ta)") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val toks = graft.core.T(spark, sf0001, "documents")
        .select(explode(graft.operators.DedupOps.tokens(col("text"))).as("token"))
      val df = toks.agg(graft.functions.HeavyHittersAggregate
        .heavyHitters(spark, col("token"), 63))
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val aggs = plan.collect {
        case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o }
      assert(aggs.size >= 2,
        s"expected partial + final ObjectHashAggregate stages (map-side " +
          s"truncation is the point), got ${aggs.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
