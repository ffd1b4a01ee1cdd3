package graft

import graft.core.T
import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curation stages are monotonically non-increasing and drop near-dups") {
    val (curated, report) = CorpusPipeline.curate(
      spark, T(spark, sf0001, "documents"))
    val counts = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("input") == 500)
    assert(counts("input") >= counts("decontamination"))
    assert(counts("decontamination") >= counts("exact_dedup"))
    assert(counts("exact_dedup") >= counts("quality_filter"))
    assert(counts("quality_filter") >= counts("repetition_filter"))
    assert(counts("repetition_filter") > counts("near_dup"),
      "the corpus has planted near-dups; the near-dup stage must drop some")
    assert(counts("pii_scrubbed") <= counts("near_dup"))
    assert(curated.count() == counts("near_dup"))
  }

  test("one-pass flag counts agree with the composable stage functions") {
    val docs = T(spark, sf0001, "documents")
    val t = CorpusPipeline.Thresholds()
    val (_, report) = CorpusPipeline.curate(spark, docs)
    val counts = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d0 = CorpusPipeline.decontaminationFilter(docs, t)
    assert(counts("decontamination") == d0.count())
    val d1 = CorpusPipeline.exactDedup(d0)
    assert(counts("exact_dedup") == d1.count())
    val d2 = CorpusPipeline.qualityFilter(d1, t)
    assert(counts("quality_filter") == d2.count())
    assert(counts("repetition_filter") == CorpusPipeline.repetitionFilter(d2, t).count())
  }

  test("curation is idempotent: curating the curated corpus is a no-op on near-dups") {
    val (curated, _) = CorpusPipeline.curate(spark, T(spark, sf0001, "documents"))
    val (again, report2) = CorpusPipeline.curate(spark, curated)
    val counts = report2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("input") == counts("near_dup"), "no further attrition")
    assert(again.count() == curated.count())
  }

  test("curate reports zeros, not NPE, when thresholds drop every document") {
    val t = CorpusPipeline.Thresholds(minTokens = 1000000)
    val (curated, report) = CorpusPipeline.curate(
      spark, T(spark, sf0001, "documents").limit(20), t)
    val counts = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("quality_filter") == 0)
    assert(counts("near_dup") == 0)
    assert(counts("pii_scrubbed") == 0)
    assert(curated.count() == 0)
  }

  test("curated corpus text is PII-scrubbed and the report counts affected docs") {
    // fabricate a corpus with PII in one surviving doc
    val docs = T(spark, sf0001, "documents").limit(50)
      .withColumn("text",
        when($"doc_id" === 1, concat($"text", lit(" contact bob@example.com now")))
          .otherwise($"text"))
    val (curated, report) = CorpusPipeline.curate(spark, docs)
    val counts = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val survived = curated.filter($"doc_id" === 1).collect()
    if (survived.nonEmpty) {
      assert(survived.head.getAs[String]("text").contains("<email>"))
      assert(!survived.head.getAs[String]("text").contains("bob@example.com"))
      assert(counts("pii_scrubbed") >= 1)
    } else assert(counts("pii_scrubbed") == 0)
  }

  test("feature snapshot: one row per doc, one keeper per dup group, keep implies keeper") {
    // the testdata corpus has near-dups but no EXACT dups — plant one: a
    // case/whitespace-mangled copy must land in the same fingerprint group
    val base = T(spark, sf0001, "documents")
    val docs = base.unionByName(
      base.filter($"doc_id" === 3)
        .withColumn("doc_id", lit(100001L))
        .withColumn("text", upper(concat(lit("  "), $"text"))))
    val snap = CorpusPipeline.featureSnapshot(docs).cache()
    try {
      assert(snap.count() == docs.count(), "one row per document")
      // every fingerprint group has exactly one keeper, and it is min(doc_id)
      val perGroup = snap.groupBy($"fingerprint")
        .agg(
          sum(when($"is_exact_keeper", 1L).otherwise(0L)).as("n_keepers"),
          count(lit(1)).as("n"),
          max($"dup_count").as("dc"), min($"dup_count").as("dc2"))
        .collect()
      assert(perGroup.forall(_.getAs[Long]("n_keepers") == 1L))
      assert(perGroup.forall(r =>
        r.getAs[Long]("dc") == r.getAs[Long]("n") &&
          r.getAs[Long]("dc2") == r.getAs[Long]("n")))
      assert(perGroup.exists(_.getAs[Long]("n") > 1L),
        "the corpus has planted exact dups; at least one group must show them")
      // keep decisions only ever select keepers
      assert(snap.filter($"keep" && !$"is_exact_keeper").isEmpty)
      // per-lang percentile is a true percent_rank: max 1.0, min 0.0 per lang
      val pr = snap.groupBy($"lang")
        .agg(min($"quality_pr").as("lo"), max($"quality_pr").as("hi"))
        .collect()
      assert(pr.forall(r => r.getAs[Double]("lo") == 0.0 && r.getAs[Double]("hi") == 1.0))
    } finally snap.unpersist()
  }

  test("feature snapshot plan: text never shuffles; two window exchanges only") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE off so EnsureRequirements' exchanges are visible in the tree
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try CorpusPipeline.featureSnapshot(T(spark, sf0001, "documents"))
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 2, s"expected the 2 window shuffles, got ${shuffles.size}")
    assert(shuffles.forall(!_.child.schema.fieldNames.contains("text")),
      "the text column must be projected away before any exchange")
  }
}
