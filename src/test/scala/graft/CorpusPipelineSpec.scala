package graft

import graft.core.T
import graft.operators.CorpusPipeline

class CorpusPipelineSpec extends SparkSpec {

  test("curation stages are monotonically non-increasing and drop near-dups") {
    val (curated, report) = CorpusPipeline.curate(
      spark, T(spark, sf0001, "documents"))
    val counts = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("input") == 500)
    assert(counts("input") >= counts("exact_dedup"))
    assert(counts("exact_dedup") >= counts("quality_filter"))
    assert(counts("quality_filter") > counts("near_dup"),
      "the corpus has planted near-dups; stage 3 must drop some")
    assert(curated.count() == counts("near_dup"))
  }

  test("one-pass flag counts agree with the composable stage functions") {
    val docs = T(spark, sf0001, "documents")
    val (_, report) = CorpusPipeline.curate(spark, docs)
    val counts = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d1 = CorpusPipeline.exactDedup(docs)
    assert(counts("exact_dedup") == d1.count())
    assert(counts("quality_filter") ==
      CorpusPipeline.qualityFilter(d1, CorpusPipeline.Thresholds()).count())
  }

  test("curation is idempotent: curating the curated corpus is a no-op on near-dups") {
    val (curated, _) = CorpusPipeline.curate(spark, T(spark, sf0001, "documents"))
    val (again, report2) = CorpusPipeline.curate(spark, curated)
    val counts = report2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("input") == counts("near_dup"), "no further attrition")
    assert(again.count() == curated.count())
  }
}
