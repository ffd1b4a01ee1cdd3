package graft

import graft.etl.MinhashIndex
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** The EXACT cross-batch probe (`MinhashIndex.exactIncrementalPairs`,
  * the `s26_ingest_e2e_fuzzy` candidate stage): (a) row-for-row equal
  * to the brute-force all-pairs shingle join — the completeness claim
  * (any qualifying pair shares ≥ 1 shingle, so the shared-shingle
  * candidates have zero false negatives at any τ); (b) a superset of
  * the banded probe's pairs at the same τ (banding may miss, exact may
  * not); (c) the corpus side is read in place — the batch's shingle
  * rows ride a broadcast, so no index-table scan crosses a shuffle. */
class ExactProbeSpec extends SparkSpec {
  import spark.implicits._

  private val isNew = col("doc_id") % 10 === 0
  private val tau = 0.5

  test("exact probe = brute all-pairs; superset of banded; corpus in place") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val corpus = docs.filter(!isNew)
    val batch = docs.filter(isNew)
    try {
      MinhashIndex.build(spark, corpus, "xp_idx")
      val probe = MinhashIndex.exactIncrementalPairs(spark, batch, "xp_idx", tau)
      val got = probe.collect().toSeq
      assert(got.nonEmpty, "probe found no pairs — vacuous test")

      // (a) the brute-force all-pairs recompute (no candidate filter at all)
      val shOld = DedupOps.shingleRows(corpus)
      val shNew = DedupOps.shingleRows(batch)
      val brute = shOld.select($"doc_id".as("doc_old"), $"shingle")
        .join(shNew.select($"doc_id".as("doc_new"), $"shingle"), "shingle")
        .groupBy($"doc_old", $"doc_new").agg(count(lit(1)).as("n_inter"))
        .join(shOld.groupBy($"doc_id".as("doc_old")).agg(count(lit(1)).as("n_old")),
          "doc_old")
        .join(shNew.groupBy($"doc_id".as("doc_new")).agg(count(lit(1)).as("n_new")),
          "doc_new")
        .select($"doc_old", $"doc_new",
          ($"n_inter" / ($"n_old" + $"n_new" - $"n_inter")).as("jaccard"))
        .filter($"jaccard" >= tau)
      assert(got.toSet == brute.collect().toSeq.toSet,
        "exact probe must equal the unfiltered all-pairs join")

      // (b) recall: every banded pair is an exact pair (never vice-versa
      // guaranteed — banding is the lossy rung)
      val banded = MinhashIndex.incrementalPairs(spark, batch, "xp_idx", tau)
        .collect().toSeq.toSet
      assert(banded.subsetOf(got.toSet),
        "banded pairs must be a subset of the exact pairs")

      // (c) plan shape: AQE off; the explicit broadcast hint keeps the
      // batch side broadcast, so both index-table scans (shingles,
      // sizes) reach their first join without crossing a shuffle
      withConf("spark.sql.adaptive.enabled" -> "false") {
        val p = MinhashIndex.exactIncrementalPairs(spark, batch, "xp_idx", tau)
        PlanChecks.assertCorpusInPlace(p, "xp_idx", expectedScans = 2)
        assert(p.collect().toSeq.toSet == got.toSet)
      }
    } finally
      Seq("xp_idx_banded", "xp_idx_shingles", "xp_idx_sizes")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
