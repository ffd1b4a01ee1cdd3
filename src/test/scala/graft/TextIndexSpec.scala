package graft

import graft.core.T
import graft.etl.TextIndex
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The persisted inverted index must answer BM25 queries exactly like
  * the corpus recompute, with the corpus-side tables read in place. */
class TextIndexSpec extends SparkSpec {

  private val terms = Seq("spark", "join", "window")

  test("served BM25 equals the corpus recompute row for row") {
    val docs = T(spark, sf0001, "documents")
    try {
      TextIndex.build(spark, docs, "tispec_idx")
      val served = TextIndex.search(spark, "tispec_idx", terms).collect().toSeq
      assert(served.nonEmpty, "search returned nothing — vacuous test")
      val recomputed = TextOps.bm25(docs, terms).collect().toSeq
      assert(served == recomputed,
        "served and recomputed BM25 must agree on rows AND order")

      // unknown terms: empty result, no error
      assert(TextIndex.search(spark, "tispec_idx", Seq("zzzznotaword")).isEmpty)

      // corpus tables never shuffle before their first join; the df
      // aggregate rides the token bucketing with no exchange at all
      withConf("spark.sql.adaptive.enabled" -> "false") {
        val p = TextIndex.search(spark, "tispec_idx", terms)
        PlanChecks.assertCorpusInPlace(p, "tispec_idx", expectedScans = 4)
        assert(p.collect().toSeq == served)
      }
    } finally
      Seq("tispec_idx_postings", "tispec_idx_doclens", "tispec_idx_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("append maintains the index: search equals full rebuild, still exchange-free") {
    val docs = T(spark, sf0001, "documents")
    val batch = col("doc_id") % 3 === 0
    try {
      TextIndex.build(spark, docs.filter(!batch), "tispec_app")
      TextIndex.append(spark, docs.filter(batch), "tispec_app", "b1")
      val appended = TextIndex.search(spark, "tispec_app", terms).collect().toSeq
      TextIndex.build(spark, docs, "tispec_full")
      val full = TextIndex.search(spark, "tispec_full", terms).collect().toSeq
      assert(appended.nonEmpty && appended == full,
        "appended index must answer exactly like a full rebuild")
      // a blind replay of the same batch is a no-op: row counts, the
      // stats row, and search results unchanged
      val counts = (spark.table("tispec_app_postings").count(),
        spark.table("tispec_app_doclens").count())
      TextIndex.append(spark, docs.filter(batch), "tispec_app", "b1")
      assert((spark.table("tispec_app_postings").count(),
        spark.table("tispec_app_doclens").count()) == counts,
        "a replayed append must not duplicate postings")
      assert(TextIndex.search(spark, "tispec_app", terms).collect().toSeq
        == appended)
      // stats refresh is stage-then-swap: search survives the one crash
      // window (stats dropped, staged copy present) by healing the swap
      spark.sql("DROP TABLE IF EXISTS tispec_app_stats__healtest")
      spark.sql(
        "CREATE TABLE tispec_app_stats__healtest AS SELECT * FROM tispec_app_stats")
      spark.sql("ALTER TABLE tispec_app_stats__healtest RENAME TO tispec_app_stats__new")
      spark.sql("DROP TABLE tispec_app_stats")
      assert(TextIndex.search(spark, "tispec_app", terms).collect().toSeq
        == appended, "search must heal an interrupted stats swap")
      assert(spark.catalog.tableExists("tispec_app_stats"),
        "healing must complete the rename")
      // bucketing survives the append
      withConf("spark.sql.adaptive.enabled" -> "false") {
        PlanChecks.assertCorpusInPlace(
          TextIndex.search(spark, "tispec_app", terms), "tispec_app",
          expectedScans = 4)
      }
    } finally
      Seq("tispec_app", "tispec_full").foreach { n =>
        Seq(s"${n}_postings", s"${n}_doclens", s"${n}_stats")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
  }
}
