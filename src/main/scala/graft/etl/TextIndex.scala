package graft.etl

import graft.operators.{DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Persisted inverted text index — the search-serving artifact for BM25
  * retrieval, so per-query probes never re-tokenize the corpus (the same
  * offline-index/online-probe split [[MinhashIndex]] gives near-dup
  * checks and [[LshIndex]] gives ANN). Three tables:
  *
  *  - `<name>_postings(token, doc_id, tf)` bucketed by token — the
  *    inverted index. A query's terms prune to their buckets; the scan
  *    reaches both the document-frequency aggregate and the scoring
  *    join with ZERO exchange on the corpus side (token bucketing IS
  *    hash distribution by token, so the `groupBy(token)` needs no
  *    shuffle; TextIndexSpec asserts the executed plan).
  *  - `<name>_doclens(doc_id, dl)` bucketed by doc_id — BM25 length
  *    normalization. One row per corpus doc is NOT driver-small at
  *    100 TB, so it joins (candidate side shuffles to the bucketing;
  *    the corpus side is read in place), never broadcasts.
  *  - `<name>_stats(n_docs, avgdl)` — one row, computed with the exact
  *    arithmetic the recompute path uses (integer token sum, one double
  *    division) so served scores are bit-identical to recomputed ones.
  *
  * At 100 TB: probe cost is O(matching postings), not O(corpus) — the
  * index read is pruned to the query's terms by pushed filters and
  * bucket pruning, and nothing corpus-sized ever shuffles. Maintenance
  * is the usual trade: [[build]] is the offline rebuild; per-batch
  * append would add (token, doc_id, tf) rows for accepted docs and fold
  * the stats row, the [[MinhashIndex.append]] shape.
  */
object TextIndex {

  final case class Tables(postings: String, doclens: String, stats: String)

  def tables(name: String): Tables =
    Tables(s"${name}_postings", s"${name}_doclens", s"${name}_stats")

  /** Full rebuild over `corpus` (must carry doc_id, text). */
  def build(s: SparkSession, corpus: DataFrame, name: String,
      nBuckets: Int = 32): Tables = {
    val t = tables(name)
    Seq(t.postings, t.doclens, t.stats).foreach(MinhashIndex.dropTable(s, _))
    val tf = corpus
      .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.select(col("token"), col("doc_id"), col("tf"))
      .repartition(nBuckets, col("token"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "token").sortBy("token")
      .format("parquet").saveAsTable(t.postings)
    // doc lengths from the STORED postings so the artifacts stay
    // consistent even under a non-deterministic corpus frame
    val dl = s.table(t.postings)
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    dl.repartition(nBuckets, col("doc_id"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(t.doclens)
    // EXACTLY the recompute path's arithmetic: integer sum, one division
    s.table(t.doclens)
      .agg(
        (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"),
        count(lit(1)).as("n_docs"))
      .write.mode("overwrite").format("parquet").saveAsTable(t.stats)
    t
  }

  /** Incremental refresh: index `newDocs` without touching the existing
    * postings — the per-batch maintenance job ([[MinhashIndex.append]]
    * shape). Postings and doc lengths append with the same bucket spec,
    * so readers keep the bucketed distribution and probes stay
    * corpus-exchange-free; the stats row is recomputed from the doclens
    * table (one scan of a doc-count-sized frame, exact arithmetic —
    * NEVER folded incrementally, which would change the division's
    * operands and break bit-parity with the recompute path). Caller
    * contract: `newDocs` must not already be indexed and the append must
    * run exactly once per accepted batch — drive it from a committed
    * batch log; a blind re-run duplicates postings. */
  def append(s: SparkSession, newDocs: DataFrame, name: String,
      nBuckets: Int = 32): Unit = {
    val t = tables(name)
    val tf = newDocs
      .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist() // feeds two appends; small (batch-sized)
    try {
      tf.select(col("token"), col("doc_id"), col("tf"))
        .repartition(nBuckets, col("token"))
        .write.mode("append")
        .bucketBy(nBuckets, "token").sortBy("token")
        .format("parquet").saveAsTable(t.postings)
      tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
        .repartition(nBuckets, col("doc_id"))
        .write.mode("append")
        .bucketBy(nBuckets, "doc_id").sortBy("doc_id")
        .format("parquet").saveAsTable(t.doclens)
    } finally tf.unpersist(blocking = false)
    s.table(t.doclens)
      .agg(
        (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"),
        count(lit(1)).as("n_docs"))
      .write.mode("overwrite").format("parquet").saveAsTable(t.stats)
  }

  /** BM25 top-k served from the index — value-identical to
    * [[TextOps.bm25]] recomputed over the corpus (TextIndexSpec asserts
    * row-for-row equality; the declared query's oracle replays the
    * recompute form). */
  def search(s: SparkSession, name: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val t = tables(name)
    val post = s.table(t.postings).filter(col("token").isin(queryTerms: _*))
    val df = post.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = post
      .join(broadcast(df), "token")
      .join(s.table(t.doclens), "doc_id")
      .crossJoin(broadcast(s.table(t.stats)))
      .select(col("doc_id"), col("token"),
        TextOps.bm25ScoreExpr(col("tf"), col("df"), col("dl"),
          col("n_docs"), col("avgdl"), k1, b).as("score"))
    TextOps.bm25Rank(scored, topK)
  }
}
