package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-corpus curation — the composition the individual
  * dedup/text operators exist for: fingerprint-exact dedup → quality
  * filters → near-dup removal (MinHash-LSH) → curated corpus + a
  * per-stage attrition report.
  *
  * Shape at 100 TB: every stage is a keyed shuffle or a bucket join over
  * hashes/shingle rows (never full documents); the near-dup stage
  * resolves TRANSITIVE clusters (A~B, B~C ⇒ {A,B,C} is one cluster) via
  * distributed star contraction and keeps exactly one document — the
  * minimum doc_id — per cluster, so chains can't leave
  * B-dropped-but-C-kept inconsistencies ([[ConnectedComponents]]).
  */
object CorpusPipeline {

  final case class Thresholds(
      minTokens: Long = 10,
      maxPunctRatio: Double = 0.30,
      nearDupJaccard: Double = 0.5)

  /** Stage 1: exact dedup on the normalized-text fingerprint. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val fp = md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
    val keepers = docs
      .groupBy(fp.as("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(keepers, Seq("doc_id"), "left_semi")
  }

  /** Stage 2: mechanical quality filters (token count, punctuation). */
  def qualityFilter(docs: DataFrame, t: Thresholds): DataFrame = {
    val nTokens = size(split(trim(col("text")), "\\s+")).cast(LongType)
    val nPunct = length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", ""))
    docs
      .withColumn("__n_tokens", nTokens)
      .withColumn("__punct_ratio", nPunct / length(col("text")))
      .filter(col("__n_tokens") >= t.minTokens &&
        col("__punct_ratio") <= t.maxPunctRatio)
      .drop("__n_tokens", "__punct_ratio")
  }

  /** Stage 3: near-dup removal — resolve MinHash pairs into connected
    * components and keep one doc per component (the minimum doc_id);
    * docs in no pair pass through untouched. `hashFn` defaults to the
    * production xxhash64; the declared query passes the oracle-portable
    * hash so DuckDB can replay the whole pipeline. */
  def nearDupFilter(s: SparkSession, docs: DataFrame, t: Thresholds,
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))): DataFrame = {
    val drop = DedupOps
      .minhashComponents(s, docs, threshold = t.nearDupJaccard, hashFn = hashFn)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Full pipeline; returns (curated corpus, attrition report).
    *
    * Two actions total, not one per stage: stages 1–2 are per-row flags
    * (keeper-of-fingerprint via one window, quality predicates), so their
    * attrition counts come from ONE conditional aggregate over a single
    * corpus pass; the surviving corpus (small after filtering) is
    * persisted before the MinHash stage, which consumes it three times.
    * The persisted stage-2 frame is unpersisted before returning — the
    * returned curated frame stays valid (it recomputes if acted on; the
    * report rows are already materialized literals). */
  def curate(s: SparkSession, docs: DataFrame,
      t: Thresholds = Thresholds(),
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))): (DataFrame, DataFrame) = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val keeper = row_number().over(
      Window.partitionBy(col("__fp")).orderBy(col("doc_id"))) === 1
    val nTokens = size(split(trim(col("text")), "\\s+")).cast(LongType)
    val nPunct = length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", ""))
    val qualityOk = col("__n_tokens") >= t.minTokens &&
      (col("__n_punct") / length(col("text"))) <= t.maxPunctRatio
    val flagged = docs
      .withColumn("__fp", md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .withColumn("__n_tokens", nTokens)
      .withColumn("__n_punct", nPunct)
      .withColumn("__keeper", keeper)
      .withColumn("__q_ok", qualityOk)
    val row = flagged.agg(
      count(lit(1)).as("s0"),
      sum(when(col("__keeper"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("__keeper") && col("__q_ok"), 1L).otherwise(0L)).as("s2")).head()
    val (s0, s1, s2) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val d2 = flagged.filter(col("__keeper") && col("__q_ok"))
      .select(docs.columns.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d3 = nearDupFilter(s, d2, t, hashFn)
    val s3 = d3.count()
    d2.unpersist(blocking = false)
    val report = Seq(
      ("input", s0), ("exact_dedup", s1),
      ("quality_filter", s2), ("near_dup", s3))
      .toDF("stage", "n_docs")
    (d3, report)
  }

  /** DuckDB replay of the WHOLE pipeline's attrition report: exact-dedup
    * keepers, quality predicates, then the generated minhash-pair CTEs
    * ([[DedupOps.minhashCtes]]) over the filtered corpus and the
    * recursive component closure — near_dup survivors = quality-filtered
    * docs minus non-representative component members. Rows ordered by
    * stage name (the declared query sorts the same way). */
  private def curationOracle(t: Thresholds): String =
    s"""
      WITH RECURSIVE keepers AS (
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))),
      d1 AS (
        SELECT d.* FROM documents d JOIN keepers USING (doc_id)),
      d2 AS (
        SELECT * FROM d1
        WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= ${t.minTokens}
          AND length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
              / length(text) <= ${t.maxPunctRatio}),
      ${DedupOps.minhashCtes(t.nearDupJaccard, 32, 8, src = "d2")},
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs),
      walk(node, reach) AS (
        SELECT a, a FROM edges
        UNION
        SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.reach),
      comp AS (
        SELECT node, MIN(reach) AS component FROM walk GROUP BY node)
      SELECT stage, n_docs FROM (
        SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS n_docs
        UNION ALL
        SELECT 'exact_dedup', (SELECT COUNT(*) FROM d1)
        UNION ALL
        SELECT 'quality_filter', (SELECT COUNT(*) FROM d2)
        UNION ALL
        SELECT 'near_dup',
          (SELECT COUNT(*) FROM d2)
            - (SELECT COUNT(*) FROM comp WHERE node <> component))
      ORDER BY stage"""

  /** The pipeline as a declared query: per-stage counts, hash-matched
    * against the generated DuckDB replay above. Verify runs the
    * oracle-portable hash; Bench measures the production xxhash64 path. */
  private val curateQuery = QueryDef(
    "corpus_curation_report",
    Some(curationOracle(Thresholds())),
    (s, dir) => curate(s, T(s, dir, "documents"),
      hashFn = DedupOps.portableSeededHash)._2.orderBy(col("stage")),
    benchBuild = Some((s, dir) =>
      curate(s, T(s, dir, "documents"))._2.orderBy(col("stage"))))

  val defs: Seq[QueryDef] = Seq(curateQuery)
}
