package graft.operators

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-corpus curation — the composition the individual
  * dedup/text operators exist for: fingerprint-exact dedup → quality
  * filters → near-dup removal (MinHash-LSH) → curated corpus + a
  * per-stage attrition report.
  *
  * Shape at 100 TB: every stage is a keyed shuffle or a bucket join over
  * hashes/shingle rows (never full documents); the near-dup stage drops
  * the HIGHER doc_id of each surviving pair so the pass is deterministic
  * and one-sided (no iterative connected components needed for the
  * common pair-dominated case).
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

  /** Stage 3: near-dup removal — drop doc_b of every MinHash-verified
    * pair (keep the lower id). */
  def nearDupFilter(s: SparkSession, docs: DataFrame, t: Thresholds): DataFrame = {
    val drop = DedupOps.minhashNearDups(s, docs, threshold = t.nearDupJaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Full pipeline; returns (curated corpus, attrition report). */
  def curate(s: SparkSession, docs: DataFrame,
      t: Thresholds = Thresholds()): (DataFrame, DataFrame) = {
    import s.implicits._
    val s0 = docs.count()
    val d1 = exactDedup(docs)
    val s1 = d1.count()
    val d2 = qualityFilter(d1, t)
    val s2 = d2.count()
    val d3 = nearDupFilter(s, d2, t)
    val s3 = d3.count()
    val report = Seq(
      ("input", s0), ("exact_dedup", s1),
      ("quality_filter", s2), ("near_dup", s3))
      .toDF("stage", "n_docs")
    (d3, report)
  }

  /** The pipeline as a declared query: per-stage counts (rows-only —
    * stage 3 embeds MinHash, which SQL can't express). */
  private val curateQuery = QueryDef(
    "corpus_curation_report",
    None,
    (s, dir) => curate(s, T(s, dir, "documents"))._2)

  val defs: Seq[QueryDef] = Seq(curateQuery)
}
