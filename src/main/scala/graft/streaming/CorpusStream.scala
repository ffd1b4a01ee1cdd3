package graft.streaming

import graft.operators.{CorpusPipeline, CorpusPrepOps, DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming corpus curation — the lambda-architecture split of
  * [[graft.operators.CorpusPipeline]] for continuously-arriving documents:
  *
  *  - per-row stages run in every micro-batch with NO state: quality
  *    flags, repetition flags (the aggregation-free forms in
  *    [[CorpusPrepOps]] — same values as the batch groupBy forms,
  *    spec-checked), and the PII scrub;
  *  - exact dedup is the one STATEFUL stage: first-seen-wins on the
  *    content fingerprint via the [[StreamingIngest.dedupStream]] state
  *    store — the only semantic difference from batch curation, which
  *    keeps the minimum doc_id. Same-FINGERPRINT copies (byte-identical
  *    or differing only in case/whitespace) share every per-row flag
  *    because all flags are computed over [[CorpusPipeline.normText]] —
  *    the text the fingerprint hashes — so the surviving fingerprint SET
  *    is identical to batch (spec-checked, including a whitespace-variant
  *    copy);
  *  - the corpus-JOIN stages — benchmark decontamination and minhash
  *    near-dup — need a corpus-wide index and deliberately stay in the
  *    periodic batch compaction pass over the accumulated silver table
  *    ([[graft.operators.CorpusPipeline.curate]]).
  */
object CorpusStream {

  /** Apply the stateless stages + stateful exact dedup to a streaming
    * documents frame (same schema as the `documents` table). Output is
    * append-mode safe. */
  def curateStream(docs: DataFrame,
      t: CorpusPipeline.Thresholds = CorpusPipeline.Thresholds()): DataFrame = {
    val norm = CorpusPipeline.normText(col("text"))
    val nTokens = size(col("__toks")).cast(LongType)
    val nPunct = length(regexp_replace(col("__norm"), "[a-z0-9 ]", ""))
    val flagged = docs
      .withColumn("__norm", norm)
      .withColumn("__toks", DedupOps.tokens(col("text")))
      .withColumn("__grams", CorpusPrepOps.gramsOf(col("__toks")))
      .withColumn("__q_ok",
        nTokens >= t.minTokens &&
          (nPunct / length(col("__norm"))) <= t.maxPunctRatio)
      .withColumn("__rep_ok", coalesce(
        CorpusPrepOps.dupTokenFrac(col("__toks")) <= t.maxDupTokenFrac &&
          CorpusPrepOps.top2gramFrac(col("__grams")) <= t.maxTop2gramFrac,
        lit(false)))
      .filter(col("__q_ok") && col("__rep_ok"))
      // fingerprint the ORIGINAL (normalized) text (matching batch), scrub after
      .withColumn("__fp", md5(col("__norm")))
      .withColumn("text", TextOps.scrubPii(col("text")))
    val recSchema = org.apache.spark.sql.types.StructType(
      docs.schema.fields)
    implicit val rowEnc = Encoders.row(recSchema)
    implicit val pairEnc = Encoders.tuple(Encoders.STRING, rowEnc)
    val keyed = flagged
      .select(col("__fp"),
        struct(docs.columns.map(col): _*).as("rec"))
      .as[(String, Row)](pairEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .mapValues(_._2)(rowEnc)
    StreamingIngest.dedupStream(keyed)(Encoders.STRING, rowEnc, pairEnc)
      .toDF("fp", "rec")
      .select(col("rec.*"))
  }
}
