package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-corpus curation — the composition the individual
  * dedup/text/corpus-prep operators exist for: benchmark decontamination →
  * fingerprint-exact dedup → quality filters → repetition filters
  * (Gopher-style) → near-dup removal (MinHash-LSH) → PII scrub → curated
  * corpus + a per-stage attrition report.
  *
  * Shape at 100 TB: every stage is a keyed shuffle or a bucket join over
  * hashes/shingle rows (never full documents); decontamination broadcasts
  * the (small) benchmark shingle set; the near-dup stage resolves
  * TRANSITIVE clusters (A~B, B~C ⇒ {A,B,C} is one cluster) via
  * distributed star contraction and keeps exactly one document — the
  * minimum doc_id — per cluster, so chains can't leave
  * B-dropped-but-C-kept inconsistencies ([[ConnectedComponents]]); the
  * PII scrub is pure map-side codegen.
  */
object CorpusPipeline {

  final case class Thresholds(
      minTokens: Long = 10,
      maxPunctRatio: Double = 0.30,
      nearDupJaccard: Double = 0.5,
      decontamN: Int = 5,
      maxDupTokenFrac: Double = 0.68,
      maxTop2gramFrac: Double = 0.09)

  /** The benchmark membership rule for the declared pipeline: in
    * production the eval set arrives as its own table; here a slice of
    * `documents` stands in for it. */
  val isEval: Column => Column = id => id % 97 === 0

  /** Stage 0: drop benchmark docs themselves AND train docs sharing an
    * n-gram with them ([[CorpusPrepOps.contaminatedIds]]). */
  def decontaminationFilter(docs: DataFrame, t: Thresholds): DataFrame = {
    val contam = CorpusPrepOps.contaminatedIds(docs, isEval, t.decontamN)
    docs.filter(!isEval(col("doc_id")))
      .join(contam, Seq("doc_id"), "left_anti")
  }

  /** Case/whitespace normalization — the SAME form the dedup fingerprint
    * hashes. Quality predicates are computed over THIS text (not the raw
    * bytes) so that same-fingerprint documents always share the same
    * quality decision — the invariant that keeps batch curation (keeper =
    * min doc_id per fingerprint) and streaming curation (first-seen-wins
    * after per-row filters) selecting the same fingerprint SET even when
    * copies differ in case or whitespace. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Stage 1: exact dedup on the normalized-text fingerprint. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val fp = md5(normText(col("text")))
    val keepers = docs
      .groupBy(fp.as("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(keepers, Seq("doc_id"), "left_semi")
  }

  /** Stage 2: mechanical quality filters (token count, punctuation) —
    * evaluated over [[normText]] so the decision is a pure function of
    * the dedup fingerprint (see normText's contract). */
  def qualityFilter(docs: DataFrame, t: Thresholds): DataFrame = {
    val norm = normText(col("text"))
    val nTokens = size(split(norm, " ")).cast(LongType)
    val nPunct = length(regexp_replace(norm, "[a-z0-9 ]", ""))
    docs
      .withColumn("__n_tokens", nTokens)
      .withColumn("__punct_ratio", nPunct / length(norm))
      .filter(col("__n_tokens") >= t.minTokens &&
        col("__punct_ratio") <= t.maxPunctRatio)
      .drop("__n_tokens", "__punct_ratio")
  }

  /** Stage 3: repetition filters — drop degenerate/boilerplate docs by
    * duplicate-token and top-2-gram fractions ([[CorpusPrepOps
    * .repetitionStats]]). Docs too short to have 2-grams fail closed. */
  def repetitionFilter(docs: DataFrame, t: Thresholds): DataFrame = {
    val rep = CorpusPrepOps.repetitionStats(docs)
      .filter(col("dup_token_frac") <= t.maxDupTokenFrac &&
        col("top_2gram_frac") <= t.maxTop2gramFrac)
      .select(col("doc_id"))
    docs.join(rep, Seq("doc_id"), "left_semi")
  }

  /** Stage 4: near-dup removal — resolve MinHash pairs into connected
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

  /** Full pipeline; returns (curated corpus — PII-scrubbed text — and the
    * attrition report).
    *
    * ONE pass over the flagged corpus, not two: decontamination,
    * keeper-of-fingerprint, quality, and repetition are all per-row
    * FLAGS (two id joins + one window), computed once into a persisted
    * narrow frame (doc columns + 4 booleans — the working columns
    * `__norm`/`__fp`/token counts are projected away before the cache).
    * The attrition-count aggregate is the action that FILLS that cache,
    * so the expensive contaminate+repetition+window subtree executes
    * exactly once; the stage-3 survivor frame and the MinHash stage (which
    * consumes it three times) then read cached rows. A previous round
    * tried to ride the counts on an `observe()`/CollectMetrics node
    * instead; that embedded the Observation in the RETURNED plan (acting
    * on the curated frame after unpersist re-drove a completed
    * observation and threw) and the non-blocking metric read lost the
    * race to the listener, firing the fallback aggregate anyway — the
    * driver measured it 24% SLOWER. Plain persist-then-aggregate has
    * neither problem. The final count + PII tally ride one aggregate over
    * the near-dup survivors. The persisted frame is unpersisted before
    * returning — the returned curated frame stays valid (it recomputes if
    * acted on; the report rows are already materialized literals). */
  def curate(s: SparkSession, docs: DataFrame,
      t: Thresholds = Thresholds(),
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))): (DataFrame, DataFrame) = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val contam = CorpusPrepOps.contaminatedIds(docs, isEval, t.decontamN)
      .withColumn("__contam", lit(true))
    val rep = CorpusPrepOps.repetitionStats(docs)
      .select(col("doc_id"), col("dup_token_frac"), col("top_2gram_frac"))
    val nTokens = size(split(col("__norm"), " ")).cast(LongType)
    val nPunct = length(regexp_replace(col("__norm"), "[a-z0-9 ]", ""))
    val qualityOk = col("__n_tokens") >= t.minTokens &&
      (col("__n_punct") / length(col("__norm"))) <= t.maxPunctRatio
    // keeper is chosen AMONG clean docs (the window partitions on the
    // clean flag too): if a dedup group's minimum doc_id was
    // decontaminated away, the next clean copy keeps the group alive —
    // matching the sequential composable stages exactly.
    val keeper = row_number().over(
      Window.partitionBy(col("__fp"), col("__clean"))
        .orderBy(col("doc_id"))) === 1
    val flagged = docs
      .join(contam, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .withColumn("__clean", !isEval(col("doc_id")) && col("__contam").isNull)
      .withColumn("__norm", normText(col("text")))
      .withColumn("__fp", md5(col("__norm")))
      .withColumn("__n_tokens", nTokens)
      .withColumn("__n_punct", nPunct)
      .withColumn("__keeper", keeper && col("__clean"))
      .withColumn("__q_ok", qualityOk)
      .withColumn("__rep_ok", coalesce(
        col("dup_token_frac") <= t.maxDupTokenFrac &&
          col("top_2gram_frac") <= t.maxTop2gramFrac, lit(false)))
    // Persist the flags NARROW (doc columns + the 4 booleans; the heavy
    // working columns — __norm is a whole normalized copy of the text —
    // are projected away first). One cached copy serves both the
    // attrition counts and the stage-3 survivor frame below.
    val flags = flagged
      .select(docs.columns.map(col) ++ Seq(
        col("__clean"), col("__keeper"), col("__q_ok"), col("__rep_ok")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sum over ZERO rows is null, not 0 — coalesce so an empty corpus (or
    // thresholds that drop everything) reports zeros instead of NPE-ing.
    // This aggregate is the action that fills the cache: the expensive
    // flagged subtree runs here, once; everything after reads cached rows.
    val row = flags.agg(
      count(lit(1)).as("s0"),
      coalesce(sum(when(col("__clean"), 1L).otherwise(0L)), lit(0L)).as("s1"),
      coalesce(sum(when(col("__keeper"), 1L).otherwise(0L)), lit(0L)).as("s2"),
      coalesce(sum(when(col("__keeper") && col("__q_ok"), 1L).otherwise(0L)),
        lit(0L)).as("s3"),
      coalesce(sum(when(col("__keeper") && col("__q_ok") && col("__rep_ok"), 1L)
        .otherwise(0L)), lit(0L)).as("s4"))
      .head()
    val (s0, s1, s2, s3, s4) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    val d2 = flags
      .filter(col("__keeper") && col("__q_ok") && col("__rep_ok"))
      .select(docs.columns.map(col): _*)
    val d3 = nearDupFilter(s, d2, t, hashFn)
    val finalRow = d3.agg(
      count(lit(1)).as("n"),
      coalesce(
        sum(when(TextOps.scrubPii(col("text")) =!= col("text"), 1L).otherwise(0L)),
        lit(0L)).as("n_pii")).head()
    val (s5, nPii) = (finalRow.getLong(0), finalRow.getLong(1))
    flags.unpersist(blocking = false)
    val report = Seq(
      ("input", s0), ("decontamination", s1), ("exact_dedup", s2),
      ("quality_filter", s3), ("repetition_filter", s4), ("near_dup", s5),
      ("pii_scrubbed", nPii))
      .toDF("stage", "n_docs")
    (d3.withColumn("text", TextOps.scrubPii(col("text"))), report)
  }

  /** The full corpus-to-training-data path in one call: curate (all six
    * stages), then pack the survivors into token-budget shards and write
    * them partitioned by shard_id ([[CorpusPrepOps.writeTrainingShards]]).
    * Returns (attrition report, per-shard summary — read back from the
    * written files). */
  def prepareTrainingData(s: SparkSession, docs: DataFrame, path: String,
      t: Thresholds = Thresholds(),
      budget: Long = CorpusPrepOps.shardBudget): (DataFrame, DataFrame) = {
    val (curated, report) = curate(s, docs, t)
    val shards = CorpusPrepOps.writeTrainingShards(curated, path, budget)
    (report, shards)
  }

  /** DuckDB replay of the WHOLE pipeline's attrition report:
    * decontamination ids (5-gram broadcast-join replay), exact-dedup
    * keepers among clean docs, quality + repetition predicates, then the
    * generated minhash-pair CTEs ([[DedupOps.minhashCtes]]) over the
    * filtered corpus and the recursive component closure — near_dup
    * survivors = repetition-filtered docs minus non-representative
    * component members — and the surviving-doc PII tally. Rows ordered by
    * stage name (the declared query sorts the same way). */
  private def curationOracle(t: Thresholds): String = {
    val scrubbed = TextOps.piiPatterns.foldLeft("text") { case (acc, (kind, p)) =>
      s"regexp_replace($acc, '$p', '<$kind>', 'g')"
    }
    s"""
      WITH RECURSIVE toks5 AS (
        SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      sh5 AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(generate_series(1, len(ws) - ${t.decontamN - 1}),
            i -> ${(0 until t.decontamN).map(k => s"ws[i+$k]").mkString(" || ' ' || ")})) AS shingle
        FROM toks5 WHERE len(ws) >= ${t.decontamN}),
      contam AS (
        SELECT DISTINCT t.doc_id FROM sh5 t JOIN sh5 e USING (shingle)
        WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0),
      cleaned AS (
        SELECT d.* FROM documents d
        WHERE d.doc_id % 97 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM contam)),
      keepers AS (
        SELECT MIN(doc_id) AS doc_id
        FROM cleaned
        GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))),
      d1 AS (
        SELECT d.* FROM cleaned d JOIN keepers USING (doc_id)),
      d2 AS (
        -- quality over the NORMALIZED text (toks5.ws is its token split),
        -- mirroring qualityFilter's normText contract
        SELECT d1.* FROM d1 JOIN toks5 USING (doc_id)
        WHERE len(ws) >= ${t.minTokens}
          AND length(regexp_replace(array_to_string(ws, ' '), '[a-z0-9 ]', '', 'g'))
              / length(array_to_string(ws, ' ')) <= ${t.maxPunctRatio}),
      reptok AS (SELECT doc_id, unnest(ws) AS tk FROM toks5),
      repts AS (
        SELECT doc_id, count(*) AS n_tok, count(DISTINCT tk) AS nd_tok
        FROM reptok GROUP BY doc_id),
      repgrams AS (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, len(ws) - 1),
            i -> ws[i] || ' ' || ws[i+1])) AS gram
        FROM toks5 WHERE len(ws) >= 2),
      repgc AS (SELECT doc_id, gram, count(*) AS c FROM repgrams GROUP BY doc_id, gram),
      repgs AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS ng, max(c) AS topg
        FROM repgc GROUP BY doc_id),
      d2r AS (
        SELECT d2.* FROM d2
        JOIN repts USING (doc_id) JOIN repgs USING (doc_id)
        WHERE (n_tok - nd_tok) / n_tok <= ${t.maxDupTokenFrac}
          AND topg / ng <= ${t.maxTop2gramFrac}),
      ${DedupOps.minhashCtes(t.nearDupJaccard, 32, 8, src = "d2r")},
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs),
      walk(node, reach) AS (
        SELECT a, a FROM edges
        UNION
        SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.reach),
      comp AS (
        SELECT node, MIN(reach) AS component FROM walk GROUP BY node),
      surv AS (
        SELECT * FROM d2r
        WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component))
      SELECT stage, n_docs FROM (
        SELECT 'input' AS stage, (SELECT COUNT(*) FROM documents) AS n_docs
        UNION ALL
        SELECT 'decontamination', (SELECT COUNT(*) FROM cleaned)
        UNION ALL
        SELECT 'exact_dedup', (SELECT COUNT(*) FROM d1)
        UNION ALL
        SELECT 'quality_filter', (SELECT COUNT(*) FROM d2)
        UNION ALL
        SELECT 'repetition_filter', (SELECT COUNT(*) FROM d2r)
        UNION ALL
        SELECT 'near_dup', (SELECT COUNT(*) FROM surv)
        UNION ALL
        SELECT 'pii_scrubbed',
          (SELECT COUNT(*) FROM surv WHERE $scrubbed <> text))
      ORDER BY stage"""
  }

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

  // ---------------------------------------------------------------------
  // Per-document feature snapshot
  // ---------------------------------------------------------------------

  /** The materialized per-document FEATURE TABLE a curation system trains
    * its filters on: every per-doc scalar the individual `ta_`/`cp_` queries
    * compute — length, quality ratios, language-ID, PII density, in-doc
    * repetition, fingerprint — plus the corpus-RELATIVE features (exact-dup
    * group size/keeper, per-language quality percentile) and the resulting
    * keep decision, one row per document.
    *
    * Shape at 100 TB: all scalar features come from ONE corpus scan (pure
    * codegen projection — the text column is dropped before anything
    * shuffles), then exactly two narrow shuffles: a window over the 16-byte
    * fingerprint for dup stats and a per-language window for the quality
    * percentile. Nothing joins back to the text; downstream consumers read
    * this snapshot, not the corpus.
    *
    * The per-language percent_rank sorts each language partition — the
    * exact, oracle-replayable form. At 100 TB swap it for the
    * approx_percentile cut documented at `cp_quality_percentile` (one
    * broadcast scalar per language + a stateless comparison, no sort);
    * every other feature is already sort-free.
    */
  def featureSnapshot(docs: DataFrame, t: Thresholds = Thresholds()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nChars = length(col("text"))
    val nTokens = TextOps.tokenCount(col("text"))
    val nPunct = length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", ""))
    val sEn = TextOps.occurrences(col("text"), " the ") + TextOps.occurrences(col("text"), " a ")
    val sDe = TextOps.occurrences(col("text"), " der ") + TextOps.occurrences(col("text"), " und ")
    val sEs = TextOps.occurrences(col("text"), " el ") + TextOps.occurrences(col("text"), " y ")
    val nPii = TextOps.piiPatterns
      .map { case (_, p) => regexp_count(col("text"), lit(p)).cast(LongType) }
      .reduce(_ + _)
    val toks = DedupOps.tokens(col("text"))
    val base = docs.select(
      col("doc_id"), col("lang"), col("source"),
      nChars.cast(LongType).as("n_chars"),
      nTokens.as("n_tokens"),
      (nPunct / nChars).as("punct_ratio"),
      (TextOps.occurrences(col("text"), " the ") / nTokens).as("stopword_ratio"),
      (length(regexp_replace(col("text"), " ", "")) / nTokens).as("mean_token_len"),
      when(sEn >= sDe && sEn >= sEs, "en")
        .when(sDe >= sEs, "de")
        .otherwise("es").as("predicted_lang"),
      nPii.as("n_pii"),
      CorpusPrepOps.dupTokenFrac(toks).as("dup_token_frac"),
      md5(normText(col("text"))).as("fingerprint"))
    val wFp = Window.partitionBy(col("fingerprint"))
    val wLang = Window.partitionBy(col("lang"))
      .orderBy(col("punct_ratio").asc, col("doc_id").asc)
    base
      .withColumn("dup_count", count(lit(1)).over(wFp))
      .withColumn("is_exact_keeper", col("doc_id") === min(col("doc_id")).over(wFp))
      .withColumn("quality_pr", percent_rank().over(wLang))
      .withColumn("keep",
        col("is_exact_keeper") && col("quality_pr") <= 0.9 &&
          col("n_tokens") >= t.minTokens &&
          col("dup_token_frac") <= t.maxDupTokenFrac)
  }

  private def snapshotOracle(t: Thresholds): String = {
    val piiSum = TextOps.piiPatterns
      .map { case (_, p) => s"len(regexp_extract_all(text, '$p'))" }
      .mkString("\n          + ")
    s"""
      WITH scored AS (
        SELECT doc_id, lang, source,
          length(text) AS n_chars,
          len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
          length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
            / length(text) AS punct_ratio,
          ((length(text) - length(replace(text, ' the ', ''))) / 5)
            / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
          length(replace(text, ' ', ''))
            / len(string_split_regex(trim(text), '\\s+')) AS mean_token_len,
          (length(text) - length(replace(text, ' the ', ''))) / 5
            + (length(text) - length(replace(text, ' a ', ''))) / 3 AS s_en,
          (length(text) - length(replace(text, ' der ', ''))) / 5
            + (length(text) - length(replace(text, ' und ', ''))) / 5 AS s_de,
          (length(text) - length(replace(text, ' el ', ''))) / 4
            + (length(text) - length(replace(text, ' y ', ''))) / 3 AS s_es,
          $piiSum AS n_pii,
          (len(ws) - len(list_distinct(ws))) / len(ws) AS dup_token_frac,
          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
        FROM (SELECT *,
                string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
              FROM documents)),
      win AS (
        SELECT *,
          CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
               WHEN s_de >= s_es THEN 'de'
               ELSE 'es' END AS predicted_lang,
          count(*) OVER (PARTITION BY fingerprint) AS dup_count,
          doc_id = min(doc_id) OVER (PARTITION BY fingerprint) AS is_exact_keeper,
          percent_rank() OVER (PARTITION BY lang
                               ORDER BY punct_ratio ASC, doc_id ASC) AS quality_pr
        FROM scored)
      SELECT doc_id, lang, source, n_chars, n_tokens, punct_ratio,
        stopword_ratio, mean_token_len, predicted_lang, n_pii,
        dup_token_frac, fingerprint, dup_count, is_exact_keeper, quality_pr,
        (is_exact_keeper AND quality_pr <= 0.9 AND n_tokens >= ${t.minTokens}
          AND dup_token_frac <= ${t.maxDupTokenFrac}) AS keep
      FROM win
      ORDER BY doc_id"""
  }

  private val snapshotQuery = QueryDef(
    "corpus_feature_snapshot",
    Some(snapshotOracle(Thresholds())),
    (s, dir) => featureSnapshot(T(s, dir, "documents")).orderBy(col("doc_id")))

  val defs: Seq[QueryDef] = Seq(curateQuery, snapshotQuery)
}
