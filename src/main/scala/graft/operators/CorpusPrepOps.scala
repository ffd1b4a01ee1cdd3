package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators over the `documents` table — the steps a
  * training-data pipeline runs AFTER dedup/quality scoring and BEFORE
  * shard writing: repetition filters (Gopher-style), benchmark
  * decontamination, deterministic stratified sampling (data mixing), and
  * token-budget shard packing.
  *
  * Scale design (100 TB corpus):
  *  - repetition stats are two keyed aggregations (by doc, by doc+gram) —
  *    map-side combinable, shuffle carries (id, gram-hashable) rows only;
  *  - decontamination broadcast-joins the (small) benchmark shingle set
  *    against the corpus — one pass, no corpus self-join;
  *  - sampling is a stateless hash predicate — embarrassingly parallel,
  *    deterministic across runs/executors, no RNG state to coordinate;
  *  - shard packing uses a two-pass distributed prefix sum (per-bucket
  *    window + tiny bucket-offset table broadcast back) instead of one
  *    global unpartitioned window, which would funnel the corpus through
  *    a single task at scale.
  */
object CorpusPrepOps extends QueryModule {

  // ---------------------------------------------------------------------
  // Repetition stats (Gopher-style quality filters)
  // ---------------------------------------------------------------------

  /** Per-document token-repetition metrics: duplicate-token fraction and
    * most-frequent-2-gram fraction — the standard "drop boilerplate /
    * degenerate repetition" pre-training filters (Gopher §A1.2 family).
    * Two aggregations, both keyed by doc, no arrays survive the shuffle. */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val toksDf = documents
      .select(col("doc_id"), DedupOps.tokens(col("text")).as("toks"))
    val tokStats = toksDf
      .select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("t")).as("n_distinct_tokens"))
    // index-explode, not explode(shingles(...)): see DedupOps.shingleRows
    // — inlined split() in HOF lambdas turns extraction quadratic.
    val grams = toksDf
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 2)).as("i"))
      .select(col("doc_id"),
        concat_ws(" ",
          element_at(col("toks"), col("i") + 1),
          element_at(col("toks"), col("i") + 2)).as("gram"))
    val gramStats = grams
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_2grams"), max(col("c")).as("top_2gram_count"))
    tokStats
      .join(gramStats, "doc_id")
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        ((col("n_tokens") - col("n_distinct_tokens")) / col("n_tokens"))
          .as("dup_token_frac"),
        col("top_2gram_count"),
        (col("top_2gram_count") / col("n_2grams")).as("top_2gram_frac"))
  }

  /** Per-row (aggregation-free) forms of the repetition metrics for the
    * STREAMING path — same values as [[repetitionStats]] (spec-checked),
    * but computable on a single row, so they run in append-mode
    * micro-batches with no state. Pass MATERIALIZED attribute columns
    * (select toks/grams first): inlined expressions re-evaluate inside
    * the HOF lambdas (the DedupOps.shingleRows trap). */
  def gramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2))))

  def dupTokenFrac(toks: Column): Column =
    (size(toks) - size(array_distinct(toks))) / size(toks)

  /** O(distinct-grams × grams) per row — fine for per-document arrays
    * (≤ a few hundred grams), not for corpus-wide aggregation, which is
    * what [[repetitionStats]]'s grouped form is for. */
  def top2gramFrac(grams: Column): Column =
    array_max(transform(array_distinct(grams),
      g => size(filter(grams, x => x === g)))) / size(grams)

  private val cpRepetition = QueryDef(
    "cp_repetition",
    Some("""
      WITH toks AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      tok AS (SELECT doc_id, unnest(ws) AS t FROM toks),
      tokstats AS (
        SELECT doc_id, count(*) AS n_tokens,
          count(DISTINCT t) AS n_distinct_tokens
        FROM tok GROUP BY doc_id),
      grams AS (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, len(ws) - 1),
            i -> ws[i] || ' ' || ws[i+1])) AS gram
        FROM toks WHERE len(ws) >= 2),
      gramcounts AS (
        SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram),
      gramstats AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
          max(c) AS top_2gram_count
        FROM gramcounts GROUP BY doc_id)
      SELECT t.doc_id, n_tokens, n_distinct_tokens,
        (n_tokens - n_distinct_tokens) / n_tokens AS dup_token_frac,
        top_2gram_count,
        top_2gram_count / n_2grams AS top_2gram_frac
      FROM tokstats t JOIN gramstats g ON t.doc_id = g.doc_id
      ORDER BY t.doc_id"""),
    (s, dir) => repetitionStats(T(s, dir, "documents")).orderBy(col("doc_id")))

  // ---------------------------------------------------------------------
  // Benchmark decontamination
  // ---------------------------------------------------------------------

  /** Decontamination n-gram size. 5 word-grams for the synthetic corpus
    * (docs run 10–99 tokens); production corpora use 13 — the pipeline is
    * size-agnostic. */
  val decontamN = 5

  /** Distinct train doc_ids sharing any `n`-gram with the eval set — the
    * id set both the report below and [[CorpusPipeline]]'s decontamination
    * stage key off. Eval shingles are broadcast (benchmarks are small by
    * nature). */
  def contaminatedIds(documents: DataFrame, isEval: Column => Column,
      n: Int = decontamN): DataFrame = {
    val sh = DedupOps.shingleRows(documents, n)
    val evalSh = sh.filter(isEval(col("doc_id"))).select(col("shingle")).distinct()
    sh.filter(!isEval(col("doc_id")))
      .join(broadcast(evalSh), "shingle")
      .select(col("doc_id")).distinct()
  }

  /** Flag training documents sharing any `n`-gram with an eval/benchmark
    * set — the "did a benchmark leak into the training corpus" pass every
    * serious pretraining run needs. The benchmark side is small by nature,
    * so its shingle set is broadcast: one corpus pass, no self-shuffle on
    * the train side. Both sides here derive from one `shingleRows` frame,
    * so the distinct-shuffle is planned once (ReuseExchange). */
  def decontaminate(documents: DataFrame, isEval: Column => Column,
      n: Int = decontamN): DataFrame = {
    val sh = DedupOps.shingleRows(documents, n)
    val evalSh = sh.filter(isEval(col("doc_id")))
      .withColumnRenamed("doc_id", "eval_id")
    val trainSh = sh.filter(!isEval(col("doc_id")))
    val hits = trainSh
      .join(broadcast(evalSh), "shingle")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shared_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
    documents
      .filter(!isEval(col("doc_id")))
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"),
        coalesce(col("n_eval_docs"), lit(0L)).as("n_eval_docs"),
        (coalesce(col("n_shared_ngrams"), lit(0L)) > 0).as("contaminated"))
  }

  private val cpDecontaminate = QueryDef(
    "cp_decontaminate",
    Some("""
      WITH toks AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(generate_series(1, len(ws) - 4),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
        FROM toks WHERE len(ws) >= 5),
      hits AS (
        SELECT t.doc_id, count(*) AS n_shared_ngrams,
          count(DISTINCT e.doc_id) AS n_eval_docs
        FROM sh t JOIN sh e USING (shingle)
        WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
        GROUP BY t.doc_id)
      SELECT d.doc_id,
        COALESCE(h.n_shared_ngrams, 0) AS n_shared_ngrams,
        COALESCE(h.n_eval_docs, 0) AS n_eval_docs,
        COALESCE(h.n_shared_ngrams, 0) > 0 AS contaminated
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      WHERE d.doc_id % 97 <> 0
      ORDER BY d.doc_id"""),
    (s, dir) =>
      decontaminate(T(s, dir, "documents"), id => id % 97 === 0)
        .orderBy(col("doc_id")))

  /** FUZZY decontamination — exact n-gram overlap ([[cpDecontaminate]])
    * misses paraphrased or lightly-edited benchmark leakage; this pass
    * drops training docs NEAR-duplicating any eval doc (MinHash banded
    * candidates + exact-Jaccard verify, cross-corpus only — the
    * [[DedupOps.minhashPairsAgainst]] probe with the eval set as the
    * corpus side). Output is the retained training corpus. At scale the
    * eval side is tiny, so its signatures cost nothing next to the
    * train-side pass a plain near-dup run pays anyway. */
  private val cpDecontaminateFuzzy = QueryDef(
    "cp_decontaminate_fuzzy",
    Some(s"""
      WITH ${DedupOps.minhashCtes(0.5, 32, 8)},
      flagged AS (
        SELECT DISTINCT CASE WHEN doc_a % 97 = 0 THEN doc_b ELSE doc_a END
          AS doc_id
        FROM pairs WHERE (doc_a % 97 = 0) <> (doc_b % 97 = 0))
      SELECT d.doc_id FROM documents d
      WHERE d.doc_id % 97 <> 0
        AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
      ORDER BY d.doc_id"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val isEval = col("doc_id") % 97 === 0
      val flagged = DedupOps.minhashPairsAgainst(s,
          docs.filter(!isEval), docs.filter(isEval),
          hashFn = DedupOps.portableSeededHash)
        .select(col("doc_new").as("doc_id")).distinct()
      docs.filter(!isEval).select(col("doc_id"))
        .join(flagged, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    },
    benchBuild = Some((s, dir) => {
      val docs = T(s, dir, "documents")
      val isEval = col("doc_id") % 97 === 0
      val flagged = DedupOps.minhashPairsAgainst(s,
          docs.filter(!isEval), docs.filter(isEval))
        .select(col("doc_new").as("doc_id")).distinct()
      docs.filter(!isEval).select(col("doc_id"))
        .join(flagged, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    }))

  // ---------------------------------------------------------------------
  // Deterministic stratified sampling (data mixing)
  // ---------------------------------------------------------------------

  /** Per-language keep rates in thousandths — the data-mixing move that
    * downsamples a dominant language. Anything unlisted keeps everything. */
  val keepMillis: Seq[(String, Long)] =
    Seq("en" -> 500L, "fr" -> 750L, "zh" -> 250L)

  /** Deterministic stratified sample: keep a doc iff
    * hash(doc_id) mod 1000 < rate(lang). Hash-based, not rand(): the same
    * doc is kept on every run, every executor, every retry — resumable at
    * 100 TB with no RNG state. `weight` is the inverse keep-rate so
    * downstream stats can reweight the sample back to the population. */
  def stratifiedSample(documents: DataFrame): DataFrame = {
    val rates = keepMillis.foldLeft(lit(1000L)) { case (acc, (l, m)) =>
      when(col("lang") === l, m).otherwise(acc)
    }
    documents
      .withColumn("keep_millis", rates)
      .filter(
        DedupOps.md5Hash32(concat(lit("smp_"), col("doc_id").cast(StringType)))
          % 1000 < col("keep_millis"))
      .select(
        col("doc_id"), col("lang"), col("source"),
        (lit(1000.0) / col("keep_millis")).as("weight"))
  }

  private val cpSample = QueryDef(
    "cp_stratified_sample",
    Some("""
      WITH rated AS (
        SELECT doc_id, lang, source,
          CASE lang WHEN 'en' THEN 500 WHEN 'fr' THEN 750 WHEN 'zh' THEN 250
            ELSE 1000 END AS keep_millis
        FROM documents)
      SELECT doc_id, lang, source, 1000.0 / keep_millis AS weight
      FROM rated
      WHERE ('0x' || substr(md5('smp_' || CAST(doc_id AS VARCHAR)), 25, 8))::UBIGINT::BIGINT
              % 1000 < keep_millis
      ORDER BY doc_id"""),
    (s, dir) => stratifiedSample(T(s, dir, "documents")).orderBy(col("doc_id")),
    // production predicate: xxhash64 instead of the md5-portable hash
    // (same plan — scan, broadcast-free CASE rates, stateless filter)
    benchBuild = Some { (s, dir) =>
      val rates = keepMillis.foldLeft(lit(1000L)) { case (acc, (l, m)) =>
        when(col("lang") === l, m).otherwise(acc)
      }
      T(s, dir, "documents")
        .withColumn("keep_millis", rates)
        .filter(pmod(xxhash64(col("doc_id")), lit(1000)) < col("keep_millis"))
        .select(col("doc_id"), col("lang"), col("source"),
          (lit(1000.0) / col("keep_millis")).as("weight"))
        .orderBy(col("doc_id"))
    })

  // ---------------------------------------------------------------------
  // Weighted sampling (min-of-w-hashes order statistics)
  // ---------------------------------------------------------------------

  /** Integer sampling weights per language, and their cap. */
  val sampleWeights: Seq[(String, Int)] = Seq("en" -> 4, "zh" -> 3, "fr" -> 2)
  val sampleMaxWeight = 4
  val sampleK = 64

  /** WEIGHTED sampling without replacement, hash-exact: give a document
    * of integer weight w the sort key `min(h_1 .. h_w)` of w independent
    * per-doc hashes and take the k globally smallest keys — the integer
    * form of the Efraimidis–Spirakis order-statistics sampler (keys
    * u^(1/w) need `pow`, which is not correctly rounded cross-engine;
    * the min of w iid draws preserves the pairwise selection odds
    * P(key_A < key_B) = w_A/(w_A+w_B) with no float in sight). The
    * training-data mixing move: oversample trusted sources/languages
    * proportionally without materializing replicas.
    *
    * Scale shape: the key is ≤`sampleMaxWeight` stateless hashes per row
    * computed in the scan, weights are a broadcast-free CASE, and the
    * global top-k is `TakeOrderedAndProject` — per-partition heaps of k,
    * one k-row collect, NO global sort shuffle (plan-asserted). Ties on
    * the 32-bit key fall back to doc_id, so the selected set is unique
    * across engines and runs. */
  def weightedSample(documents: DataFrame, k: Int = sampleK): DataFrame = {
    val w = sampleWeights.foldLeft(lit(1)) { case (acc, (l, m)) =>
      when(col("lang") === l, m).otherwise(acc)
    }
    def h(j: Int) = DedupOps.md5Hash32(
      concat(lit(s"wsk${j}_"), col("doc_id").cast(StringType)))
    val key = (2 to sampleMaxWeight).foldLeft(h(1)) { (acc, j) =>
      when(col("weight") >= j, least(acc, h(j))).otherwise(acc)
    }
    documents
      .withColumn("weight", w)
      .withColumn("sample_key", key)
      .select(col("doc_id"), col("lang"), col("source"), col("weight"),
        col("sample_key"))
      .orderBy(col("sample_key"), col("doc_id"))
      .limit(k)
  }

  private def duckH(j: Int): String =
    s"('0x' || substr(md5('wsk${j}_' || CAST(doc_id AS VARCHAR)), 25, 8))" +
      "::UBIGINT::BIGINT"

  private val cpWeightedSample = QueryDef(
    "cp_weighted_sample",
    Some(s"""
      WITH keyed AS (
        SELECT doc_id, lang, source,
          CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 3 WHEN 'fr' THEN 2
            ELSE 1 END AS weight,
          ${duckH(1)} AS h1, ${duckH(2)} AS h2,
          ${duckH(3)} AS h3, ${duckH(4)} AS h4
        FROM documents)
      SELECT doc_id, lang, source, weight,
        least(h1,
          CASE WHEN weight >= 2 THEN h2 ELSE h1 END,
          CASE WHEN weight >= 3 THEN h3 ELSE h1 END,
          CASE WHEN weight >= 4 THEN h4 ELSE h1 END) AS sample_key
      FROM keyed
      ORDER BY sample_key, doc_id
      LIMIT $sampleK"""),
    (s, dir) => weightedSample(T(s, dir, "documents")),
    // production key: xxhash64 draws instead of the md5-portable hash —
    // identical plan (stateless scan keys, CASE weights, top-k heap)
    benchBuild = Some { (s, dir) =>
      val w = sampleWeights.foldLeft(lit(1)) { case (acc, (l, m)) =>
        when(col("lang") === l, m).otherwise(acc)
      }
      def h(j: Int) = xxhash64(lit(j), col("doc_id"))
      val key = (2 to sampleMaxWeight).foldLeft(h(1)) { (acc, j) =>
        when(col("weight") >= j, least(acc, h(j))).otherwise(acc)
      }
      T(s, dir, "documents")
        .withColumn("weight", w)
        .withColumn("sample_key", key)
        .select(col("doc_id"), col("lang"), col("source"), col("weight"),
          col("sample_key"))
        .orderBy(col("sample_key"), col("doc_id"))
        .limit(sampleK)
    })

  // ---------------------------------------------------------------------
  // Token-budget shard packing
  // ---------------------------------------------------------------------

  /** Tokens per training shard. */
  val shardBudget = 2048L

  /** Prefix-sum bucket width (doc_ids per bucket). Each bucket's running
    * sum is a partitioned window; only the per-bucket totals (corpus/size
    * rows, driver-small) go through the one global window. */
  val packBucket = 100L

  /** Assign each document (in doc_id order) to a training shard by
    * cumulative token count — greedy sequence packing. Distributed as a
    * two-pass prefix sum: (1) running sum WITHIN doc_id buckets (parallel
    * windows), (2) bucket offsets from the tiny per-bucket totals frame,
    * broadcast back. The global window in pass 2 touches one row per
    * bucket, not per document — the unpartitioned-window scale killer
    * stays out of the corpus-sized path. */
  def packShards(documents: DataFrame, budget: Long = shardBudget,
      bucket: Long = packBucket): DataFrame = {
    val withTok = documents.select(
      col("doc_id"),
      TextOps.tokenCount(col("text")).as("n_tokens"),
      (col("doc_id") / bucket).cast(LongType).as("bucket"))
    val wLocal = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withTok.withColumn(
      "local_before", coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wBucket = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withTok
      .groupBy(col("bucket")).agg(sum(col("n_tokens")).as("btotal"))
      .select(col("bucket"),
        coalesce(sum(col("btotal")).over(wBucket), lit(0L)).as("boffset"))
    local
      .join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("n_tokens"),
        (col("local_before") + col("boffset")).as("cum_before"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr(s"cum_before div $budget").as("shard_id"),
        (col("cum_before") % budget).as("offset_in_shard"))
  }

  private val cpPack = QueryDef(
    "cp_pack_shards",
    Some("""
      WITH t AS (
        SELECT doc_id,
          len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM t)
      SELECT doc_id, n_tokens,
        CAST(cum_before // 2048 AS BIGINT) AS shard_id,
        CAST(cum_before % 2048 AS BIGINT) AS offset_in_shard
      FROM c ORDER BY doc_id"""),
    (s, dir) => packShards(T(s, dir, "documents")).orderBy(col("doc_id")))

  /** Assemble each shard's actual TRAINING SEQUENCE — documents
    * concatenated in doc order with an EOS separator — and prove the
    * bytes via a per-shard md5, alongside doc/token counts. This is the
    * step after [[packShards]]'s assignment: what a dataloader reads.
    * The collect_list per shard is bounded by the shard token budget (a
    * few KB of text), not by corpus size, so groups stay executor-safe
    * at any corpus scale; ordering inside the group is an array_sort by
    * doc_id, making the digest deterministic. */
  def packSequences(documents: DataFrame, budget: Long = shardBudget,
      bucket: Long = packBucket, eos: String = "<eos>"): DataFrame = {
    val packed = packShards(documents, budget, bucket)
      .select(col("doc_id"), col("shard_id"), col("n_tokens"))
    documents.select(col("doc_id"), col("text"))
      .join(packed, "doc_id")
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            e => e("text")),
          eos)).as("seq_md5"))
      .orderBy(col("shard_id"))
  }

  private val cpPackSeq = QueryDef(
    "cp_pack_sequences",
    Some("""
      WITH t AS (
        SELECT doc_id,
          len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM t),
      a AS (
        SELECT doc_id, n_tokens,
          CAST(cum_before // 2048 AS BIGINT) AS shard_id
        FROM c),
      j AS (
        SELECT a.shard_id, a.doc_id, a.n_tokens, d.text
        FROM a JOIN documents d USING (doc_id))
      SELECT shard_id, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        md5(string_agg(text, '<eos>' ORDER BY doc_id)) AS seq_md5
      FROM j GROUP BY shard_id ORDER BY shard_id"""),
    (s, dir) => packSequences(T(s, dir, "documents")))

  /** Materialize a corpus as training shards: pack by token budget, then
    * write parquet partitioned by `shard_id` — one directory per shard, so
    * a trainer (or a backfill of one shard) reads exactly the files it
    * needs via partition pruning. Returns a per-shard summary computed
    * from the files just WRITTEN (read-back, not lineage), so the numbers
    * prove the round trip. */
  def writeTrainingShards(documents: DataFrame, path: String,
      budget: Long = shardBudget, bucket: Long = packBucket): DataFrame = {
    val spark = documents.sparkSession
    val packed = packShards(documents, budget, bucket)
      .select(col("doc_id"), col("shard_id"), col("n_tokens"))
    documents
      .join(packed, "doc_id")
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("shard_id"))
  }

  // ---------------------------------------------------------------------
  // Vocabulary / coverage stats (tokenizer training)
  // ---------------------------------------------------------------------

  /** Corpus-wide token frequency top-K with cumulative coverage — the
    * "how much of the corpus does a K-entry vocabulary cover" question a
    * tokenizer trainer asks first. The heavy part is one map-side
    * combinable count per token; the top-K is Spark's distributed
    * `TakeOrderedAndProject` (per-partition heaps, no global sort), and
    * the ranking window runs over the K survivors only. */
  def vocabTopK(documents: DataFrame, k: Int = 200): DataFrame = {
    val counts = documents
      .select(explode(DedupOps.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total_tokens"))
    val w = Window.orderBy(col("n").desc, col("token").asc)
    counts
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_tokens",
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("n"), col("cum_tokens"),
        (col("cum_tokens") / col("total_tokens")).as("coverage"))
  }

  /** Per-source distribution drift: the chi-square statistic of each
    * source's token distribution against the corpus expectation, over
    * the top-`k` global vocabulary — the "did feed X start sending
    * different content" monitor a corpus-versioning pipeline alarms on
    * (the drift sibling of [[diversityReport]]'s composition metrics).
    *
    * The table is the FULL sources × top-K grid (zero-observed cells
    * included at their expectation) so every source sums the same K
    * cells and a dropped common token — the loudest drift — counts.
    *
    * Numeric policy: the contingency table is exact BIGINT counts; each
    * cell's expectation row·col/grand is computed in doubles (exact
    * while products stay inside 2^53 — true by construction here, and a
    * sketch/sampled table is the 100 TB form anyway), and the per-source
    * sum of the K cell contributions folds in sorted token order —
    * bounded K, deterministic order, so the statistic hash-matches.
    *
    * Shape at scale: one token count (map-side combinable) + distributed
    * top-K for the vocabulary (broadcast afterwards — K rows), one
    * (source, token) count over vocab hits, then aggregates of a
    * sources×K table. Nothing corpus-sized shuffles twice. */
  def domainDrift(documents: DataFrame, k: Int = 50): DataFrame = {
    val tok = documents
      .select(col("source"), explode(DedupOps.tokens(col("text"))).as("token"))
    val vocab = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
      .select(col("token"))
    val observed = tok.join(broadcast(vocab), "token")
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("o"))
    // the FULL sources × vocab grid: a source that never emits a top-K
    // token still owes that cell its expectation (contribution = E) — the
    // largest drift signal is exactly a dropped common token, and
    // omitting zero-observed cells would understate it and make chi2
    // non-comparable across sources (different cell counts)
    val st = documents.select(col("source")).distinct()
      .crossJoin(broadcast(vocab))
      .join(observed, Seq("source", "token"), "left")
      .select(col("source"), col("token"),
        coalesce(col("o"), lit(0L)).as("o"))
    val rowT = st.groupBy(col("source")).agg(sum(col("o")).as("row_total"))
    val colT = st.groupBy(col("token")).agg(sum(col("o")).as("col_total"))
    val grand = st.agg(sum(col("o")).as("grand_total"))
    val e = col("row_total").cast(DoubleType) * col("col_total") / col("grand_total")
    // a source with row_total = 0 (none of the top-K vocabulary at all)
    // has e = 0 in every cell; 0/0 would make its chi2 NULL and a drift
    // alarm would skip it. Standard practice: zero-expectation cells
    // contribute 0 — the alarm for such a source is n_vocab_tokens = 0,
    // which stays visible in the output.
    st.join(rowT, "source")
      .join(broadcast(colT), "token")
      .crossJoin(broadcast(grand))
      .select(col("source"), col("token"), col("row_total"),
        when(e === 0.0, lit(0.0))
          .otherwise((col("o") - e) * (col("o") - e) / e).as("contrib"))
      .groupBy(col("source"))
      .agg(
        max(col("row_total")).as("n_vocab_tokens"),
        count(lit(1)).as("k_cells"),
        array_sort(collect_list(struct(col("token"), col("contrib")))).as("cs"))
      .select(col("source"), col("n_vocab_tokens"), col("k_cells"),
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x("contrib"))
          .as("chi2"))
      .orderBy(col("source"))
  }

  private val cpDrift = QueryDef(
    "cp_domain_drift",
    Some("""
      WITH tok AS (
        SELECT source,
          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
        FROM documents),
      vocab AS (
        SELECT token FROM (
          SELECT token, count(*) AS n FROM tok GROUP BY token
          ORDER BY n DESC, token ASC LIMIT 50)),
      observed AS (
        SELECT source, token, count(*) AS o
        FROM tok JOIN vocab USING (token)
        GROUP BY source, token),
      st AS (
        SELECT g.source, g.token, coalesce(observed.o, 0) AS o
        FROM (SELECT s.source, v.token
              FROM (SELECT DISTINCT source FROM documents) s
              CROSS JOIN vocab v) g
        LEFT JOIN observed USING (source, token)),
      rowt AS (SELECT source, CAST(sum(o) AS BIGINT) AS row_total FROM st GROUP BY source),
      colt AS (SELECT token, CAST(sum(o) AS BIGINT) AS col_total FROM st GROUP BY token),
      grand AS (SELECT CAST(sum(o) AS BIGINT) AS grand_total FROM st),
      cells AS (
        SELECT st.source, st.token, rowt.row_total,
          CASE WHEN CAST(rowt.row_total AS DOUBLE) * colt.col_total / grand.grand_total = 0
               THEN 0.0::DOUBLE
               ELSE (st.o - CAST(rowt.row_total AS DOUBLE) * colt.col_total / grand.grand_total)
                 * (st.o - CAST(rowt.row_total AS DOUBLE) * colt.col_total / grand.grand_total)
                 / (CAST(rowt.row_total AS DOUBLE) * colt.col_total / grand.grand_total)
          END AS contrib
        FROM st JOIN rowt USING (source) JOIN colt USING (token), grand)
      SELECT source,
        max(row_total) AS n_vocab_tokens,
        count(*) AS k_cells,
        list_reduce(list(contrib ORDER BY token), (a, x) -> a + x) AS chi2
      FROM cells
      GROUP BY source
      ORDER BY source"""),
    (s, dir) => domainDrift(T(s, dir, "documents")))

  private val cpVocab = QueryDef(
    "cp_vocab_topk",
    Some("""
      WITH tok AS (
        SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
        FROM documents),
      counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens FROM counts),
      ranked AS (
        SELECT token, n,
          row_number() OVER (ORDER BY n DESC, token ASC) AS rank,
          CAST(sum(n) OVER (ORDER BY n DESC, token ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM counts)
      SELECT rank, token, n, cum_tokens, cum_tokens / total_tokens AS coverage
      FROM ranked, tot
      WHERE rank <= 200
      ORDER BY rank"""),
    (s, dir) => vocabTopK(T(s, dir, "documents")).orderBy(col("rank")))

  // ---------------------------------------------------------------------
  // Sequence-length histogram (packing efficiency)
  // ---------------------------------------------------------------------

  /** Token-length histogram on power-of-two bucket edges — the packing-
    * efficiency profile (how much padding a fixed-length trainer would
    * waste). One grouped aggregation; the doc-count denominator is a
    * broadcast scalar. */
  def lengthHistogram(documents: DataFrame): DataFrame = {
    val n = TextOps.tokenCount(col("text"))
    val bucket = when(n < 16, "a_lt16")
      .when(n < 32, "b_16_31")
      .when(n < 64, "c_32_63")
      .when(n < 128, "d_64_127")
      .otherwise("e_128plus")
    val total = documents.agg(count(lit(1)).as("n_docs_total"))
    documents
      .select(bucket.as("len_bucket"), n.as("n_tokens"))
      .groupBy(col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .crossJoin(broadcast(total))
      .select(col("len_bucket"), col("n_docs"), col("total_tokens"),
        (col("n_docs") / col("n_docs_total")).as("doc_share"))
  }

  private val cpHistogram = QueryDef(
    "cp_length_histogram",
    Some("""
      WITH t AS (
        SELECT CASE
            WHEN len(string_split_regex(trim(text), '\s+')) < 16 THEN 'a_lt16'
            WHEN len(string_split_regex(trim(text), '\s+')) < 32 THEN 'b_16_31'
            WHEN len(string_split_regex(trim(text), '\s+')) < 64 THEN 'c_32_63'
            WHEN len(string_split_regex(trim(text), '\s+')) < 128 THEN 'd_64_127'
            ELSE 'e_128plus' END AS len_bucket,
          len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents),
      tot AS (SELECT count(*) AS n_docs_total FROM documents)
      SELECT len_bucket, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        count(*) / n_docs_total AS doc_share
      FROM t, tot
      GROUP BY len_bucket, n_docs_total
      ORDER BY len_bucket"""),
    (s, dir) => lengthHistogram(T(s, dir, "documents")).orderBy(col("len_bucket")))

  // ---------------------------------------------------------------------
  // Corpus diversity (dataset-version tracking)
  // ---------------------------------------------------------------------

  /** Per-source lexical diversity: type-token ratio and distinct-3-gram
    * ratio — the cheap drift metrics teams chart across corpus versions
    * (a collapsing ratio flags boilerplate flooding a source). Two
    * count-distinct aggregations keyed by source. */
  def diversityReport(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("source"),
      explode(DedupOps.tokens(col("text"))).as("t"))
    val tokStats = toks.groupBy(col("source")).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("t")).as("n_types"))
    val grams = DedupOps.shingleRows(
      documents.select(col("doc_id"), col("text")), 3)
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
    val gramStats = grams.groupBy(col("source"))
      .agg(countDistinct(col("shingle")).as("n_distinct_3grams"))
    tokStats.join(gramStats, "source")
      .select(col("source"), col("n_tokens"), col("n_types"),
        (col("n_types") / col("n_tokens")).as("type_token_ratio"),
        col("n_distinct_3grams"))
  }

  private val cpDiversity = QueryDef(
    "cp_diversity",
    Some("""
      WITH toks AS (
        SELECT doc_id, source,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      tok AS (SELECT source, unnest(ws) AS t FROM toks),
      ts AS (
        SELECT source, count(*) AS n_tokens, count(DISTINCT t) AS n_types
        FROM tok GROUP BY source),
      sh AS (
        SELECT DISTINCT doc_id, source,
          unnest(list_transform(generate_series(1, len(ws) - 2),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        FROM toks WHERE len(ws) >= 3),
      gs AS (
        SELECT source, count(DISTINCT shingle) AS n_distinct_3grams
        FROM sh GROUP BY source)
      SELECT source, n_tokens, n_types,
        n_types / n_tokens AS type_token_ratio,
        n_distinct_3grams
      FROM ts JOIN gs USING (source)
      ORDER BY source"""),
    (s, dir) => diversityReport(T(s, dir, "documents")).orderBy(col("source")))

  /** Adaptive quality thresholding: keep everything but the worst decile
    * of punctuation-noise PER LANGUAGE — absolute thresholds misfire
    * across languages, percentile cuts self-calibrate. Declared with the
    * exact `percent_rank` (oracle-replayable); at 100 TB the same cut is
    * one `approx_percentile(punct_ratio, 0.9)` per language (tiny,
    * broadcast) followed by a stateless filter — no full-partition sort,
    * same semantics up to sketch error. */
  private val cpQualityPct = QueryDef(
    "cp_quality_percentile",
    Some("""
      WITH q AS (
        SELECT doc_id, lang,
          length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
            / length(text) AS punct_ratio
        FROM documents),
      r AS (
        SELECT doc_id, lang, punct_ratio,
          percent_rank() OVER (PARTITION BY lang
                               ORDER BY punct_ratio ASC, doc_id ASC) AS pr
        FROM q)
      SELECT doc_id, lang, punct_ratio, pr, pr <= 0.9 AS keep
      FROM r
      ORDER BY doc_id"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val punct = (length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", ""))
        / length(col("text"))).as("punct_ratio")
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("punct_ratio").asc, col("doc_id").asc)
      T(s, dir, "documents")
        .select(col("doc_id"), col("lang"), punct)
        .withColumn("pr", percent_rank().over(w))
        .select(col("doc_id"), col("lang"), col("punct_ratio"), col("pr"),
          (col("pr") <= 0.9).as("keep"))
        .orderBy(col("doc_id"))
    })

  /** Per-source exact-duplication rate — "which feed is sending us the
    * same documents over and over": fingerprint count-distinct per
    * source. The shuffle carries (source, 16-byte hash) only. */
  private val cpDupRate = QueryDef(
    "cp_dup_rate_by_source",
    Some("""
      WITH f AS (
        SELECT source,
          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        FROM documents)
      SELECT source, count(*) AS n_docs,
        count(DISTINCT fp) AS n_unique,
        (count(*) - count(DISTINCT fp)) / count(*) AS dup_rate
      FROM f
      GROUP BY source
      ORDER BY source"""),
    (s, dir) =>
      T(s, dir, "documents")
        .select(col("source"),
          md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_unique"))
        .select(col("source"), col("n_docs"), col("n_unique"),
          ((col("n_docs") - col("n_unique")) / col("n_docs")).as("dup_rate"))
        .orderBy(col("source")))

  // ---------------------------------------------------------------------
  // Domain-mixing report
  // ---------------------------------------------------------------------

  /** Per-source token shares plus the up/down-sampling weight that would
    * equalize the mixture across sources — the report a data-mixing
    * config starts from. One grouped aggregation; corpus totals are a
    * broadcast scalar. */
  def domainMix(documents: DataFrame): DataFrame = {
    val totals = documents.agg(
      sum(TextOps.tokenCount(col("text"))).as("corpus_tokens"),
      countDistinct(col("source")).as("n_sources"))
    documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text"))).as("n_tokens"))
      .crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens") / col("corpus_tokens")).as("token_share"),
        ((lit(1.0) / col("n_sources")) / (col("n_tokens") / col("corpus_tokens")))
          .as("uniform_weight"))
  }

  private val cpMix = QueryDef(
    "cp_domain_mix",
    Some("""
      WITH t AS (
        SELECT source,
          len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents),
      tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens,
          count(DISTINCT source) AS n_sources
        FROM (SELECT source, n_tokens FROM t))
      SELECT source, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        CAST(sum(n_tokens) AS BIGINT) / corpus_tokens AS token_share,
        (CAST(1 AS DOUBLE) / n_sources)
          / (CAST(sum(n_tokens) AS BIGINT) / corpus_tokens) AS uniform_weight
      FROM t, tot
      GROUP BY source, corpus_tokens, n_sources
      ORDER BY source"""),
    (s, dir) => domainMix(T(s, dir, "documents")).orderBy(col("source")))

  /** ACT on the mix report: downsample over-represented sources to the
    * uniform token target with a deterministic content-hash keep rule —
    * the data-mixing step that turns [[domainMix]]'s weights into an
    * actual rebalanced corpus. keep_prob = min(1, uniform_weight):
    * sources above target keep a hash-selected fraction, sources below
    * keep everything (downsampling can't upsample — that's epoch
    * weighting at training time). The keep decision hashes the
    * NORMALIZED content ([[CorpusPipeline.normText]]), so duplicate
    * variants co-decide, reruns are stable, and no RNG state exists
    * anywhere. Shape at scale: the mix report is a broadcast (one row
    * per source); the keep rule is a stateless map over the corpus. */
  def domainRebalance(documents: DataFrame): DataFrame = {
    val mix = domainMix(documents)
      .select(col("source"),
        least(lit(1.0), col("uniform_weight")).as("keep_prob"))
    val bucket = pmod(
      DedupOps.md5Hash32(graft.operators.CorpusPipeline.normText(col("text"))),
      lit(1000000L))
    documents
      .join(broadcast(mix), "source")
      .select(col("source"), col("keep_prob"),
        TextOps.tokenCount(col("text")).as("n_toks"),
        (bucket / lit(1000000.0) < col("keep_prob")).as("keep"))
      .groupBy(col("source"))
      .agg(
        max(col("keep_prob")).as("keep_prob"),
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_toks")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  private val cpRebalance = QueryDef(
    "cp_domain_rebalance",
    Some("""
      WITH t AS (
        SELECT source, text,
          len(string_split_regex(trim(text), '\s+')) AS n_toks
        FROM documents),
      tot AS (
        SELECT CAST(sum(n_toks) AS BIGINT) AS corpus_tokens,
          count(DISTINCT source) AS n_sources
        FROM t),
      mix AS (
        SELECT source,
          least(1.0::DOUBLE,
            (CAST(1 AS DOUBLE) / n_sources)
              / (CAST(sum(n_toks) AS BIGINT) / corpus_tokens)) AS keep_prob
        FROM t, tot
        GROUP BY source, corpus_tokens, n_sources),
      marked AS (
        SELECT t.source, mix.keep_prob, t.n_toks,
          (('0x' || substr(md5(lower(trim(regexp_replace(t.text, '\s+', ' ', 'g')))), 25, 8))::UBIGINT::BIGINT
             % 1000000) / 1000000.0 < mix.keep_prob AS keep
        FROM t JOIN mix USING (source))
      SELECT source,
        max(keep_prob) AS keep_prob,
        count(*) AS n_docs,
        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN keep THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM marked
      GROUP BY source
      ORDER BY source"""),
    (s, dir) => domainRebalance(T(s, dir, "documents")))

  /** Temperature-scaled source mixing — the α-smoothed multinomial
    * sampling of multilingual LM training (mBERT / XLM-R, public):
    * source share q_s ∝ n_s^α flattens the head and upweights the tail
    * without [[domainRebalance]]'s all-the-way-to-uniform jump. α is
    * FIXED at 1/2 because sqrt is the one power IEEE 754 requires to be
    * correctly rounded — `pow(x, 0.7)` may differ by an ulp across
    * engines and flip a doc at the bucket boundary, breaking the
    * hash-exact oracle. The kept budget is the largest total realizable
    * with per-source keep_prob ≤ 1 (the most-upweighted source caps it
    * at full retention); keep decisions are the usual stateless
    * content-hash bucket — RNG-free, replay-stable, per-doc parallel.
    *
    * Float policy: the share denominator Σ√n_s folds left-to-right over
    * sources sorted by name (double addition is not associative; the
    * ordered fold is the established [[graft.operators.IvfIndex]]
    * `exactMean` discipline), so every derived double replays
    * bit-for-bit in DuckDB. */
  def temperatureMix(documents: DataFrame): DataFrame = {
    val counts = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val sumW = counts
      .agg(array_sort(collect_list(struct(col("source"),
        sqrt(col("n_docs")).as("w")))).as("xs"))
      .select(aggregate(col("xs"), lit(0.0), (acc, e) => acc + e("w"))
        .as("sum_w"))
    val shares = counts.crossJoin(broadcast(sumW))
      .select(col("source"), col("n_docs"),
        (sqrt(col("n_docs")) / col("sum_w")).as("mix_share"))
    val budget = shares
      .agg(min(col("n_docs") / col("mix_share")).as("budget"))
    val probs = shares.crossJoin(broadcast(budget))
      .select(col("source"), col("n_docs"), col("mix_share"),
        least(lit(1.0), col("budget") * col("mix_share") / col("n_docs"))
          .as("keep_prob"))
    val bucket = pmod(
      DedupOps.md5Hash32(graft.operators.CorpusPipeline.normText(col("text"))),
      lit(1000000L))
    documents
      .join(broadcast(probs), "source")
      .select(col("source"), col("n_docs"), col("mix_share"), col("keep_prob"),
        TextOps.tokenCount(col("text")).as("n_toks"),
        (bucket / lit(1000000.0) < col("keep_prob")).as("keep"))
      .groupBy(col("source"))
      .agg(
        max(col("n_docs")).as("n_docs"),
        max(col("mix_share")).as("mix_share"),
        max(col("keep_prob")).as("keep_prob"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_toks")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  private val cpTemperatureMix = QueryDef(
    "cp_temperature_mix",
    Some("""
      WITH counts AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      sumw AS (
        SELECT list_reduce(list(sqrt(n_docs) ORDER BY source),
          (a, b) -> a + b) AS sum_w
        FROM counts),
      shares AS (
        SELECT source, n_docs,
          sqrt(n_docs) / (SELECT sum_w FROM sumw) AS mix_share
        FROM counts),
      budget AS (
        SELECT MIN(n_docs / mix_share) AS budget FROM shares),
      probs AS (
        SELECT source, n_docs, mix_share,
          least(1.0::DOUBLE,
            (SELECT budget FROM budget) * mix_share / n_docs) AS keep_prob
        FROM shares),
      marked AS (
        SELECT d.source, p.n_docs, p.mix_share, p.keep_prob,
          len(string_split_regex(trim(d.text), '\s+')) AS n_toks,
          (('0x' || substr(md5(lower(trim(regexp_replace(d.text, '\s+', ' ', 'g')))), 25, 8))::UBIGINT::BIGINT
             % 1000000) / 1000000.0 < p.keep_prob AS keep
        FROM documents d JOIN probs p USING (source))
      SELECT source,
        max(n_docs) AS n_docs,
        max(mix_share) AS mix_share,
        max(keep_prob) AS keep_prob,
        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN keep THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM marked
      GROUP BY source
      ORDER BY source"""),
    (s, dir) => temperatureMix(T(s, dir, "documents")))

  // ---------------------------------------------------------------------
  // Deterministic train/val/test split
  // ---------------------------------------------------------------------

  /** Assign every document to train/val/test by hashing its CONTENT
    * fingerprint into 100 buckets (train < `trainPct`, val < trainPct +
    * `valPct`, rest test). Hashing the normalized-text fingerprint — not
    * the doc_id — means byte-identical and case/whitespace-variant copies
    * always land in the SAME split, so surviving duplicates can never
    * leak train text into eval. Stateless hash predicate: deterministic
    * across runs/executors/engines, no RNG state, embarrassingly
    * parallel (same policy as [[stratifiedSample]]). */
  def splitAssign(documents: DataFrame, trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    val bucket = pmod(
      DedupOps.md5Hash32(graft.operators.CorpusPipeline.normText(col("text"))),
      lit(100L))
    documents.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  private val cpHashSplit = QueryDef(
    "cp_hash_split",
    Some("""
      WITH d AS (
        SELECT doc_id,
          lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        FROM documents),
      b AS (
        SELECT doc_id,
          ('0x' || substr(md5(norm), 25, 8))::UBIGINT::BIGINT % 100 AS bucket,
          CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_toks
        FROM d),
      s AS (
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val'
                    ELSE 'test' END AS split,
               n_toks
        FROM b)
      SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      FROM s GROUP BY split ORDER BY split"""),
    (s, dir) =>
      splitAssign(T(s, dir, "documents"))
        .select(col("split"),
          size(DedupOps.tokens(col("text"))).cast(LongType).as("n_toks"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .orderBy(col("split")))

  // ---------------------------------------------------------------------
  // Split-leakage audit (near-dups straddling the train/val/test split)
  // ---------------------------------------------------------------------

  /** Near-dup pairs whose members landed in DIFFERENT splits — the
    * leakage [[splitAssign]]'s content hash prevents for EXACT
    * duplicates but structurally cannot for near-duplicates (a one-word
    * edit moves the hash bucket independently), so ~1−Σpᵢ² of near-dup
    * pairs straddle a boundary and silently inflate eval scores. This
    * is the QA pass a split ships with: each surviving row is one
    * train→eval contamination path, with both split labels and the
    * Jaccard that links them.
    *
    * Cost is the near-dup pass itself ([[DedupOps.minhashNearDups]] —
    * banded candidates only, never all-pairs) plus two broadcast-sized
    * joins of the (doc_id, split) assignment onto the pair ends; at
    * scale the pair set is duplicate-density-sized, not corpus-sized. */
  def splitLeakage(s: SparkSession, documents: DataFrame,
      threshold: Double = 0.5,
      hashFn: (Column, Int) => Column =
        (c, seed) => xxhash64(c, lit(seed))): DataFrame = {
    val pairs = DedupOps.minhashNearDups(s, documents, threshold,
      hashFn = hashFn)
    val splits = splitAssign(documents).select(col("doc_id"), col("split"))
    pairs
      .join(splits.toDF("doc_a", "split_a"), "doc_a")
      .join(splits.toDF("doc_b", "split_b"), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("split_a"), col("doc_b"), col("split_b"),
        col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val cpSplitLeakage = QueryDef(
    "cp_split_leakage",
    Some(s"""
      WITH ${DedupOps.minhashCtes(threshold = 0.5, numPerms = 32, bands = 8)},
      nrm AS (
        SELECT doc_id,
          lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
        FROM documents),
      sp AS (
        SELECT doc_id,
          CASE WHEN ('0x' || substr(md5(norm), 25, 8))::UBIGINT::BIGINT % 100 < 90 THEN 'train'
               WHEN ('0x' || substr(md5(norm), 25, 8))::UBIGINT::BIGINT % 100 < 95 THEN 'val'
               ELSE 'test' END AS split
        FROM nrm)
      SELECT p.doc_a, sa.split AS split_a, p.doc_b, sb.split AS split_b, p.jaccard
      FROM pairs p
      JOIN sp sa ON sa.doc_id = p.doc_a
      JOIN sp sb ON sb.doc_id = p.doc_b
      WHERE sa.split <> sb.split
      ORDER BY p.doc_a, p.doc_b"""),
    (s, dir) => splitLeakage(s, T(s, dir, "documents"),
      hashFn = DedupOps.portableSeededHash),
    // the declared/bench hash convention of the minhash family
    benchBuild = Some((s, dir) => splitLeakage(s, T(s, dir, "documents"))))

  // ---------------------------------------------------------------------
  // Document chunking (embedding-pipeline pre-step)
  // ---------------------------------------------------------------------

  /** Split each document into overlapping token windows — the pre-step of
    * every embed-then-index pipeline (a retrieval embedder has a fixed
    * context; long docs must arrive as window/stride chunks, the overlap
    * preserving cross-boundary context). Chunk i of a doc with n tokens
    * covers `[i·stride, min(i·stride + window, n))`;
    * `ceil(max(n − window, 0) / stride) + 1` chunks per doc, so every
    * token lands in ≥1 chunk and the final chunk reaches the tail.
    *
    * Scale shape: pure per-row explode — no join, no aggregation, NO
    * sort (the declared query's presentation sort lives in its
    * QueryDef, so pipeline reuse — chunk → embed → index — never
    * inherits a corpus-wide sort it doesn't need; house convention, see
    * `packShards`). Output rows ≈ corpus tokens / stride, each carrying
    * one chunk's text: the natural upstream of `mapInPandas` embedding
    * + the ANN index builders. */
  def chunkDocuments(documents: DataFrame, window: Int = 64,
      stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = DedupOps.tokens(col("text"))
    val withToks = documents
      // trim-gate, not size(toks) > 0: split("") yields one "" token in
      // BOTH engines, which would emit a phantom empty chunk per blank doc
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("n_chunks",
        (floor((greatest(size(col("toks")) - window, lit(0)) + lit(stride) - 1)
          / lit(stride)) + 1).cast(IntegerType))
    withToks
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ",
          slice(col("toks"), col("chunk_id") * stride + 1, lit(window)))
          .as("chunk_text"),
        least(lit(window), size(col("toks")) - col("chunk_id") * stride)
          .as("n_chunk_tokens"))
  }

  /** Shared DuckDB CTE chain ending in
    * `chunks(doc_id, chunk_id, chunk_text, n_chunk_tokens)` — the replay
    * of [[chunkDocuments]] at the default window/stride, reused by the
    * chunk-retrieval oracle ([[SimilarityOps]]). */
  private[operators] val chunkCtes: String = """
      toks AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents WHERE len(trim(text)) > 0),
      sized AS (
        SELECT doc_id, ws,
          CAST(floor((greatest(len(ws) - 64, 0) + 48 - 1) / 48.0) + 1 AS INT) AS n_chunks
        FROM toks),
      chunks0 AS (
        SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, ws
        FROM sized),
      chunks AS (
        SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
          array_to_string(ws[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text,
          CAST(least(64, len(ws) - chunk_id * 48) AS INT) AS n_chunk_tokens
        FROM chunks0)"""

  private val cpChunk = QueryDef(
    "cp_chunk_documents",
    Some(s"""
      WITH $chunkCtes
      SELECT doc_id, chunk_id, chunk_text, n_chunk_tokens
      FROM chunks
      ORDER BY doc_id, chunk_id"""),
    // presentation sort HERE, not in the operator: pipeline reuse
    // (sim_chunk_retrieval, sim_chunk_indexed) must not inherit a
    // corpus-wide sort from a mid-pipeline transform
    (s, dir) => chunkDocuments(T(s, dir, "documents"))
      .orderBy(col("doc_id"), col("chunk_id")))

  override val defs: Seq[QueryDef] =
    Seq(cpRepetition, cpDecontaminate, cpDecontaminateFuzzy, cpSample,
      cpPack, cpPackSeq, cpVocab, cpHistogram, cpMix, cpDiversity,
      cpDupRate, cpQualityPct, cpHashSplit, cpDrift, cpRebalance,
      cpTemperatureMix, cpChunk, cpSplitLeakage, cpWeightedSample)
}
