package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (token counting, quality scoring, language ID
  * heuristic, document fingerprinting). Beyond the reference's own
  * operators (BASELINE.json north star); all computations are pure
  * codegen-friendly `functions._` column expressions — no UDFs — so they
  * stay inside whole-stage codegen at 100 TB.
  */
object TextOps extends QueryModule {

  /** Whitespace token count of a text column. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast(LongType)

  /** Non-overlapping occurrence count of `needle` (replace-based; identical
    * algorithm in DuckDB's replace, so oracle-exact). */
  def occurrences(text: Column, needle: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), ""))) / needle.length

  private val taTokens = QueryDef(
    "ta_token_count",
    Some("""
      SELECT doc_id, lang,
        len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        length(text) AS n_chars_measured
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .select(
          $"doc_id", $"lang",
          tokenCount($"text").as("n_tokens"),
          length($"text").cast(LongType).as("n_chars_measured"))
        .orderBy($"doc_id")
    })

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length — the standard pre-training corpus filters. */
  private val taQuality = QueryDef(
    "ta_quality_score",
    Some("""
      SELECT doc_id,
        length(text) AS n_chars,
        len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct,
        length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) / length(text) AS punct_ratio,
        ((length(text) - length(replace(text, ' the ', ''))) / 5) / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio,
        length(replace(text, ' ', '')) / len(string_split_regex(trim(text), '\s+')) AS mean_token_len
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      val nChars = length($"text")
      val nTokens = tokenCount($"text")
      val nPunct = length(regexp_replace($"text", "[a-zA-Z0-9 ]", ""))
      T(s, dir, "documents")
        .select(
          $"doc_id",
          nChars.cast(LongType).as("n_chars"),
          nTokens.as("n_tokens"),
          nPunct.cast(LongType).as("n_punct"),
          (nPunct / nChars).as("punct_ratio"),
          (occurrences($"text", " the ") / nTokens).as("stopword_ratio"),
          (length(regexp_replace($"text", " ", "")) / nTokens).as("mean_token_len"))
        .orderBy($"doc_id")
    })

  /** Language-ID n-gram/marker heuristic: score candidate languages by
    * marker-token hits, argmax with a deterministic tie-break. (A corpus
    * heuristic, not a model — the synthetic `documents.text` is English
    * word-soup, so this exercises the operator mechanics, not accuracy.) */
  private val taLangId = QueryDef(
    "ta_lang_id",
    Some("""
      WITH scored AS (
        SELECT doc_id, lang,
          (length(text) - length(replace(text, ' the ', ''))) / 5
            + (length(text) - length(replace(text, ' a ', ''))) / 3 AS s_en,
          (length(text) - length(replace(text, ' der ', ''))) / 5
            + (length(text) - length(replace(text, ' und ', ''))) / 5 AS s_de,
          (length(text) - length(replace(text, ' el ', ''))) / 4
            + (length(text) - length(replace(text, ' y ', ''))) / 3 AS s_es
        FROM documents)
      SELECT doc_id, lang,
        CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_es THEN 'de'
             ELSE 'es' END AS predicted_lang
      FROM scored
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      val sEn = occurrences($"text", " the ") + occurrences($"text", " a ")
      val sDe = occurrences($"text", " der ") + occurrences($"text", " und ")
      val sEs = occurrences($"text", " el ") + occurrences($"text", " y ")
      T(s, dir, "documents")
        .select(
          $"doc_id", $"lang",
          when(sEn >= sDe && sEn >= sEs, "en")
            .when(sDe >= sEs, "de")
            .otherwise("es").as("predicted_lang"))
        .orderBy($"doc_id")
    })

  /** Document fingerprint: md5 of whitespace-normalized lowercased text —
    * the exact-dedup key for a 100 TB corpus (group by fingerprint, not by
    * the full text, so the shuffle carries 32 bytes per row). */
  private val taFingerprint = QueryDef(
    "ta_fingerprint",
    Some("""
      SELECT doc_id,
        md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .select(
          $"doc_id",
          md5(lower(trim(regexp_replace($"text", "\\s+", " ")))).as("fingerprint"))
        .orderBy($"doc_id")
    })

  /** BPE-ish pre-tokenizer count: the GPT-2 pre-tokenizer regex family
    * (contraction suffixes | space-prefixed letter runs | digit runs |
    * punctuation runs), WITHOUT the trailing-whitespace lookahead —
    * DuckDB's RE2 has no lookahead, and the simplified pattern is
    * engine-portable while still splitting "don't it's 42%" the BPE
    * way. Counts matches, codegen'd (`regexp_count`). */
  val bpeTokenPattern = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+"

  /** Polynomial rolling hash over the token stream (Rabin–Karp style):
    * h ← (h·131 + tok) mod (2³¹−1), with each token first reduced mod
    * the prime so every intermediate fits far inside int64 — EXACT and
    * identical in Spark and DuckDB (whose BIGINT errors on overflow
    * instead of wrapping). Order-sensitive by construction: documents
    * with the same words in different order get different fingerprints
    * (the md5 fingerprint above hashes the joined STRING; this one
    * hashes the token SEQUENCE and composes incrementally — the shape
    * a streaming/windowed fingerprinter needs). */
  def rollingFingerprint(toks: Column, tokHash: Column => Column): Column = {
    val m = 2147483647L // 2^31 - 1
    aggregate(toks, lit(0L),
      (acc, t) => (acc * 131L + pmod(tokHash(t), lit(m))) % m)
  }

  private val taBpe = QueryDef(
    "ta_bpe_rolling",
    Some(s"""
      WITH toks AS (
        SELECT doc_id, text,
          string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
        FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(text, '${bpeTokenPattern.replace("'", "''")}')) AS n_bpe_tokens,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT), list_transform(ws,
            t -> ('0x' || substr(md5('0_' || t), 25, 8))::UBIGINT::BIGINT % 2147483647)),
          (acc, x) -> (acc * 131 + x) % 2147483647) AS rolling_fp
      FROM toks
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .select($"doc_id", $"text",
          DedupOps.tokens($"text").as("toks")) // materialized attr: HOF-inlining trap
        .select(
          $"doc_id",
          regexp_count($"text", lit(bpeTokenPattern)).cast(LongType).as("n_bpe_tokens"),
          rollingFingerprint($"toks",
            t => DedupOps.portableSeededHash(t, 0)).as("rolling_fp"))
        .orderBy($"doc_id")
    },
    // production path: same fold over xxhash64 token hashes
    benchBuild = Some((s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .select($"doc_id", $"text", DedupOps.tokens($"text").as("toks"))
        .select(
          $"doc_id",
          regexp_count($"text", lit(bpeTokenPattern)).cast(LongType).as("n_bpe_tokens"),
          rollingFingerprint($"toks", t => xxhash64(t)).as("rolling_fp"))
        .orderBy($"doc_id")
    }))

  /** PII patterns shared by scrub and count — engine-portable (no
    * lookarounds: RE2). Order matters: emails before bare domains,
    * IPv4 before phone-ish digit runs. */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"),
    ("phone", "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"))

  /** Redact every PII hit with a typed placeholder — the corpus-prep
    * step that must run BEFORE any text lands in a training shard. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (kind, p)) =>
      regexp_replace(c, p, s"<$kind>")
    }

  /** The DuckDB mirror of [[scrubPii]]: the same pattern list, order,
    * and placeholders folded into a `regexp_replace` chain over the
    * given column expression — shared by every oracle that replays the
    * scrub (`ta_pii_scrub`, `s25_ingest_e2e`), so the SQL form can
    * never drift from the engine's fold independently. */
  def scrubSqlChain(col: String): String =
    piiPatterns.foldLeft(col) { case (acc, (kind, p)) =>
      s"regexp_replace($acc, '$p', '<$kind>', 'g')"
    }

  private val taPii = QueryDef(
    "ta_pii_scrub",
    Some {
      val counts = piiPatterns.map { case (kind, p) =>
        s"len(regexp_extract_all(text, '$p')) AS n_$kind"
      }.mkString(",\n        ")
      s"""
      SELECT doc_id,
        ${scrubSqlChain("text")} AS scrubbed,
        $counts
      FROM documents
      ORDER BY doc_id"""
    },
    (s, dir) => {
      import s.implicits._
      val countCols = piiPatterns.map { case (kind, p) =>
        regexp_count($"text", lit(p)).cast(LongType).as(s"n_$kind")
      }
      T(s, dir, "documents")
        .select(Seq($"doc_id", scrubPii($"text").as("scrubbed")) ++ countCols: _*)
        .orderBy($"doc_id")
    })

  /** TF-IDF keyword extraction, log-free: score = tf × (N / df). The
    * standard idf uses ln(N/df); ln is a libm call with no cross-engine
    * bit guarantee, and the RANKING is identical under any monotone
    * transform of N/df — so the oracle-checked score skips the log.
    * Shape at scale: two keyed aggregations (term frequency by (doc,
    * token), document frequency by token) joined on token — the
    * inverted-index join — then a per-doc top-3 window. */
  private val taTfidf = QueryDef(
    "ta_tfidf_keywords",
    Some("""
      WITH tok AS (
        SELECT doc_id,
          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
      dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, token, tf.tf, dfx.df,
          tf.tf * (n.n_docs / dfx.df) AS score
        FROM tf JOIN dfx USING (token), n),
      ranked AS (
        SELECT doc_id, token, tf, df, score,
          row_number() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, token ASC) AS rank
        FROM scored)
      SELECT doc_id, rank, token, tf, df, score
      FROM ranked WHERE rank <= 3
      ORDER BY doc_id, rank"""),
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = T(s, dir, "documents")
      val tf = docs
        .select($"doc_id", explode(DedupOps.tokens($"text")).as("token"))
        .groupBy($"doc_id", $"token")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"token".asc)
      tf.join(df, "token")
        .crossJoin(broadcast(n))
        .select($"doc_id", $"token", $"tf", $"df",
          ($"tf" * ($"n_docs" / $"df")).as("score"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"doc_id", $"rank", $"token", $"tf", $"df", $"score")
        .orderBy($"doc_id", $"rank")
    })

  /** Count-based bigram language model (KenLM-style counts): corpus-wide
    * bigram frequencies with exact conditional probabilities
    * p(w2|w1) = c(w1,w2) / Σ_w c(w1,w). Bigrams never span documents.
    * The table a count-LM quality filter scores against. Shape at scale:
    * one keyed count per bigram (map-side combinable) + a per-context
    * aggregate joined back — both shuffles carry two short words. */
  private val taBigramLm = QueryDef(
    "ta_bigram_lm",
    Some("""
      WITH toks AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      grams AS (
        SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
          i -> [ws[i], ws[i+1]])) AS g
        FROM toks WHERE len(ws) >= 2),
      bi AS (
        SELECT g[1] AS w1, g[2] AS w2, count(*) AS n
        FROM grams GROUP BY 1, 2),
      ctx AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_ctx FROM bi GROUP BY w1)
      SELECT w1, w2, n, n_ctx, n / n_ctx AS cond_p
      FROM bi JOIN ctx USING (w1)
      ORDER BY w1, w2"""),
    (s, dir) => {
      import s.implicits._
      val bi = T(s, dir, "documents")
        .select(DedupOps.tokens($"text").as("toks"))
        .filter(size($"toks") >= 2)
        .select($"toks", explode(sequence(lit(0), size($"toks") - 2)).as("i"))
        .select(
          element_at($"toks", $"i" + 1).as("w1"),
          element_at($"toks", $"i" + 2).as("w2"))
        .groupBy($"w1", $"w2")
        .agg(count(lit(1)).as("n"))
      val ctx = bi.groupBy($"w1").agg(sum($"n").as("n_ctx"))
      bi.join(ctx, "w1")
        .select($"w1", $"w2", $"n", $"n_ctx", ($"n" / $"n_ctx").as("cond_p"))
        .orderBy($"w1", $"w2")
    })

  /** BM25 retrieval scoring of the corpus against a fixed term query —
    * the ranking function a data pipeline uses to mine topical subsets
    * or build retrieval training pairs. Same inverted-index shape as
    * TF-IDF: tf by (doc, term), df by term, document length and corpus
    * average length for the saturation denominator; only the query's
    * terms survive the first filter, so every later stage is
    * query-sized, not corpus-sized.
    *
    * Two reproducibility choices, both deliberate: idf is the RATIONAL
    * core (N - df + 0.5)/(df + 0.5) without the usual ln() — the two
    * engines' libm logs can differ in the last ulp, and the driver
    * hash-compares exact doubles (same reason TF-IDF uses the raw N/df
    * ratio); and the per-doc sum over matched terms folds in sorted term
    * order, since float addition is order-dependent. avgdl is exact: an
    * integer token-count sum divided once by the doc count. */
  def bm25(documents: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("token"))
    val dl = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"),
      count(lit(1)).as("n_docs"))
    val tf = toks.filter(col("token").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("token"),
        bm25ScoreExpr(col("tf"), col("df"), col("dl"),
          col("n_docs"), col("avgdl"), k1, b).as("score"))
    bm25Rank(scored, topK)
  }

  /** The BM25 term score — ONE definition shared by the recompute path
    * above and the served path ([[graft.etl.TextIndex.search]]) so the
    * two are bit-identical by construction. */
  def bm25ScoreExpr(tf: Column, df: Column, dl: Column, nDocs: Column,
      avgdl: Column, k1: Double, b: Double): Column =
    ((nDocs - df + 0.5) / (df + 0.5)) *
      ((tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (dl / avgdl))))

  /** Per-doc ordered fold of term scores + top-k — shared ranking tail
    * (float addition is order-dependent; the fold runs in sorted term
    * order in both paths and the oracle). */
  def bm25Rank(scored: DataFrame, topK: Int): DataFrame =
    scored
      .groupBy(col("doc_id"))
      .agg(
        array_sort(collect_list(struct(col("token"), col("score")))).as("ts"),
        count(lit(1)).as("n_terms_hit"))
      .select(col("doc_id"),
        aggregate(col("ts"), lit(0.0), (acc, e) => acc + e("score"))
          .as("bm25"),
        col("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)

  /** Shared by the recompute and served declarations: a green
    * `ta_bm25_indexed` row proves recompute-vs-index equivalence end to
    * end against the SAME replay. */
  private val bm25Oracle = """
      WITH tok AS (
        SELECT doc_id,
          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
        FROM documents),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      stats AS (
        SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               COUNT(*) AS n_docs
        FROM dl),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM tok WHERE token IN ('spark', 'join', 'window')
        GROUP BY doc_id, token),
      dfx AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      scored AS (
        -- every fractional literal is ::DOUBLE: DuckDB otherwise parses
        -- them as DECIMAL and computes tf * 2.2 exactly, off the IEEE
        -- double product Spark evaluates
        SELECT tf.doc_id, tf.token,
          ((stats.n_docs - dfx.df + 0.5::DOUBLE) / (dfx.df + 0.5::DOUBLE))
            * ((tf.tf * 2.2::DOUBLE)
              / (tf.tf + 1.2::DOUBLE
                 * (1.0::DOUBLE - 0.75::DOUBLE
                    + 0.75::DOUBLE * (dl.dl / stats.avgdl))))
            AS score
        FROM tf
        JOIN dfx USING (token)
        JOIN dl ON dl.doc_id = tf.doc_id, stats),
      agg AS (
        SELECT doc_id,
          list_reduce(list(score ORDER BY token), (a, x) -> a + x) AS bm25,
          COUNT(*) AS n_terms_hit
        FROM scored GROUP BY doc_id)
      SELECT doc_id, bm25, n_terms_hit
      FROM agg
      ORDER BY bm25 DESC, doc_id ASC
      LIMIT 10"""

  private val taBm25 = QueryDef(
    "ta_bm25_retrieval",
    Some(bm25Oracle),
    (s, dir) => bm25(T(s, dir, "documents"), Seq("spark", "join", "window")))

  /** The same retrieval served from the PERSISTED inverted index
    * ([[graft.etl.TextIndex]]) instead of re-tokenizing the corpus per
    * query — what a search endpoint actually runs at 100 TB. Verify's
    * `build` rebuilds the index inline (correctness never reads stale
    * state); Bench treats the build as the offline job it is
    * (`benchSetup`) and times only the per-query probe. */
  private val taBm25Indexed = QueryDef(
    "ta_bm25_indexed",
    Some(bm25Oracle),
    (s, dir) => {
      graft.etl.TextIndex.build(s, T(s, dir, "documents"), "tidx_v")
      graft.etl.TextIndex.search(s, "tidx_v", Seq("spark", "join", "window"))
    },
    benchBuild = Some((s, dir) =>
      graft.etl.TextIndex.search(s, "tidx_b", Seq("spark", "join", "window"))),
    benchSetup = Some((s, dir) =>
      graft.etl.TextIndex.build(s, T(s, dir, "documents"), "tidx_b")))

  /** LM-based document scoring — the perplexity-filter shape (CCNet
    * style: score each doc under a corpus LM, drop the tail) in this
    * repo's log-free engine-parity form: instead of mean log-prob
    * (libm `ln` differs between engines in the last ulp, and double
    * SUMS are partial-aggregation-order-dependent), the signal is
    * COUNT-based — the fraction of a doc's bigrams whose corpus
    * conditional probability falls below a rarity threshold, plus the
    * doc's minimum cond_p (min of identically-computed doubles is
    * deterministic). High rare_frac = the doc keeps surprising the
    * corpus LM — gibberish, boilerplate-mangled, or genuinely novel;
    * either way the bucket a curation pass inspects.
    *
    * One derivation discipline: the per-doc bigram frame feeds BOTH the
    * LM counts and the scoring join; shuffles carry two short words. */
  private val taLmScore = QueryDef(
    "ta_lm_score",
    Some("""
      WITH toks AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      dbi AS (
        SELECT doc_id, g[1] AS w1, g[2] AS w2 FROM (
          SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
            i -> [ws[i], ws[i+1]])) AS g
          FROM toks WHERE len(ws) >= 2)),
      bi AS (SELECT w1, w2, count(*) AS n FROM dbi GROUP BY 1, 2),
      ctx AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_ctx FROM bi GROUP BY w1),
      lm AS (SELECT w1, w2, n / n_ctx AS cond_p FROM bi JOIN ctx USING (w1)),
      per AS (
        SELECT d.doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(CASE WHEN lm.cond_p < 0.05 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_rare,
          MIN(lm.cond_p) AS min_p
        FROM dbi d JOIN lm USING (w1, w2)
        GROUP BY d.doc_id)
      SELECT doc.doc_id,
        COALESCE(per.n_bigrams, 0) AS n_bigrams,
        COALESCE(per.n_rare, 0) AS n_rare,
        CASE WHEN COALESCE(per.n_bigrams, 0) > 0
             THEN CAST(per.n_rare AS DOUBLE) / CAST(per.n_bigrams AS DOUBLE)
             ELSE 0.0 END AS rare_frac,
        per.min_p
      FROM documents doc LEFT JOIN per USING (doc_id)
      ORDER BY doc.doc_id"""),
    (s, dir) => {
      import s.implicits._
      val docBi = T(s, dir, "documents")
        .select($"doc_id", DedupOps.tokens($"text").as("toks"))
        .filter(size($"toks") >= 2)
        .select($"doc_id", $"toks",
          explode(sequence(lit(0), size($"toks") - 2)).as("i"))
        .select($"doc_id",
          element_at($"toks", $"i" + 1).as("w1"),
          element_at($"toks", $"i" + 2).as("w2"))
      val bi = docBi.groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
      val lm = bi
        .join(bi.groupBy($"w1").agg(sum($"n").as("n_ctx")), "w1")
        .select($"w1", $"w2", ($"n" / $"n_ctx").as("cond_p"))
      val per = docBi.join(lm, Seq("w1", "w2"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when($"cond_p" < 0.05, 1L).otherwise(0L)).as("n_rare"),
          min($"cond_p").as("min_p"))
      T(s, dir, "documents").select($"doc_id")
        .join(per, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
          coalesce($"n_rare", lit(0L)).as("n_rare"),
          when(coalesce($"n_bigrams", lit(0L)) > 0,
            $"n_rare".cast(DoubleType) / $"n_bigrams".cast(DoubleType))
            .otherwise(lit(0.0)).as("rare_frac"),
          $"min_p")
        .orderBy($"doc_id")
    })

  /** Per-document lexical diversity, log-free: Simpson's index
    * 1 − Σc²/n² and its inverse n²/Σc² ("effective vocabulary size" —
    * how many equally-frequent types would produce this concentration).
    * The standard diversity signal is Shannon entropy, but entropy needs
    * ln() (libm, no cross-engine bit guarantee) and an order-dependent
    * double sum; Simpson is its monotone sibling computed ENTIRELY in
    * integers — Σc and Σc² are exact BIGINT sums in any aggregation
    * order — with one double division at the end. Same filter decisions
    * (both rank documents identically for two-type distributions and
    * near-identically in practice), exact oracle replay.
    * Shape at scale: two keyed counts, shuffles carry (doc_id, token)
    * then doc_id-only — the same inverted-index frame every ta_ query
    * derives from. */
  private val taSimpson = QueryDef(
    "ta_simpson_diversity",
    Some("""
      WITH tok AS (
        SELECT doc_id,
          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS t
        FROM documents),
      cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
      agg AS (
        SELECT doc_id,
          CAST(sum(c) AS BIGINT) AS n_tokens,
          count(*) AS n_types,
          CAST(sum(c * c) AS BIGINT) AS sum_sq
        FROM cnt GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_types, sum_sq,
        1 - (sum_sq / (n_tokens * n_tokens)) AS simpson,
        (n_tokens * n_tokens) / sum_sq AS inv_simpson
      FROM agg
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .select($"doc_id", explode(DedupOps.tokens($"text")).as("t"))
        .groupBy($"doc_id", $"t")
        .agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(
          sum($"c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum($"c" * $"c").as("sum_sq"))
        .select($"doc_id", $"n_tokens", $"n_types", $"sum_sq",
          (lit(1) - $"sum_sq" / ($"n_tokens" * $"n_tokens")).as("simpson"),
          (($"n_tokens" * $"n_tokens") / $"sum_sq").as("inv_simpson"))
        .orderBy($"doc_id")
    })

  /** Hybrid retrieval — the RAG-serving composition: BM25 keyword
    * candidates reranked by embedding cosine against an anchor vector
    * (vec_id 0 stands in for the encoded query; in production the query
    * encoder supplies it). The lexical stage bounds the candidate set, so
    * the semantic stage is O(k) however big the corpus: candidates
    * broadcast into the embeddings join (big side streams), the anchor is
    * one broadcast row, and the rerank window ranks k rows (cheap by
    * construction — the deliberate small-cardinality global window).
    * Every scalar reuses an already-bit-exact primitive (BM25 fold,
    * cosine fold), so the whole composite hash-matches. */
  private val taHybrid = QueryDef(
    "ta_hybrid_retrieval",
    Some(s"""
      WITH bm AS ($bm25Oracle),
      q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT bm.doc_id, bm.bm25, bm.n_terms_hit,
          ${SimilarityOps.cosineSql("q.qv", "CAST(e.embedding AS DOUBLE[])")}
            AS cosine_sim
        FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id, q)
      SELECT doc_id, bm25, n_terms_hit, cosine_sim,
        ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, doc_id ASC) AS hybrid_rank
      FROM scored
      ORDER BY hybrid_rank"""),
    (s, dir) => {
      import s.implicits._
      val cand = bm25(T(s, dir, "documents"), Seq("spark", "join", "window"))
      val emb = T(s, dir, "embeddings")
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast(ArrayType(DoubleType)).as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"cosine_sim".desc, $"doc_id".asc)
      broadcast(cand)
        .join(emb.select($"vec_id".as("doc_id"),
          $"embedding".cast(ArrayType(DoubleType)).as("ev")), "doc_id")
        .crossJoin(broadcast(q))
        .select($"doc_id", $"bm25", $"n_terms_hit",
          graft.functions.CosineSimilarity.cosineNative(s, $"qv", $"ev")
            .as("cosine_sim"))
        .withColumn("hybrid_rank", row_number().over(w))
        .orderBy($"hybrid_rank")
    })

  /** Wordlist (blocklist) filtering — the C4-style safety stage: count
    * exact-token blocklist hits per document, their density, and the
    * keep decision. Token-exact matching (join on exploded tokens, the
    * blocklist broadcast), NOT substring matching — the classic
    * wordlist-filter false-positive ("class" containing "ass") is a
    * token-boundary bug, not a policy choice. The list itself is a
    * parameter; the declared instance uses neutral stand-in terms from
    * the synthetic corpus so the oracle exercises real hit counts. */
  def blocklistScore(documents: DataFrame, blocklist: Seq[String],
      maxDensity: Double = 0.1): DataFrame = {
    // normalize the LIST the same way the tokens are normalized
    // (DedupOps.tokens lowercases) — a mixed-case blocklist entry must
    // not silently never match
    val bl = documents.sparkSession
      .createDataset(blocklist)(org.apache.spark.sql.Encoders.STRING)
      .toDF("raw")
      .select(lower(trim(col("raw"))).as("t"))
    val hits = documents
      .select(col("doc_id"), explode(DedupOps.tokens(col("text"))).as("t"))
      .join(broadcast(bl), Seq("t"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
    val nHits = coalesce(col("n_hits"), lit(0L))
    documents
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        nHits.as("n_hits"),
        (nHits / col("n_tokens")).as("hit_density"),
        (nHits / col("n_tokens") <= maxDensity).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val taBlocklist = QueryDef(
    "ta_blocklist_filter",
    Some("""
      WITH tok AS (
        SELECT doc_id,
          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS t
        FROM documents),
      lens AS (
        SELECT doc_id,
          len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents),
      hits AS (
        SELECT doc_id, count(*) AS n_hits
        FROM tok WHERE t IN ('merge', 'spill')
        GROUP BY doc_id)
      SELECT lens.doc_id, lens.n_tokens,
        coalesce(hits.n_hits, 0) AS n_hits,
        coalesce(hits.n_hits, 0) / lens.n_tokens AS hit_density,
        coalesce(hits.n_hits, 0) / lens.n_tokens <= 0.1 AS keep
      FROM lens LEFT JOIN hits USING (doc_id)
      ORDER BY doc_id"""),
    (s, dir) => blocklistScore(T(s, dir, "documents"), Seq("merge", "spill")))

  /** Count-min sketch frequency audit (Cormode & Muthukrishnan, J.
    * Algorithms 55(1), 2005): estimate token frequencies from a fixed
    * `depth`×`width` counter grid and MEASURE the overestimate against
    * the exact counts of the `topK` most frequent tokens — the
    * [[SimilarityOps.mrlRecall]]/`sim_ann_recall` audit pattern applied
    * to the sketch family. Why it matters at 100 TB: an exact
    * token-frequency table shuffles one key per DISTINCT token
    * (billions at web scale), while the sketch is d×w integers total —
    * map-side partial aggregation collapses every partition to ≤ d×w
    * cells before the exchange, so the shuffle is O(d·w·partitions)
    * regardless of vocabulary, and any token's estimate is then a
    * broadcast-join away. The audit quantifies the price: CMS never
    * undercounts (every cell the token hashes to includes its true
    * count), and overestimate ≤ ε·N with probability 1−δ at
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Exact counting of the top-k side is the
    * audit's ground-truth cost, paid by definition. Hashes are the
    * portable [[DedupOps.md5Hash32]] so DuckDB replays the grid
    * bit-for-bit; all outputs are integers (no float drift). */
  /** A token's d sketch coordinates: exploded (row, bucket) structs,
    * hashed with the portable [[DedupOps.md5Hash32]]. Shared by the
    * audit and the persisted [[graft.etl.SketchStore]], so a stored
    * grid and a recomputed one always address the same cells. */
  private[graft] def cmsProbes(tok: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map { i =>
      struct(lit(i).as("i"),
        pmod(DedupOps.md5Hash32(concat_ws("_", lit(i), tok)),
          lit(width.toLong)).as("bucket"))
    }: _*))

  /** ONE corpus pass filling all `depth` rows of the d×w counter grid —
    * map-side partial aggregation collapses every partition to ≤ d·w
    * cells before the exchange. */
  def cmsCells(docs: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0,
      s"need positive sketch dims, got d=$depth w=$width")
    docs.select(explode(DedupOps.tokens(col("text"))).as("token"))
      .select(cmsProbes(col("token"), depth, width).as("cell"))
      .groupBy(col("cell.i").as("i"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  def countMinAudit(docs: DataFrame, depth: Int = 4, width: Int = 512,
      topK: Int = 20): DataFrame = {
    require(depth > 0 && width > 0 && topK > 0,
      s"need positive sketch dims, got d=$depth w=$width k=$topK")
    val toks = docs.select(explode(DedupOps.tokens(col("text"))).as("token"))
    def probes(tok: Column): Column = cmsProbes(tok, depth, width)
    val cells = cmsCells(docs, depth, width)
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("token").asc).limit(topK)
    exact.select(col("token"), col("exact_count"), probes(col("token")).as("cell"))
      .select(col("token"), col("exact_count"),
        col("cell.i").as("i"), col("cell.bucket").as("bucket"))
      .join(broadcast(cells), Seq("i", "bucket"))
      .groupBy(col("token"), col("exact_count"))
      .agg(min(col("c")).as("cm_estimate"))
      .select(col("token"), col("exact_count"), col("cm_estimate"),
        (col("cm_estimate") - col("exact_count")).as("overestimate"))
      .orderBy(col("exact_count").desc, col("token").asc)
  }

  private val taCountMin = QueryDef(
    "ta_countmin_sketch",
    Some("""
      WITH toks AS (
        SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
        FROM documents),
      seeds AS (SELECT unnest([0, 1, 2, 3]) AS i),
      cells AS (
        SELECT i,
          ('0x' || substr(md5(i || '_' || token), 25, 8))::UBIGINT::BIGINT % 512 AS bucket,
          count(*) AS c
        FROM toks CROSS JOIN seeds GROUP BY 1, 2),
      exact AS (
        SELECT token, count(*) AS exact_count FROM toks GROUP BY token
        ORDER BY exact_count DESC, token ASC LIMIT 20),
      est AS (
        SELECT e.token, e.exact_count, min(c.c) AS cm_estimate
        FROM exact e CROSS JOIN seeds s
        JOIN cells c ON c.i = s.i
          AND c.bucket = ('0x' || substr(md5(s.i || '_' || e.token), 25, 8))::UBIGINT::BIGINT % 512
        GROUP BY e.token, e.exact_count)
      SELECT token, exact_count, cm_estimate,
        cm_estimate - exact_count AS overestimate
      FROM est ORDER BY exact_count DESC, token ASC"""),
    (s, dir) => countMinAudit(T(s, dir, "documents")))

  /** The SERVING form of the sketch family: token-frequency point
    * queries answered from the persisted [[graft.etl.SketchStore]]
    * grid — O(d·w) state, ZERO corpus scans per ask (the
    * `ta_bm25_indexed`/`sim_lsh_indexed` offline-build/online-probe
    * split applied to frequency monitoring). The verify arm builds its
    * own store then probes it, so the oracle replay (grid + min over
    * the probe tokens' cells) constrains the WHOLE store round trip;
    * Bench times the probe only — the grid is corpus-size-independent,
    * so the probe's scale curve is flat by construction. */
  private val probeTokens =
    Seq("scan", "merge", "window", "graftmissingtoken")

  private val taSketchServed = QueryDef(
    "ta_sketch_served",
    Some("""
      WITH toks AS (
        SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
        FROM documents),
      seeds AS (SELECT unnest([0, 1, 2, 3]) AS i),
      cells AS (
        SELECT i,
          ('0x' || substr(md5(i || '_' || token), 25, 8))::UBIGINT::BIGINT % 512 AS bucket,
          count(*) AS c
        FROM toks CROSS JOIN seeds GROUP BY 1, 2),
      probes AS (SELECT unnest(['scan', 'merge', 'window', 'graftmissingtoken']) AS token),
      pcell AS (
        SELECT p.token, s.i,
          ('0x' || substr(md5(s.i || '_' || p.token), 25, 8))::UBIGINT::BIGINT % 512 AS bucket
        FROM probes p CROSS JOIN seeds s)
      SELECT pc.token, min(coalesce(c.c, 0)) AS cm_estimate
      FROM pcell pc LEFT JOIN cells c ON c.i = pc.i AND c.bucket = pc.bucket
      GROUP BY pc.token ORDER BY pc.token"""),
    (s, dir) => {
      graft.etl.SketchStore.build(s, T(s, dir, "documents"), "cms_v")
      graft.etl.SketchStore.estimate(s, "cms_v", probeTokens)
    },
    benchBuild = Some((s, dir) =>
      graft.etl.SketchStore.estimate(s, "cms_b", probeTokens)),
    benchSetup = Some((s, dir) =>
      graft.etl.SketchStore.build(s, T(s, dir, "documents"), "cms_b")))

  /** EXACT heavy hitters with bounded-state plumbing: pass 1 runs the
    * Misra-Gries summary ([[graft.functions.HeavyHittersAggregate]] —
    * partial aggregates carry ≤ k entries per map task, so the shuffle
    * is O(k·partitions) regardless of vocabulary) plus the stream
    * length in ONE aggregate; pass 2 exact-counts ONLY the ≤ k
    * candidates (an isin filter pushed to the scan) and keeps tokens
    * at ≥ 1/`pctDen` (default 2.5%) of all occurrences. MG's guarantee — any item
    * with count > n/(k+1) survives the summary — makes the composite
    * EXACT whenever k+1 > pctDen, which is why a plain GROUP BY oracle
    * can hash-match it: approximation in the plumbing, none in the
    * answer. */
  def heavyHitterTokens(s: SparkSession, docs: DataFrame, k: Int = 63,
      pctDen: Int = 40): DataFrame = {
    require(k + 1 > pctDen,
      s"MG guarantee needs k+1 > pctDen for an exact answer, got k=$k pctDen=$pctDen")
    val toks = docs.select(explode(DedupOps.tokens(col("text"))).as("token"))
    val summary = toks.agg(
      graft.functions.HeavyHittersAggregate.heavyHitters(s, col("token"), k)
        .as("cands"),
      count(lit(1)).as("n_total")).head
    val n = summary.getLong(1)
    // ≤ k candidate strings — driver-bounded by the aggregate's capacity
    val cands = summary.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    toks.filter(col("token").isin(cands: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(pctDen.toLong) >= lit(n))
      .select(col("token"), col("cnt"), lit(n).as("n_total"))
      .orderBy(col("cnt").desc, col("token").asc)
  }

  private val taHeavyHitters = QueryDef(
    "ta_heavy_hitters",
    Some("""
      WITH toks AS (
        SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
        FROM documents),
      tot AS (SELECT count(*) AS n FROM toks),
      cnts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
      SELECT c.token, c.cnt, t.n AS n_total
      FROM cnts c, tot t
      WHERE c.cnt * 40 >= t.n
      ORDER BY cnt DESC, token ASC"""),
    (s, dir) => heavyHitterTokens(s, T(s, dir, "documents")))

  override val defs: Seq[QueryDef] =
    Seq(taTokens, taQuality, taLangId, taFingerprint, taBpe, taPii, taTfidf,
      taBigramLm, taLmScore, taBm25, taBm25Indexed, taSimpson, taHybrid,
      taBlocklist, taCountMin, taSketchServed, taHeavyHitters)
}
