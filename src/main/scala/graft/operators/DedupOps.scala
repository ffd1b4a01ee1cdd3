package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication suite over the `documents` table — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard (BASELINE.json north-star operators).
  *
  * Scale design (100 TB corpus):
  *  - exact dedup groups on a 16-byte md5 fingerprint, never the text;
  *  - MinHash/LSH shuffles (band-hash → doc) pairs, i.e. O(docs × bands)
  *    small rows, and only brute-forces within a bucket — the standard
  *    shingle→minhash→band→bucket-join pipeline, fully distributed;
  *  - all hashing is `xxhash64`/`hash` (codegen'd Catalyst expressions,
  *    deterministic across runs/executors) — no UDFs, no RNG at runtime.
  */
object DedupOps extends QueryModule {

  /** Normalized word tokens of a text column. */
  def tokens(text: Column): Column =
    split(lower(trim(regexp_replace(text, "\\s+", " "))), " ")

  /** Sliding word n-grams from an ALREADY-MATERIALIZED tokens column.
    *
    * The tokens argument must be a plain column reference, not an inline
    * `split(...)` expression: higher-order-function lambdas re-evaluate
    * captured non-attribute expressions per element, which turns shingle
    * generation quadratic (measured 28s → 0.6s at sf0.1 for 5k docs).
    * Use [[shingles]] only for ad-hoc/small frames. */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column =
    filter(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(size(toks) >= n,
          concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))),
      x => x.isNotNull)

  /** Convenience composition for literals / tiny frames — see the
    * performance caveat on [[shinglesFromTokens]]. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Distinct (doc_id, shingle) rows — the corpus-scale entry point.
    *
    * Deliberately NOT `explode(shingles(text))`: Catalyst collapses the
    * shingle projection into the Generate and re-inlines `split(text)`
    * into the per-element lambda, making extraction quadratic in tokens
    * (measured 13s vs 1s at sf0.1). Instead the INDEX range is exploded
    * and each shingle is assembled after the explode from the
    * materialized `toks` attribute — O(1) per output row, and the
    * distinct() is the same keyed shuffle a 100 TB corpus pass needs
    * anyway. */
  def shingleRows(documents: DataFrame, n: Int = 3): DataFrame =
    documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - n)).as("i"))
      .select(col("doc_id"),
        concat_ws(" ",
          (0 until n).map(k => element_at(col("toks"), col("i") + k + 1)): _*)
          .as("shingle"))
      .distinct()

  /** MinHash signature: for each of `k` permutations, min over shingles of
    * xxhash64(shingle, seed). Returns array<long> of length k. */
  def minhashSignature(shingleCol: Column, k: Int = 32): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingleCol, sh => xxhash64(sh, seed))))

  /** 64-bit SimHash: sign-aggregate of per-token hash bits weighted ±1.
    * Pure column expressions: for each bit position, count tokens whose
    * xxhash64 has that bit set vs total; bit = 1 if majority. Bits are
    * folded MSB-first (`acc*2 + bit`), wrapping into the sign bit —
    * requires ANSI off (our sessions pin it, matching Athena's permissive
    * semantics per SURVEY §7.4). */
  def simhash64(tokens: Column): Column = {
    val hs = transform(tokens, t => xxhash64(t))
    val nTok = size(hs)
    val bits = transform(
      sequence(lit(63), lit(0), lit(-1)),
      b =>
        when(
          aggregate(
            hs,
            lit(0),
            (acc, h) => acc + call_function("shiftright", h, b).bitwiseAND(lit(1L)).cast(IntegerType)) * 2 > nTok,
          lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, x) => acc * 2 + x)
  }

  /** Exact dedup: group by content fingerprint, keep min doc_id.
    * Ref pattern: `dropDuplicates` `bronze_ingest_streamate_mock.py:44-45`,
    * here keyed on a hash so the shuffle never carries document bodies. */
  private val ddExact = QueryDef(
    "dd_exact_dedup",
    Some("""
      SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY keeper_id"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "documents")
        .groupBy(md5(lower(trim(regexp_replace($"text", "\\s+", " ")))).as("fingerprint"))
        .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
        .orderBy($"keeper_id")
    })

  /** N-gram Jaccard near-dup pairs via an inverted shingle index —
    * distributed: explode shingles, self-join on shingle, count
    * intersections, Jaccard = |∩| / (|A|+|B|-|∩|). Threshold 0.6. */
  private val ddJaccard = QueryDef(
    "dd_ngram_jaccard",
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
          list_transform(range(1, greatest(len(ws) - 1, 1)),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
        FROM toks WHERE len(ws) >= 3),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b,
        i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.6
      ORDER BY doc_a, doc_b"""),
    (s, dir) => {
      import s.implicits._
      // `exploded` is consumed three times (sizes + both self-join sides).
      // NOT persisted: a round-2 persist of the exploded shingle rows made
      // the query 3x slower (cache write + lost pipelining cost more than
      // the recompute) and squatted on executor memory. Instead the
      // distinct()'s shuffle inside shingleRows is a single exchange that
      // ReuseExchange shares across all three consumers, so the corpus is
      // scanned and shingled ONCE; only the compact post-shuffle rows are
      // re-aggregated per consumer. The per-doc `sizes` aggregate (one row
      // per doc) is broadcast into the final joins.
      val exploded = shingleRows(T(s, dir, "documents"))
      val sizes = exploded.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val a = exploded.as("a")
      val b = exploded.as("b")
      val inter = a
        .join(b, $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      val sa = sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_sh_a"))
      val sb = sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_sh_b"))
      inter
        .join(broadcast(sa), "doc_a")
        .join(broadcast(sb), "doc_b")
        .select(
          $"doc_a", $"doc_b",
          ($"n_inter" / ($"n_sh_a" + $"n_sh_b" - $"n_inter")).as("jaccard"))
        .filter($"jaccard" >= 0.6)
        .orderBy($"doc_a", $"doc_b")
    })

  /** Seeded portable hash for cross-engine minhash replay: md5 of
    * "<seed>_<value>", low 32 bits. */
  val portableSeededHash: (Column, Int) => Column =
    (c, seed) => md5Hash32(concat_ws("_", lit(seed), c))

  /** DuckDB replay of the ENTIRE MinHash-LSH pipeline (shingles → 32-perm
    * signature → 8 banded buckets → candidate bucket-join → exact-Jaccard
    * verify) using the portable seeded hash — generated, since the
    * signature/band columns are mechanical. Returns the CTE chain ending
    * in `pairs(doc_a, doc_b, jaccard)` so the pair query, the
    * connected-components query, and the corpus-curation oracle all
    * build on it; `src` is the relation/CTE scanned for (doc_id, text)
    * rows. */
  private[operators] def minhashCtes(threshold: Double, numPerms: Int,
      bands: Int, src: String = "documents"): String = {
    val r = numPerms / bands
    val p = minhashPrime
    def h32(arg: String) =
      s"('0x' || substr(md5($arg), 25, 8))::UBIGINT::BIGINT"
    val sigCols = (0 until numPerms)
      .map(i => s"MIN((h1 + $i * h2) % $p) AS h$i")
      .mkString(",\n            ")
    val bucketCols = (0 until bands).map { b =>
      val hs = (0 until r).map(i => s"h${b * r + i}").mkString(", ")
      s"${h32(s"'${b}_' || concat_ws('_', $hs)")} AS b$b"
    }.mkString(",\n            ")
    val bandedUnion = (0 until bands)
      .map(b => s"SELECT doc_id, $b AS band, b$b AS bucket FROM buckets")
      .mkString("\n          UNION ALL ")
    s"""
      toks AS (
        SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
        FROM $src),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
          list_transform(range(1, greatest(len(ws) - 1, 1)),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
        FROM toks WHERE len(ws) >= 3),
      shh AS (
        SELECT doc_id, shingle,
          ${h32("'0_' || shingle")} % $p AS h1,
          ${h32("'1_' || shingle")} % $p AS h2
        FROM sh),
      sig AS (SELECT doc_id, COUNT(*) AS n_sh,
            $sigCols
          FROM shh GROUP BY doc_id),
      buckets AS (SELECT doc_id,
            $bucketCols
          FROM sig),
      banded AS (
          $bandedUnion),
      cands AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        FROM cands c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY c.doc_a, c.doc_b),
      pairs AS (
        SELECT i.doc_a, i.doc_b,
          i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
        FROM inter i
        JOIN sig sa ON i.doc_a = sa.doc_id
        JOIN sig sb ON i.doc_b = sb.doc_id
        WHERE i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter) >= $threshold)"""
  }

  private def minhashOracle(threshold: Double, numPerms: Int, bands: Int): String =
    s"""
      WITH ${minhashCtes(threshold, numPerms, bands)}
      SELECT doc_a, doc_b, jaccard FROM pairs
      ORDER BY doc_a, doc_b"""

  /** Transitive near-dup clusters as a recursive closure over the minhash
    * pairs: DuckDB walks the undirected pair graph (WITH RECURSIVE; UNION
    * dedup bounds the recursion) and labels each doc with the minimum
    * reachable doc_id — exactly what the distributed
    * [[ConnectedComponents.components]] star-contraction computes. */
  /** Shared CTE chain: minhash pairs → undirected edges → transitive
    * closure walk. Terminal SELECTs build the per-doc labels
    * ([[componentsOracle]]) or the size distribution
    * ([[clusterStatsOracle]]) on top. */
  private def componentsOracle(threshold: Double, numPerms: Int, bands: Int): String =
    s"""
      WITH RECURSIVE ${minhashCtes(threshold, numPerms, bands)},
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs),
      walk(node, reach) AS (
        SELECT a, a FROM edges
        UNION
        SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.reach)
      SELECT CAST(node AS BIGINT) AS doc_id,
        CAST(MIN(reach) AS BIGINT) AS component
      FROM walk
      GROUP BY node
      ORDER BY doc_id"""

  private def clusterStatsOracle(threshold: Double, numPerms: Int,
      bands: Int): String =
    s"""
      WITH RECURSIVE ${minhashCtes(threshold, numPerms, bands)},
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
      sizes AS (
        SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
      SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
        COUNT(*) AS n_clusters,
        CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
      FROM sizes
      GROUP BY cluster_size
      ORDER BY cluster_size"""

  /** MinHash + banded LSH candidate pairs, verified by true Jaccard.
    * Declared with the portable md5 hash so the WHOLE pipeline —
    * signatures, banding, candidate generation, verify — hash-matches a
    * DuckDB oracle; the xxhash64 default remains for production callers
    * (CorpusPipeline). ScalaTest additionally asserts the candidate set
    * catches the corpus's planted near-dup prefixes. */
  private val ddMinhash = QueryDef(
    "dd_minhash_lsh",
    Some(minhashOracle(threshold = 0.5, numPerms = 32, bands = 8)),
    (s, dir) => minhashNearDups(s, T(s, dir, "documents"),
      hashFn = portableSeededHash),
    // Bench measures the production pipeline (xxhash64). The md5-derived
    // portable hash exists only so DuckDB can replay the signatures
    // value-for-value; its scalar cost (md5 + hex parse per (doc,shingle)
    // row ×2 + per band) is not what a production corpus pass pays.
    benchBuild = Some((s, dir) => minhashNearDups(s, T(s, dir, "documents"))))

  /** Portable 32-bit token hash both engines compute bit-identically:
    * the low 8 hex chars of md5, parsed base-16. xxhash64 is faster but
    * Spark-only — use this variant when a DuckDB oracle must replay the
    * pipeline value-for-value. */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 25, 8), 16, 10).cast(LongType)

  /** SimHash over a whole corpus, shaped for scale: explode tokens, hash
    * each ONCE, then one hash-aggregate computing all bit-majorities —
    * the array-HOF variant ([[simhash64]]) inlines the token hashing into
    * every bit expression (64× recompute), fine for ad-hoc columns but not
    * for a corpus pass. Defaults to 64-bit xxhash64; pass
    * `bits = 32, hashFn = md5Hash32` for the oracle-portable variant. */
  def simhashCorpus(documents: DataFrame, bits: Int = 64,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val toks = documents.select(
      col("doc_id"),
      explode(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")).as("tok"))
    val hashed = toks.select(col("doc_id"), hashFn(col("tok")).as("h"))
    val bitSums = hashed.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tok"),
      (0 until bits).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"s$b")): _*)
    val sim = (bits - 1 to 0 by -1).foldLeft(lit(0L)) { (acc, b) =>
      acc * 2 + when(col(s"s$b") * 2 > col("n_tok"), 1L).otherwise(0L)
    }
    bitSums.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash buckets: docs sharing a simhash are near-dup candidates.
    * Declared with the 32-bit md5 hash so DuckDB can replay it
    * value-for-value (hash-match oracle); the algorithm under test —
    * explode, hash once, bit-majority aggregate, MSB-first fold — is
    * identical to the 64-bit xxhash64 production default. */
  private val ddSimhash = QueryDef(
    "dd_simhash",
    Some("""
      WITH toks AS (
        SELECT doc_id,
          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        FROM documents),
      hs AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 25, 8))::UBIGINT::BIGINT AS h
        FROM toks),
      bitrows AS (
        SELECT doc_id, b, SUM((h >> b) & 1) AS ones, COUNT(*) AS n
        FROM hs CROSS JOIN range(32) t(b)
        GROUP BY doc_id, b)
      SELECT doc_id,
        CAST(SUM(CASE WHEN ones * 2 > n THEN 1::BIGINT << b ELSE 0 END) AS BIGINT)
          AS simhash
      FROM bitrows
      GROUP BY doc_id
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      simhashCorpus(T(s, dir, "documents"), bits = 32, hashFn = md5Hash32)
        .orderBy($"doc_id")
    })

  /** Full MinHash-LSH near-dup pipeline: shingle → 32-perm signature →
    * 8 bands × 4 rows → bucket equi-join for candidates → exact-Jaccard
    * verify (≥ threshold) computed over the inverted index restricted to
    * candidate pairs.
    *
    * Shaped for scale: the signature is ONE hash-aggregate over the
    * exploded (doc, shingle) table (32 codegen'd min() columns — no
    * nested higher-order functions in the hot path), candidates come from
    * a bucket equi-join (never a cross product), and the verify step only
    * touches candidate pairs. `sh` feeds the signature and both verify
    * sides, but shingle EXTRACTION still runs once: the distinct()'s
    * shuffle inside [[shingleRows]] is one exchange that ReuseExchange
    * shares across all consumers (deliberately no persist — measured
    * slower than the exchange-level reuse on this workload, see
    * dd_ngram_jaccard). Per-doc sizes ride along in the signature
    * aggregate instead of a second pass. */
  /** Modulus for derived minhash permutations: largest prime < 2^32, so
    * `h1 + i*h2` (h1, h2 < 2^32, i < 64) never overflows a signed 64-bit
    * integer — exact and identical in Spark AND DuckDB (whose BIGINT
    * errors on overflow instead of wrapping). */
  val minhashPrime: Long = 4294967291L

  /** `pairPredicate(docA, docB)` prunes candidate pairs AT GENERATION
    * (inside the band-bucket join), before any verify work — e.g. the
    * cross-corpus restriction of [[ddIncremental]]. Defaults to all
    * pairs. */
  /** MinHash signature aggregate over (doc_id, shingle) rows: one row per
    * doc with `n_sh` (distinct shingle count, the Jaccard denominator
    * input) and `numPerms` min-hash columns `h0..h{k-1}`.
    *
    * Broder double-hashing: each shingle is hashed TWICE (not once per
    * permutation); permutation i = (h1 + i*h2) mod P, derived
    * arithmetically inside the aggregate. h1/h2 are materialized as
    * attributes first so Catalyst computes them once per row, not once
    * per permutation column (the HOF-inlining trap, agg flavor). */
  private[graft] def minhashSigFromShingles(sh: DataFrame, numPerms: Int,
      hashFn: (Column, Int) => Column): DataFrame = {
    val shH = sh.select(col("doc_id"),
      pmod(hashFn(col("shingle"), 0), lit(minhashPrime)).as("h1"),
      pmod(hashFn(col("shingle"), 1), lit(minhashPrime)).as("h2"))
    shH.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_sh"),
      (0 until numPerms).map(i =>
        min((col("h1") + lit(i.toLong) * col("h2")) % minhashPrime).as(s"h$i")): _*)
  }

  /** LSH banding of a signature frame: (doc_id, band, bucket) rows, one
    * per band, where `bucket` hashes that band's `numPerms/bands`
    * signature rows. Docs sharing (band, bucket) are candidates. */
  private[graft] def bandedBuckets(sig: DataFrame, numPerms: Int, bands: Int,
      hashFn: (Column, Int) => Column): DataFrame = {
    val rowsPerBand = numPerms / bands
    val bandCols = (0 until bands).map { b =>
      val rowsCols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      hashFn(concat_ws("_", rowsCols: _*), b).as(s"b$b")
    }
    sig
      .select(col("doc_id") +: bandCols: _*)
      .select(
        col("doc_id"),
        posexplode(array((0 until bands).map(b => col(s"b$b")): _*)).as(Seq("band", "bucket")))
  }

  /** Cross-frame near-dup verify core shared by the persisted-index
    * probe ([[graft.etl.MinhashIndex.incrementalPairs]]) and the
    * frame-vs-frame probe ([[minhashPairsAgainst]]): candidates from the
    * (band, bucket) equi-join, exact-Jaccard verify restricted to them.
    * Corpus-side inputs may be bucketed table reads (exchange-free) or
    * derived frames; batch-side sizes ride a broadcast (genuinely
    * small), corpus-side sizes a plain join (one row per corpus doc is
    * NOT driver-small at 100 TB). */
  private[graft] def crossPairs(shNew: DataFrame, sigNew: DataFrame,
      bandedNew: DataFrame, shOld: DataFrame, bandedOld: DataFrame,
      sizesOld: DataFrame, threshold: Double): DataFrame = {
    val cands = bandedNew.as("x")
      .join(bandedOld.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .select(col("y.doc_id").as("doc_old"), col("x.doc_id").as("doc_new"))
      .distinct()
    val inter = cands
      .join(shNew.select(col("doc_id").as("doc_new"), col("shingle")), "doc_new")
      .join(shOld.select(col("doc_id").as("doc_old"), col("shingle")),
        Seq("doc_old", "shingle"))
      .groupBy(col("doc_old"), col("doc_new"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizesOld.select(col("doc_id").as("doc_old"), col("n_sh").as("n_old")),
        "doc_old")
      .join(broadcast(sigNew.select(col("doc_id").as("doc_new"), col("n_sh").as("n_new"))),
        "doc_new")
      .select(col("doc_old"), col("doc_new"),
        (col("n_inter") / (col("n_old") + col("n_new") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_old"), col("doc_new"))
  }

  /** Near-dup pairs BETWEEN two document frames — the frame-vs-frame
    * probe a streaming lexical dedup runs per micro-batch against its
    * accumulated kept set ([[graft.streaming.CorpusStream.minhashDedupStream]]).
    * Both sides' signatures derive here; when the corpus side is stable
    * across many probes, persist it once as a
    * [[graft.etl.MinhashIndex]] instead. */
  def minhashPairsAgainst(s: SparkSession, batch: DataFrame,
      corpus: DataFrame, threshold: Double = 0.5, numPerms: Int = 32,
      bands: Int = 8,
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))): DataFrame = {
    val shNew = shingleRows(batch)
    val sigNew = minhashSigFromShingles(shNew, numPerms, hashFn)
    val shOld = shingleRows(corpus)
    val sigOld = minhashSigFromShingles(shOld, numPerms, hashFn)
    crossPairs(shNew, sigNew, bandedBuckets(sigNew, numPerms, bands, hashFn),
      shOld, bandedBuckets(sigOld, numPerms, bands, hashFn),
      sigOld.select(col("doc_id"), col("n_sh")), threshold)
  }

  def minhashNearDups(s: SparkSession, documents: DataFrame,
      threshold: Double = 0.5, numPerms: Int = 32, bands: Int = 8,
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed)),
      pairPredicate: (Column, Column) => Column = (_, _) => lit(true)): DataFrame = {
    import s.implicits._
    val sh = shingleRows(documents)
    val sig = minhashSigFromShingles(sh, numPerms, hashFn)
    val banded = bandedBuckets(sig, numPerms, bands, hashFn)
    val cands = banded.as("x")
      .join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.bucket" === $"y.bucket" &&
          $"x.doc_id" < $"y.doc_id" &&
          pairPredicate($"x.doc_id", $"y.doc_id"))
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    val sizes = sig.select($"doc_id", $"n_sh")
    val inter = cands
      .join(sh.select($"doc_id".as("doc_a"), $"shingle"), "doc_a")
      .join(sh.select($"doc_id".as("doc_b"), $"shingle"), Seq("doc_b", "shingle"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a"))), "doc_a")
      .join(broadcast(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b"))), "doc_b")
      .select(
        $"doc_a", $"doc_b",
        ($"n_inter" / ($"n_a" + $"n_b" - $"n_inter")).as("jaccard"))
      .filter($"jaccard" >= threshold)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Embedding-cosine near-dup pairs — the semantic sibling of the
    * lexical modes above (catches paraphrases shingles miss). Exact and
    * oracle-checked: every i<j pair with cosine ≥ τ, computed with the
    * fused codegen cosine ([[graft.functions.CosineSimilarity]], same
    * left-to-right fold DuckDB replays bit-exactly). One side broadcast
    * ⇒ BroadcastNestedLoopJoin, no shuffle.
    *
    * Scale note: the exact all-pairs verify is O(N²) and is the right
    * tool only below ~10⁵ vectors (here: ≤2k). A 100 TB corpus runs
    * candidate generation FIRST and applies exactly this cosine
    * threshold to candidates only — [[embeddingNearDups]] enforces that
    * envelope with a count guard that auto-routes oversized inputs to
    * [[SimilarityOps.semanticPairs]]; the operator and its oracle pin
    * the verify semantics both paths share. */

  /** Embedding near-dup pairs with a scale-envelope guard. At or below
    * `maxExactVectors` (default 10⁵ — the documented ceiling where an
    * all-pairs broadcast NLJ stops being the right tool) the result is
    * EXACT: every i<j pair with cosine ≥ tau. Above it the input is
    * auto-routed to the LSH-bucketed candidate path
    * ([[SimilarityOps.semanticPairs]] — bucketed self-equi-join, never
    * all-pairs), with the same cosine threshold applied to candidates;
    * recall is then LSH-bounded, which is the only honest option at a
    * size where the exact tool cannot finish. The guard costs one count
    * over a single projected column. */
  def embeddingNearDups(s: SparkSession, embeddings: DataFrame,
      tau: Double = 0.4, maxExactVectors: Long = 100000L): DataFrame = {
    import s.implicits._
    import graft.functions.CosineSimilarity
    val emb = embeddings
      .select($"vec_id", $"embedding".cast(ArrayType(DoubleType)).as("v"))
    if (emb.select($"vec_id").count() <= maxExactVectors) {
      val a = emb.select($"vec_id".as("id_a"), $"v".as("v_a"))
      val b = emb.select($"vec_id".as("id_b"), $"v".as("v_b"))
      a.join(broadcast(b), $"id_a" < $"id_b")
        .select($"id_a", $"id_b",
          CosineSimilarity.cosineNative(s, $"v_a", $"v_b").as("cosine_sim"))
        .filter($"cosine_sim" >= tau)
        .orderBy($"id_a", $"id_b")
    } else {
      SimilarityOps.semanticPairs(s, embeddings, tau)
        .join(emb.select($"vec_id".as("id_a"), $"v".as("v_a")), "id_a")
        .join(emb.select($"vec_id".as("id_b"), $"v".as("v_b")), "id_b")
        .select($"id_a", $"id_b",
          CosineSimilarity.cosineNative(s, $"v_a", $"v_b").as("cosine_sim"))
        .orderBy($"id_a", $"id_b")
    }
  }
  private val ddEmbedding = QueryDef(
    "dd_embedding_neardup",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                    (acc, x) -> acc + x)
          / (sqrt(list_reduce(list_transform(list_zip(a.v, a.v),
                                             p -> p[1] * p[2]),
                              (acc, x) -> acc + x))
             * sqrt(list_reduce(list_transform(list_zip(b.v, b.v),
                                               p -> p[1] * p[2]),
                                (acc, x) -> acc + x)))
          AS cosine_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                        (acc, x) -> acc + x)
          / (sqrt(list_reduce(list_transform(list_zip(a.v, a.v),
                                             p -> p[1] * p[2]),
                              (acc, x) -> acc + x))
             * sqrt(list_reduce(list_transform(list_zip(b.v, b.v),
                                               p -> p[1] * p[2]),
                                (acc, x) -> acc + x))) >= 0.4
      ORDER BY id_a, id_b"""),
    (s, dir) => embeddingNearDups(s, T(s, dir, "embeddings")))

  /** Cluster ids for every doc in a near-dup pair: minhash pairs → star
    * contraction → (doc_id, component-min). The piece that makes near-dup
    * REMOVAL transitive-consistent (keep one doc per cluster, not "drop
    * the right side of each pair" — see [[ConnectedComponents]]). */
  def minhashComponents(s: SparkSession, documents: DataFrame,
      threshold: Double = 0.5,
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))): DataFrame = {
    val pairs = minhashNearDups(s, documents, threshold = threshold, hashFn = hashFn)
    ConnectedComponents.components(s, pairs.select(col("doc_a"), col("doc_b")))
      .select(col("node").as("doc_id"), col("component"))
  }

  private val ddComponents = QueryDef(
    "dd_components",
    Some(componentsOracle(threshold = 0.5, numPerms = 32, bands = 8)),
    (s, dir) => minhashComponents(s, T(s, dir, "documents"),
      hashFn = portableSeededHash).orderBy(col("doc_id")),
    benchBuild = Some((s, dir) =>
      minhashComponents(s, T(s, dir, "documents")).orderBy(col("doc_id"))))

  /** Near-dup cluster SIZE DISTRIBUTION — the dedup health report a
    * curation run reads first: how many pairs vs long chains vs
    * pathological mega-clusters (a size-10⁶ cluster usually means a
    * boilerplate template, not real duplication, and warrants a
    * different policy than keep-one). Aggregation on top of
    * [[minhashComponents]]; cost is the components run plus two tiny
    * keyed counts. */
  def clusterSizeStats(s: SparkSession, documents: DataFrame,
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))
  ): DataFrame =
    minhashComponents(s, documents, hashFn = hashFn)
      .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy(col("cluster_size"))

  private val ddClusterStats = QueryDef(
    "dd_cluster_stats",
    Some(clusterStatsOracle(threshold = 0.5, numPerms = 32, bands = 8)),
    (s, dir) => clusterSizeStats(s, T(s, dir, "documents"),
      hashFn = portableSeededHash),
    benchBuild = Some((s, dir) => clusterSizeStats(s, T(s, dir, "documents"))))

  /** SimHash near-dup PAIRS within a Hamming ball (Manku/Google style):
    * split the b-bit simhash into maxDist+1 blocks — any pair within
    * Hamming distance maxDist must agree on at least one whole block
    * (pigeonhole) — so candidates come from a block-value equi-join,
    * never an all-pairs scan, and the exact `bit_count(xor)` verify only
    * touches candidates. Completes the [[simhashCorpus]] pipeline, which
    * alone only finds EXACT hash collisions.
    *
    * Ref: Manku, Jain, Sarma — "Detecting Near-Duplicates for Web
    * Crawling" (WWW'07), the canonical simhash-at-scale design. */
  def simhashHammingPairs(documents: DataFrame, bits: Int = 64,
      hashFn: Column => Column = xxhash64(_), maxDist: Int = 3): DataFrame = {
    val nBlocks = maxDist + 1
    val blockBits = bits / nBlocks
    val mask = (1L << blockBits) - 1
    val blocks = simhashCorpus(documents, bits, hashFn)
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("b"))
      .select(col("doc_id"), col("simhash"), col("b"),
        call_function("shiftright", col("simhash"), col("b") * blockBits)
          .bitwiseAND(lit(mask)).as("bv"))
    val left = blocks.select(col("doc_id").as("doc_a"),
      col("simhash").as("sim_a"), col("b"), col("bv"))
    val right = blocks.select(col("doc_id").as("doc_b"),
      col("simhash").as("sim_b"), col("b").as("b2"), col("bv").as("bv2"))
    left
      .join(right,
        col("b") === col("b2") && col("bv") === col("bv2")
          && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .distinct() // a pair agreeing on several blocks appears once
      .select(col("doc_a"), col("doc_b"),
        call_function("bit_count", col("sim_a").bitwiseXOR(col("sim_b")))
          .as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Declared with the 32-bit md5-portable hash (8-bit blocks) so DuckDB
    * replays it value-for-value; Bench measures the 64-bit xxhash64
    * production variant (16-bit blocks) — same plan, production scalars. */
  private val ddSimhashHamming = QueryDef(
    "dd_simhash_hamming",
    Some("""
      WITH toks AS (
        SELECT doc_id,
          unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
        FROM documents),
      hs AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 25, 8))::UBIGINT::BIGINT AS h
        FROM toks),
      bitrows AS (
        SELECT doc_id, b, SUM((h >> b) & 1) AS ones, COUNT(*) AS n
        FROM hs CROSS JOIN range(32) t(b)
        GROUP BY doc_id, b),
      sims AS (
        SELECT doc_id,
          CAST(SUM(CASE WHEN ones * 2 > n THEN 1::BIGINT << b ELSE 0 END) AS BIGINT)
            AS simhash
        FROM bitrows GROUP BY doc_id),
      blocks AS (
        SELECT doc_id, simhash, b, (simhash >> (b * 8)) & 255 AS bv
        FROM sims CROSS JOIN range(4) t(b)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
          a.simhash AS sim_a, c.simhash AS sim_b
        FROM blocks a JOIN blocks c ON a.b = c.b AND a.bv = c.bv
          AND a.doc_id < c.doc_id)
      SELECT doc_a, doc_b,
        CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
      FROM cand
      WHERE bit_count(xor(sim_a, sim_b)) <= 3
      ORDER BY doc_a, doc_b"""),
    (s, dir) =>
      simhashHammingPairs(T(s, dir, "documents"), bits = 32,
        hashFn = md5Hash32)
        .orderBy(col("doc_a"), col("doc_b")),
    benchBuild = Some((s, dir) =>
      simhashHammingPairs(T(s, dir, "documents"))
        .orderBy(col("doc_a"), col("doc_b"))))

  /** Incremental ingest dedup: near-dup pairs BETWEEN a new batch
    * (doc_id % 10 = 0 stands in for "this batch" — scale-factor
    * independent) and the existing corpus — the shape every continuous
    * ingestion pipeline runs per batch. The cross-corpus restriction is
    * applied INSIDE the band-bucket join (pairPredicate), so within-batch
    * and within-corpus pairs never reach the verify stage. At 100 TB the
    * corpus-side signatures/buckets come from the persisted
    * [[graft.etl.MinhashIndex]] (`dd_incremental_indexed`) — this query
    * pins the join/verify semantics that index serves. */
  private def incrementalPairs(s: SparkSession, docs: DataFrame,
      hashFn: (Column, Int) => Column): DataFrame = {
    val isNew: Column => Column = id => id % 10 === 0
    minhashNearDups(s, docs, hashFn = hashFn,
      pairPredicate = (a, b) => isNew(a) =!= isNew(b))
      .select(
        when(isNew(col("doc_a")), col("doc_b")).otherwise(col("doc_a"))
          .as("doc_old"),
        when(isNew(col("doc_a")), col("doc_a")).otherwise(col("doc_b"))
          .as("doc_new"),
        col("jaccard"))
      .orderBy(col("doc_old"), col("doc_new"))
  }

  private val ddIncremental = QueryDef(
    "dd_incremental_neardup",
    Some(s"""
      WITH ${minhashCtes(0.5, 32, 8)}
      SELECT
        CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS doc_old,
        CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS doc_new,
        jaccard
      FROM pairs
      WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)
      ORDER BY doc_old, doc_new"""),
    (s, dir) => incrementalPairs(s, T(s, dir, "documents"),
      hashFn = portableSeededHash),
    benchBuild = Some((s, dir) => incrementalPairs(s, T(s, dir, "documents"),
      hashFn = (c, seed) => xxhash64(c, lit(seed)))))

  /** The same incremental near-dup check served from a PERSISTED
    * corpus-side index ([[graft.etl.MinhashIndex]]) instead of
    * recomputing the corpus per batch — what a continuous-ingest
    * pipeline actually runs at 100 TB. The oracle is the full recompute
    * replay (identical to [[ddIncremental]]'s), so a green row proves
    * batch-vs-index equivalence end to end. Verify's `build` rebuilds
    * the index inline (correctness never reads stale state); Bench
    * treats the build as the offline job it is (`benchSetup`) and times
    * only the per-batch probe. */
  private val newBatch: Column = col("doc_id") % 10 === 0

  private val ddIncrementalIndexed = QueryDef(
    "dd_incremental_indexed",
    Some(s"""
      WITH ${minhashCtes(0.5, 32, 8)}
      SELECT
        CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS doc_old,
        CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS doc_new,
        jaccard
      FROM pairs
      WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)
      ORDER BY doc_old, doc_new"""),
    (s, dir) => {
      val docs = T(s, dir, "documents")
      graft.etl.MinhashIndex.build(s, docs.filter(!newBatch), "mh_idx_v",
        hashFn = portableSeededHash, hashFnId = "md5-portable")
      graft.etl.MinhashIndex.incrementalPairs(s, docs.filter(newBatch),
        "mh_idx_v", hashFn = portableSeededHash, hashFnId = "md5-portable")
    },
    benchBuild = Some((s, dir) =>
      graft.etl.MinhashIndex.incrementalPairs(s,
        T(s, dir, "documents").filter(newBatch), "mh_idx_b")),
    benchSetup = Some((s, dir) =>
      // production storage: 8-byte hashed shingles (pair-identical to
      // the string form absent collisions, spec-asserted)
      graft.etl.MinhashIndex.build(s,
        T(s, dir, "documents").filter(!newBatch), "mh_idx_b",
        hashedShingles = true)))

  /** Shared-passage (boilerplate) coverage — the n-gram-granular form of
    * exact-substring dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"): a token position is "boilerplate"
    * when some n-gram window covering it occurs in at least `minDocs`
    * DISTINCT documents. Returns per-doc covered-token counts and the
    * covered fraction — the signal a curation pipeline thresholds to
    * drop template-heavy pages or trim repeated passages.
    *
    * Scale shape — keyed aggregates + a broadcast gram dictionary, no
    * gram-partitioned window (the round-5 window form funneled EVERY
    * position row of a universal gram through one reducer): windows are
    * (doc_id, pos, md5-of-gram) rows (shuffles carry a 16-byte hash,
    * never gram text); each gram's distinct-doc count comes from a
    * (gram_h, doc_id) distinct — a universal gram's rows SPREAD across
    * reducers by doc_id — followed by a partially-aggregated count whose
    * final reducer sees at most one row per upstream partition per gram.
    * The shared-gram dictionary then joins back as a BROADCAST, so
    * position rows never shuffle on gram_h at all; the price is a second
    * corpus scan (windows feed both the dictionary and the probe), the
    * standard inverted-index trade.
    *
    * `maxDocFrac`: grams present in more than this fraction of documents
    * are dropped from the dictionary — they stop contributing to
    * coverage (approximate, default OFF for oracle parity). At 100 TB
    * this bounds the dictionary the broadcast carries and, in
    * shuffle-join mode, that join's hottest partition — a single
    * boilerplate footer shared by half the corpus otherwise owns a
    * reducer. A capped gram is by definition in `> frac × corpus` docs;
    * the curation policy for such content is a corpus-level rule (drop
    * the template), not per-position accounting.
    *
    * `broadcastDict = false` is the mode for corpora whose minDocs-
    * filtered dictionary outgrows a broadcast (at 100 TB it will):
    * positions then shuffle on the gram key — results identical
    * (spec-asserted) — and the cap is what keeps that join's hottest
    * partition bounded. */
  def boilerplateCoverage(documents: DataFrame, n: Int = 8,
      minDocs: Int = 2, maxDocFrac: Option[Double] = None,
      broadcastDict: Boolean = true,
      gramHash: Column => Column = md5): DataFrame = {
    val toksDf = documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("n_tokens"))
    val wins = toksDf
      .filter(col("n_tokens") >= n)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), (col("n_tokens") - n).cast(IntegerType)))
          .as("pos"))
      .select(col("doc_id"), col("pos"),
        gramHash(array_join(slice(col("toks"), col("pos") + 1, lit(n)), " "))
          .as("gram_h"))
    val nd = wins.select(col("gram_h"), col("doc_id")).distinct()
      .groupBy(col("gram_h")).agg(count(lit(1)).as("nd"))
    val capped = maxDocFrac match {
      case Some(f) =>
        // corpus doc count rides in as a 1-row broadcast, no driver action
        val total = toksDf.agg(count(lit(1)).as("n_docs"))
        nd.crossJoin(broadcast(total))
          .filter(col("nd") <= col("n_docs") * f)
          .drop("n_docs")
      case None => nd
    }
    val shared = capped.filter(col("nd") >= minDocs).select(col("gram_h"))
    val covered = wins
      .join(if (broadcastDict) broadcast(shared) else shared, "gram_h")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("covered_tokens"))
    toksDf.select(col("doc_id"), col("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)).cast(DoubleType)
          / col("n_tokens").cast(DoubleType)).as("boilerplate_frac"))
      .orderBy(col("doc_id"))
  }

  private val ddBoilerplate = QueryDef(
    "dd_boilerplate_ngrams",
    Some("""
      WITH t AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      d AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens FROM t),
      w AS (
        SELECT doc_id, unnest(range(0, n_tokens - 7)) AS pos, ws
        FROM d WHERE n_tokens >= 8),
      wg AS (
        SELECT doc_id, pos,
          md5(array_to_string(list_slice(ws, pos + 1, pos + 8), ' ')) AS gram_h
        FROM w),
      shared AS (
        SELECT gram_h FROM (SELECT DISTINCT gram_h, doc_id FROM wg)
        GROUP BY gram_h HAVING COUNT(*) >= 2),
      cpos AS (
        SELECT DISTINCT doc_id, p FROM (
          SELECT wg.doc_id, unnest(range(wg.pos, wg.pos + 8)) AS p
          FROM wg JOIN shared USING (gram_h))),
      cov AS (SELECT doc_id, COUNT(*) AS covered_tokens FROM cpos GROUP BY doc_id)
      SELECT d.doc_id, d.n_tokens,
        COALESCE(cov.covered_tokens, 0) AS covered_tokens,
        CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE)
          / CAST(d.n_tokens AS DOUBLE) AS boilerplate_frac
      FROM d LEFT JOIN cov USING (doc_id)
      ORDER BY d.doc_id"""),
    (s, dir) => boilerplateCoverage(T(s, dir, "documents")),
    // production scalars: 8-byte xxhash64 gram keys in the shuffles
    // instead of 32-char md5 hex (the oracle-portable hash) — the
    // established declared-vs-bench hash convention
    benchBuild = Some((s, dir) =>
      boilerplateCoverage(T(s, dir, "documents"), gramHash = xxhash64(_))))

  /** N-gram novelty — the share of a document's DISTINCT 8-grams whose
    * first occurrence (minimum doc_id) is this document. High-novelty
    * docs introduce new content; near-zero novelty means everything was
    * already said — the per-doc complement of [[boilerplateCoverage]]
    * and a cheap curriculum/sampling signal. Default shape: the distinct
    * (doc, gram-hash) frame is repartitioned by gram hash once and feeds
    * both the first-doc aggregate and the join back (one exchange, two
    * consumers).
    *
    * `measuredSalt = true` (the Bench/production path) replaces the
    * blind `repartition(gram_h)` with a MEASURED decision: one keyed
    * count ([[Salting.suggestBuckets]]) finds the hottest gram's share,
    * and only when it exceeds a reducer's ideal share does the join
    * switch to [[Salting.saltedJoin]] — the hot gram's rows spread over
    * `buckets` tasks against a replicated first-doc dim. Results are
    * identical (the salted join is an algebraic rewrite), so the oracle
    * covers both shapes; the first-doc aggregate itself is min(), partial
    * aggregation keeps it skew-safe in either mode. */
  def ngramNovelty(documents: DataFrame, n: Int = 8,
      measuredSalt: Boolean = false,
      gramHash: Column => Column = md5): DataFrame = {
    def gramsFrom(docs: DataFrame) = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("n_tokens"))
      .filter(col("n_tokens") >= n)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), (col("n_tokens") - n).cast(IntegerType)))
          .as("pos"))
      .select(col("doc_id"),
        gramHash(array_join(slice(col("toks"), col("pos") + 1, lit(n)), " "))
          .as("gram_h"))
      .distinct()
    val toksDf = documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("n_tokens"))
    val gramsRaw = gramsFrom(documents)
    def firstDocOf(g: DataFrame) =
      g.groupBy(col("gram_h")).agg(min(col("doc_id")).as("first_doc"))
    val buckets =
      if (measuredSalt)
        // measure skew on a DOC-sampled gram frame: the explode is the
        // query's expensive part, and suggestBuckets is its own action
        // (AQE exchange reuse cannot span actions), so measuring on the
        // full frame would pay the whole corpus explode twice. Sampling
        // documents BEFORE exploding keeps the measurement pass at ~10%
        // of one explode; the factor is a hot/total ratio, preserved in
        // expectation under uniform doc sampling.
        Salting.suggestBuckets(
          gramsFrom(documents.sample(withReplacement = false, 0.1, seed = 42L)),
          Seq("gram_h"),
          documents.sparkSession.sparkContext.defaultParallelism)
      else 1
    val joined =
      if (buckets > 1)
        Salting.saltedJoin(gramsRaw, firstDocOf(gramsRaw), "gram_h",
          saltBy = "doc_id", buckets = buckets)
      else {
        val grams = gramsRaw.repartition(col("gram_h"))
        grams.join(firstDocOf(grams), "gram_h")
      }
    val per = joined
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    toksDf.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          col("n_novel").cast(DoubleType) / col("n_grams").cast(DoubleType))
          .otherwise(lit(0.0)).as("novelty_frac"))
      .orderBy(col("doc_id"))
  }

  private val ddNovelty = QueryDef(
    "ta_ngram_novelty",
    Some("""
      WITH t AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      d AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens FROM t),
      g AS (
        SELECT DISTINCT doc_id,
          md5(array_to_string(list_slice(ws, pos + 1, pos + 8), ' ')) AS gram_h
        FROM (SELECT doc_id, unnest(range(0, n_tokens - 7)) AS pos, ws
              FROM d WHERE n_tokens >= 8)),
      fd AS (SELECT gram_h, MIN(doc_id) AS first_doc FROM g GROUP BY gram_h),
      per AS (
        SELECT g.doc_id, COUNT(*) AS n_grams,
          CAST(SUM(CASE WHEN fd.first_doc = g.doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel
        FROM g JOIN fd USING (gram_h)
        GROUP BY g.doc_id)
      SELECT d.doc_id,
        COALESCE(per.n_grams, 0) AS n_grams,
        COALESCE(per.n_novel, 0) AS n_novel,
        CASE WHEN COALESCE(per.n_grams, 0) > 0
             THEN CAST(per.n_novel AS DOUBLE) / CAST(per.n_grams AS DOUBLE)
             ELSE 0.0 END AS novelty_frac
      FROM d LEFT JOIN per USING (doc_id)
      ORDER BY d.doc_id"""),
    (s, dir) => ngramNovelty(T(s, dir, "documents")),
    // production: measured skew decision + 8-byte xxhash64 gram keys
    // (identical results under the salted rewrite; the hash swap is the
    // established declared-vs-bench convention)
    benchBuild = Some((s, dir) =>
      ngramNovelty(T(s, dir, "documents"), measuredSalt = true,
        gramHash = xxhash64(_))))

  /** Corpus-slice overlap estimation — the dataset-level dedup
    * diagnostic: how much does source A's shingle set overlap source
    * B's? The exact answer is a shingle-level join across every slice
    * pair — O(pairs × shingles), the thing you cannot afford at 100 TB.
    * The estimator is one corpus pass: per-slice MinHash UNION
    * signatures (per permutation, min over the slice's distinct
    * shingles — the same (h1 + i·h2) mod p permutation scheme as
    * [[minhashSigFromShingles]], so the per-doc and per-slice paths
    * share their hash primitives), then per-pair agreement fraction,
    * the standard unbiased Jaccard estimate. The pair join is
    * slice-count-sized (sources/domains — thousands at most), never
    * corpus-sized; one row of `numPerms` longs per slice is the entire
    * shuffle.
    *
    * Estimator error is ~sqrt(J(1−J)/numPerms) (binomial); DedupSpec
    * asserts the bound against an exact recompute on a controlled
    * fixture. */
  def corpusOverlap(s: SparkSession, documents: DataFrame,
      sliceCol: String = "source", numPerms: Int = 32,
      hashFn: (Column, Int) => Column =
        (c, seed) => xxhash64(c, lit(seed))): DataFrame = {
    import s.implicits._
    val sliceShingles = shingleRows(documents)
      .join(documents.select(col("doc_id"), col(sliceCol).as("slice")), "doc_id")
      .select($"slice", $"shingle").distinct()
    val hashed = sliceShingles.select($"slice",
      pmod(hashFn($"shingle", 0), lit(minhashPrime)).as("h1"),
      pmod(hashFn($"shingle", 1), lit(minhashPrime)).as("h2"))
    val sig = hashed.groupBy($"slice").agg(
      min((col("h1") + lit(0L) * col("h2")) % minhashPrime).as("h0"),
      (1 until numPerms).map(i =>
        min((col("h1") + lit(i.toLong) * col("h2")) % minhashPrime).as(s"h$i")): _*)
    val a = sig.select($"slice".as("slice_a") +:
      (0 until numPerms).map(i => col(s"h$i").as(s"a$i")): _*)
    val b = sig.select($"slice".as("slice_b") +:
      (0 until numPerms).map(i => col(s"h$i").as(s"b$i")): _*)
    val agree = (0 until numPerms).map(i =>
      when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
    a.join(broadcast(b), col("slice_a") < col("slice_b"))
      .select($"slice_a", $"slice_b",
        (agree.cast(DoubleType) / numPerms).as("est_jaccard"))
      .orderBy($"slice_a", $"slice_b")
  }

  /** DuckDB replay of the slice-overlap estimator, value-for-value
    * under the portable seeded hash (same toks/sh shape as
    * [[minhashCtes]], per-slice instead of per-doc). */
  private def corpusOverlapOracle(numPerms: Int): String = {
    val p = minhashPrime
    def h32(arg: String) =
      s"('0x' || substr(md5($arg), 25, 8))::UBIGINT::BIGINT"
    val sigCols = (0 until numPerms)
      .map(i => s"MIN((h1 + $i * h2) % $p) AS h$i")
      .mkString(",\n            ")
    val agree = (0 until numPerms)
      .map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
          list_transform(range(1, greatest(len(ws) - 1, 1)),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
        FROM toks WHERE len(ws) >= 3),
      ssh AS (
        SELECT DISTINCT d.source AS slice, s.shingle
        FROM sh s JOIN documents d USING (doc_id)),
      shh AS (
        SELECT slice,
          ${h32("'0_' || shingle")} % $p AS h1,
          ${h32("'1_' || shingle")} % $p AS h2
        FROM ssh),
      sig AS (SELECT slice,
            $sigCols
          FROM shh GROUP BY slice)
      SELECT a.slice AS slice_a, b.slice AS slice_b,
        CAST($agree AS DOUBLE) / $numPerms AS est_jaccard
      FROM sig a JOIN sig b ON a.slice < b.slice
      ORDER BY slice_a, slice_b"""
  }

  private val ddCorpusOverlap = QueryDef(
    "dd_corpus_overlap",
    Some(corpusOverlapOracle(numPerms = 32)),
    (s, dir) => corpusOverlap(s, T(s, dir, "documents"),
      hashFn = portableSeededHash),
    // the established convention: Bench times the production xxhash64
    // pipeline; the md5 variant exists only for the DuckDB replay
    benchBuild = Some((s, dir) => corpusOverlap(s, T(s, dir, "documents"))))

  /** Maximal repeated passages across documents — the exact
    * substring-duplication analysis of Lee et al.'s "Deduplicating
    * Training Data Makes Language Models Better" (arXiv:2107.06499,
    * public), bounded to W-token resolution so it stays one corpus pass
    * instead of a distributed suffix array: every W-token window
    * (stride 1) is hashed, windows shared across documents align
    * co-linear runs, and each maximal run becomes one
    * (doc_a, start_a, doc_b, start_b, len_tokens) passage — the
    * span-level signal exact-dedup (whole doc) and MinHash (whole-doc
    * similarity) both miss: a 200-token boilerplate header pasted into
    * otherwise-distinct documents.
    *
    * Scale shape:
    *  - the window pass carries only (doc_id, pos, hash) — never window
    *    text — so the explode is O(tokens) rows of constant width;
    *  - the document-frequency gate bounds the pair join: windows in
    *    more than `maxDf` docs are corpus boilerplate
    *    ([[boilerplateCoverage]]'s territory) whose pair fanout would be
    *    quadratic in frequency;
    *  - run merging is gaps-and-islands per (pair, diagonal) window
    *    partition — keyed shuffles only; the only global sort is the
    *    declared query's presentation order. */
  def repeatedPassages(s: SparkSession, documents: DataFrame, w: Int = 16,
      maxDf: Int = 20, minLen: Int = 24,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    import s.implicits._
    val wins = documents
      .select($"doc_id", tokens(col("text")).as("toks"))
      .filter(size($"toks") >= w)
      .select($"doc_id", $"toks",
        explode(sequence(lit(1), size($"toks") - w + 1)).as("pos"))
      .select($"doc_id", $"pos",
        hashFn(concat_ws(" ", slice($"toks", $"pos", lit(w)))).as("h"))
    passageRuns(s, wins, w, maxDf, minLen)
  }

  /** [[repeatedPassages]] with the O(tokens) rolling window pass
    * ([[graft.functions.WindowHashes]]): one xxhash64 per token and a
    * polynomial recurrence per position, instead of materializing and
    * hashing a W-token STRING per position (O(tokens·W) bytes). The
    * production/bench form — the declared query keeps the md5 window
    * text its DuckDB oracle replays; DedupSpec pins both
    * pipelines to identical passages (hash values differ, pair/run
    * structure cannot, absent a 64-bit collision). */
  def repeatedPassagesRolling(s: SparkSession, documents: DataFrame,
      w: Int = 16, maxDf: Int = 20, minLen: Int = 24): DataFrame = {
    import s.implicits._
    val wins = documents
      .select($"doc_id", tokens(col("text")).as("toks"))
      .filter(size($"toks") >= w)
      .select($"doc_id", posexplode(
        graft.functions.WindowHashes.windowHashes(s, $"toks", w)))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("h"))
    passageRuns(s, wins, w, maxDf, minLen)
  }

  /** Shared downstream of the passage miners: df-gate, co-linear pair
    * join, gaps-and-islands run merge (see [[repeatedPassages]]'s scale
    * notes). `wins` carries (doc_id, pos, h) only. */
  private def passageRuns(s: SparkSession, wins: DataFrame, w: Int,
      maxDf: Int, minLen: Int): DataFrame = {
    import s.implicits._
    val rare = wins.groupBy($"h")
      .agg(countDistinct($"doc_id").as("df"))
      .filter($"df" > 1 && $"df" <= maxDf)
      .select($"h")
    val shared = wins.join(rare, Seq("h"))
    val pairs = shared.as("a").join(shared.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
      .distinct()
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pos_a")
    pairs
      .withColumn("diag", $"pos_a" - $"pos_b")
      .withColumn("island", $"pos_a" - row_number().over(wnd))
      .groupBy($"doc_a", $"doc_b", $"diag", $"island")
      .agg(min($"pos_a").as("start_a"), min($"pos_b").as("start_b"),
        (max($"pos_a") - min($"pos_a") + w).as("len_tokens"))
      .filter($"len_tokens" >= minLen)
      .select($"doc_a", $"start_a", $"doc_b", $"start_b", $"len_tokens")
      .orderBy($"doc_a", $"doc_b", $"start_a", $"start_b")
  }

  /** DuckDB replay of [[repeatedPassages]]: identical tokenization,
    * window slicing, md5 hash, df gate, and gaps-and-islands run merge. */
  private def repeatedPassagesOracle(w: Int, maxDf: Int, minLen: Int): String = s"""
      WITH toks AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      wins AS (
        SELECT doc_id, CAST(unnest(range(1, len(ws) - $w + 2)) AS INT) AS pos, ws
        FROM toks WHERE len(ws) >= $w),
      hashed AS (
        SELECT doc_id, pos,
          ('0x' || substr(md5(array_to_string(ws[pos : pos + ${w - 1}], ' ')), 25, 8))::UBIGINT::BIGINT AS h
        FROM wins),
      rare AS (
        SELECT h FROM hashed GROUP BY h
        HAVING COUNT(DISTINCT doc_id) > 1 AND COUNT(DISTINCT doc_id) <= $maxDf),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          a.pos AS pos_a, b.pos AS pos_b
        FROM hashed a
        JOIN rare r ON r.h = a.h
        JOIN hashed b ON b.h = a.h AND a.doc_id < b.doc_id),
      isl AS (
        SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
          pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b
                                     ORDER BY pos_a) AS island
        FROM pairs),
      runs AS (
        SELECT doc_a, doc_b, diag, island,
          CAST(MIN(pos_a) AS INT) AS start_a, CAST(MIN(pos_b) AS INT) AS start_b,
          CAST(MAX(pos_a) - MIN(pos_a) + $w AS INT) AS len_tokens
        FROM isl GROUP BY doc_a, doc_b, diag, island)
      SELECT doc_a, start_a, doc_b, start_b, len_tokens
      FROM runs WHERE len_tokens >= $minLen
      ORDER BY doc_a, doc_b, start_a, start_b"""

  private val ddRepeatedPassages = QueryDef(
    "dd_repeated_passages",
    Some(repeatedPassagesOracle(w = 16, maxDf = 20, minLen = 24)),
    (s, dir) => repeatedPassages(s, T(s, dir, "documents"),
      hashFn = md5Hash32),
    // the established convention: Bench times the production pipeline —
    // here the O(tokens) rolling window pass — while the md5 window-text
    // variant exists only for the DuckDB replay
    benchBuild = Some((s, dir) =>
      repeatedPassagesRolling(s, T(s, dir, "documents"))))

  /** QUALITY-RANKED dedup — the policy step a curation run applies AFTER
    * clustering: inside each near-dup component keep the single best
    * document (here: longest text, doc_id tie-break — swap any
    * deterministic quality rank in), pass every unclustered document
    * through untouched, and label WHY each survivor was kept. "Drop all
    * but one arbitrary member" loses the best copy of boilerplate-heavy
    * families; ranked keep is the Lee-et-al/RefinedWeb-style selection.
    *
    * Scale shape: the components pass is the cost (bounded, banded —
    * see [[minhashComponents]]); on top of it one keyed window over the
    * CLUSTERED docs only (near-dup membership-sized, not corpus-sized)
    * and one anti-join whose right side is that same membership set. */
  def keepBestPerCluster(s: SparkSession, documents: DataFrame,
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))
  ): DataFrame = {
    val comp = minhashComponents(s, documents, hashFn = hashFn)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val best = comp
      .join(documents.select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), lit("cluster_best").as("kept_as"))
    val unique = documents.select(col("doc_id"))
      .join(comp.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("unique").as("kept_as"))
    unique.unionByName(best).orderBy(col("doc_id"))
  }

  private def keepBestOracle(threshold: Double, numPerms: Int,
      bands: Int): String =
    s"""
      WITH RECURSIVE ${minhashCtes(threshold, numPerms, bands)},
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
      ranked AS (
        SELECT c.node AS doc_id,
          ROW_NUMBER() OVER (PARTITION BY c.component
            ORDER BY d.n_chars DESC, c.node ASC) AS rk
        FROM comp c JOIN documents d ON d.doc_id = c.node),
      kept AS (
        SELECT doc_id, 'cluster_best' AS kept_as FROM ranked WHERE rk = 1
        UNION ALL
        SELECT d.doc_id, 'unique' AS kept_as
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
        WHERE c.node IS NULL)
      SELECT CAST(doc_id AS BIGINT) AS doc_id, kept_as
      FROM kept
      ORDER BY doc_id"""

  private val ddKeepBest = QueryDef(
    "dd_keep_best",
    Some(keepBestOracle(threshold = 0.5, numPerms = 32, bands = 8)),
    (s, dir) => keepBestPerCluster(s, T(s, dir, "documents"),
      hashFn = portableSeededHash),
    benchBuild = Some((s, dir) =>
      keepBestPerCluster(s, T(s, dir, "documents"))))

  /** PREFIX-FILTERED EXACT set-similarity self-join (the PPJoin/AllPairs
    * family — Chaudhuri et al. ICDE'06, Xiao et al. WWW'08, both public):
    * every document pair with SHINGLE-set Jaccard ≥ `threshold`, with NO
    * false negatives — the guarantee MinHash/LSH (`dd_minhash_lsh`)
    * structurally cannot give. Candidate generation is sub-quadratic:
    * order each doc's distinct shingles by GLOBAL document frequency
    * ascending (rarest first, shingle as tiebreak — one total order
    * shared by all docs), keep only each doc's first |S| − ⌈t·|S|⌉ + 1
    * shingles (the prefix), and equi-join on prefix shingles. The prefix
    * principle: two sets with J ≥ t must overlap in ≥ ⌈t·max(|A|,|B|)⌉
    * elements, so skipping that many from either end of the shared order
    * cannot skip ALL common elements — any qualifying pair shares at
    * least one PREFIX shingle. The candidate join also carries the
    * AllPairs LENGTH filter (J ≥ t forces t·|A| ≤ |B| ≤ |A|/t), and
    * survivors are verified with one `array_intersect` per pair —
    * pairs-sized rows, never pairs × elements (the exploded re-join was
    * measured 60× slower).
    *
    * The set unit is the word 3-GRAM, deliberately the same sets as
    * `dd_ngram_jaccard`: shingle space is where near-dup structure is
    * sparse. Token-level sets on this corpus are degenerate — its
    * whitespace vocabulary is 31 words, so ~every doc pair shares ~every
    * token and the TRUE answer at t=0.6 is ~7.1M of 12.5M possible pairs
    * at sf0.1 (measured; no algorithm makes an inherently quadratic
    * OUTPUT sub-quadratic). Shingle df distributions have the long rare
    * tail the prefix needs: a boilerplate shingle never enters a prefix
    * unless a doc is nearly all boilerplate, in which case t·|S| bounds
    * it. Shuffles carry (shingle, doc_id) pairs and candidate ids, never
    * text; the audit (`PrefixJoinSpec`) pins equality with the
    * brute-force all-pairs join. */
  def prefixFilterJoin(documents: DataFrame, threshold: Double = 0.6,
      n: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("shingle").asc)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    val sh = shingleRows(documents, n) // distinct (doc_id, shingle)
    val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // deliberately NOT checkpointed/persisted: both candidate-join sides
    // read this subtree, but its exchanges (the distinct, the df join,
    // the rank window) are shared via ReuseExchange in the adaptive
    // plan — a localCheckpoint here measured 13.8 s vs 4.9 s at sf0.1
    // (materialization broke the reuse and paid block writes), the same
    // lesson as dd_ngram_jaccard's round-2 persist.
    //
    // n_sh rides the SAME doc_id window exchange as the rank (an inner
    // join with freq keeps every sh row, so count-over-doc here equals
    // the old separate per-doc aggregate exactly) — previously it was a
    // second aggregate over sh plus a doc_id join: one exchange and one
    // join fewer (guide §2.4). The candidate self-join keys on the
    // 8-byte xxhash64 of the shingle instead of the shingle string
    // (§2.3: shuffle keys, not payloads): a hash collision can only ADD
    // a candidate pair, which the exact array_intersect verify below
    // rejects — zero-false-negative completeness is untouched.
    val prefix = sh
      .join(freq, "shingle")
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_sh", count(lit(1)).over(wDoc))
      .filter(col("rnk") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"), col("n_sh"))
    val cands = prefix.as("pa")
      .join(prefix.as("pb"),
        col("pa.sh_h") === col("pb.sh_h") &&
          col("pa.doc_id") < col("pb.doc_id") &&
          lit(threshold) * col("pa.n_sh") <= col("pb.n_sh") &&
          lit(threshold) * col("pb.n_sh") <= col("pa.n_sh"))
      .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      .distinct()
    // per-doc sorted shingle arrays for the one-row-per-pair verify
    // (two-step select: the shingleRows quadratic-lambda lesson)
    val docSh = documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        array_sort(array_distinct(shinglesFromTokens(col("toks"), n)))
          .as("sset"))
    val verified = cands
      .join(docSh.select(col("doc_id").as("doc_a"), col("sset").as("ss_a")), "doc_a")
      .join(docSh.select(col("doc_id").as("doc_b"), col("sset").as("ss_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ss_a"), col("ss_b"))).cast(LongType)
          .as("n_inter"),
        size(col("ss_a")).cast(LongType).as("n_a"),
        size(col("ss_b")).cast(LongType).as("n_b"))
    verified
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        (col("n_a") + col("n_b") - col("n_inter")).as("n_union"),
        // one integer/integer division — the single IEEE op both engines
        // round identically (the dd_ngram_jaccard convention)
        (col("n_inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** EDIT-DISTANCE VERIFY over MinHash candidates — the third rung of
    * the dedup ladder (bucket-join candidates → set-overlap verify →
    * CHARACTER-level confirm): Levenshtein distance on the candidate
    * pairs' full texts, flagged similar when the distance is ≤ 20% of
    * the longer text (integer cross-multiply, no division). Catches
    * what shingle Jaccard conflates — transpositions and small in-place
    * edits that preserve most shingles score the same as appends, but
    * have very different edit distances — and is the standard last
    * filter before declaring two crawl snapshots "the same page".
    *
    * Scale shape: text moves ONLY for candidate pairs (the banded join
    * bounds them), and the O(len_a·len_b) DP runs once per pair inside
    * codegen (`levenshtein` is a native function in Spark AND DuckDB,
    * bit-identical classic DP — which is what lets the whole composite
    * hash-match). All outputs exact integers. */
  def levenshteinVerify(s: SparkSession, documents: DataFrame,
      threshold: Double = 0.5,
      hashFn: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))
  ): DataFrame = {
    val pairs = minhashNearDups(s, documents, threshold, hashFn = hashFn)
      .select(col("doc_a"), col("doc_b"))
    val texts = documents.select(col("doc_id"), col("text"))
    pairs
      .join(texts.select(col("doc_id").as("doc_a"), col("text").as("t_a")), "doc_a")
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("t_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("t_a"), col("t_b")).cast(LongType).as("edit_dist"),
        greatest(length(col("t_a")), length(col("t_b"))).cast(LongType)
          .as("max_len"))
      .withColumn("similar",
        when(col("edit_dist") * 5 <= col("max_len"), 1L).otherwise(0L))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val ddLevenshtein = QueryDef(
    "dd_levenshtein_verify",
    Some(s"""
      WITH ${minhashCtes(threshold = 0.5, numPerms = 32, bands = 8)}
      SELECT p.doc_a, p.doc_b,
        CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
        CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len,
        CAST(CASE WHEN levenshtein(da.text, db.text) * 5
                    <= greatest(length(da.text), length(db.text))
             THEN 1 ELSE 0 END AS BIGINT) AS similar
      FROM pairs p
      JOIN documents da ON p.doc_a = da.doc_id
      JOIN documents db ON p.doc_b = db.doc_id
      ORDER BY p.doc_a, p.doc_b"""),
    (s, dir) => levenshteinVerify(s, T(s, dir, "documents"),
      hashFn = portableSeededHash),
    benchBuild = Some((s, dir) =>
      levenshteinVerify(s, T(s, dir, "documents"))))

  /** The oracle is the UNFILTERED all-pairs shingle join — deliberately:
    * a hash-match against it PROVES the prefix filter dropped no
    * qualifying pair (exactness is this operator's whole claim over
    * LSH). Same shingle CTEs as `dd_ngram_jaccard`; DuckDB's integer
    * division yields DOUBLE, matching Spark's explicit cast. */
  private val ddPrefixJoin = QueryDef(
    "dd_prefix_filter_join",
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
          list_transform(range(1, greatest(len(ws) - 1, 1)),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
        FROM toks WHERE len(ws) >= 3),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b, i.n_inter,
        sa.n_sh + sb.n_sh - i.n_inter AS n_union,
        i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.6
      ORDER BY doc_a, doc_b"""),
    (s, dir) => prefixFilterJoin(T(s, dir, "documents")))

  override val defs: Seq[QueryDef] =
    Seq(ddExact, ddJaccard, ddMinhash, ddSimhash, ddEmbedding, ddComponents,
      ddClusterStats, ddSimhashHamming, ddIncremental, ddIncrementalIndexed,
      ddBoilerplate, ddNovelty, ddCorpusOverlap, ddRepeatedPassages,
      ddKeepBest, ddPrefixJoin, ddLevenshtein)
}
