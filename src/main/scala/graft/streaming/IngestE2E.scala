package graft.streaming

import graft.core.{QueryDef, QueryModule, T}
import graft.etl.{BatchLog, DataQuality, ManifestTable}
import graft.operators.{CorpusPipeline, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The END-TO-END continuous-ingest leg as a DECLARED, oracle-checked
  * query — the engine's most operationally important path, previously
  * unit-green only (ContinuousIngestSpec's crash seams): a staged
  * three-batch documents stream runs the real
  * [[ContinuousIngest]] `foreachBatch` pipeline — PII scrub → quality +
  * repetition gates → within-batch exact dedup → near-dup components →
  * persisted-MinHash-index probe against the accumulated corpus →
  * **write-audit-publish ManifestTable merge** (checks audited on the
  * exact post-merge state) → exactly-once index append — and the FINAL
  * TABLE STATE is hash-checked against a DuckDB oracle that replays the
  * accept algebra and the keyed-upsert merge in plain SQL.
  *
  * The config pins the accept semantics to an oracle-expressible core
  * (nothing is stubbed — these are real knobs a deployment sets):
  *
  *  - gate thresholds at their permissive bounds (`minTokens = 1`,
  *    ratio caps at 1.0): the surviving gate terms are exactly
  *    "non-empty normalized text" and "has a 2-gram" (docs too short to
  *    have 2-grams fail closed in [[CorpusPipeline.repetitionFilter]]);
  *  - `nearDupThreshold = 1.0`: [[graft.operators.DedupOps.crossPairs]]
  *    verifies EXACT shingle Jaccard on every banded candidate, so at
  *    1.0 both the within-batch component collapse and the cross-batch
  *    index probe drop a doc iff its 3-gram shingle SET is identical to
  *    a surviving/accepted doc's — which DuckDB replays with a
  *    canonical sorted-distinct-shingle key (banding cannot miss an
  *    identical signature, so candidates are complete at this
  *    threshold).
  *
  * The three-slice arrival (same mtime-staged discipline as
  * [[WatermarkQueries]]) exercises every merge path:
  *
  *  - slice 0: all `doc_id % 3 == 0` docs — builds corpus + index;
  *  - slice 1: the `% 3 == 1` docs PLUS planted byte-copies of slice-0
  *    docs under fresh ids (`+10,000,000`) — the copies must be dropped
  *    by the INDEX PROBE (skipping the probe inflates `n_docs` and
  *    breaks the hash);
  *  - slice 2: the `% 3 == 2` docs PLUS updated re-arrivals of slice-0
  *    keys (`% 10 == 3`: text gains a unique ` upd<id>` token,
  *    `n_chars` gains 1000) — the merge must UPSERT them (an
  *    insert-only merge double-counts the key; a dropped update misses
  *    the +1000 in `sum_chars`). Updates arrive in the LAST batch by
  *    design: no later batch probes against the superseded index rows,
  *    so the oracle never has to model stale-version index state
  *    (delete-sync for updated docs rides compaction, off here).
  *
  * WAP is ON with the standard completeness/non-negativity checks: every
  * batch stages, audits the post-merge state, and publishes through one
  * atomic manifest flip — the declared output hashes what a reader of
  * the published table actually sees, per date partition. At 100 TB this
  * is the same pipeline shape: per-batch cost is O(batch) gates plus an
  * index probe that shuffles only the batch, and the merge rewrites only
  * touched date partitions behind the manifest commit.
  */
object IngestE2E extends QueryModule {

  private val PlantedOffset = 10000000L
  private val Epoch = "2023-12-29" // id % 7 spreads dates across 2 years

  private def root(sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${sys.props("java.io.tmpdir")}/graft_stream/ie_$safe"
  }

  private def indexName(sfDir: String): String =
    "ingest_e2e_" + sfDir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase

  private def wipe(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The three arrival slices (final ids; `doc_date` derived from the
    * ARRIVING id so both engines compute it identically). */
  private[graft] def slices(s: SparkSession, dir: String): Seq[DataFrame] = {
    val docs = T(s, dir, "documents")
      .withColumn("doc_id", col("doc_id").cast("long"))
      .withColumn("n_chars", col("n_chars").cast("long"))
    val s0 = docs.filter(col("doc_id") % 3 === 0)
    val planted = s0.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + PlantedOffset)
    val s1 = docs.filter(col("doc_id") % 3 === 1).unionByName(planted)
    val updates = s0.filter(col("doc_id") % 10 === 3)
      .withColumn("text", concat(col("text"), lit(" upd"),
        col("doc_id").cast("string")))
      .withColumn("n_chars", col("n_chars") + 1000L)
    val s2 = docs.filter(col("doc_id") % 3 === 2).unionByName(updates)
    Seq(s0, s1, s2).map(_.withColumn("doc_date",
      date_add(lit(java.sql.Date.valueOf(Epoch)),
        (col("doc_id") % 7).cast("int"))))
  }

  /** Run the staged pipeline and return the per-date rollup of the
    * published table. Idempotent: wipes the corpus/checkpoint root, the
    * index family's catalog tables, and its batch log before staging. */
  def ingestE2E(s: SparkSession, dir: String): DataFrame =
    runIngest(s, dir, root(dir), indexName(dir))

  /** Per-date rollup of the published corpus — what the oracle hashes
    * and what [[s25]]'s benchBuild times (the serving read of the table
    * the pipeline publishes). */
  private def rollup(s: SparkSession, corpusPath: String): DataFrame =
    ManifestTable.read(s, corpusPath)
      .groupBy(col("doc_date"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        sum(col("doc_id")).cast("long").as("id_sum"))
      .orderBy(col("doc_date"))

  private[graft] def runIngest(s: SparkSession, dir: String,
      base: String, idx: String): DataFrame = {
    wipe(s, base)
    wipe(s, BatchLog.logDir(s, idx).toString)
    Seq("banded", "shingles", "sizes", "meta", "meta__new")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${idx}_$t"))
    slices(s, dir).zipWithIndex.foreach { case (df, i) =>
      WatermarkQueries.stageFile(s, df, s"$base/stage$i",
        f"$base/in/$i%04d.parquet", 100000L * (i + 1))
    }
    val schema = s.read.parquet(s"$base/in").schema
    val cfg = ContinuousIngest.Config(
      corpusPath = s"$base/corpus",
      indexName = idx,
      thresholds = CorpusPipeline.Thresholds(minTokens = 1,
        maxPunctRatio = 1.0, maxDupTokenFrac = 1.0, maxTop2gramFrac = 1.0),
      nearDupThreshold = 1.0,
      batchChecks = Seq(
        DataQuality.Completeness("text", "batch.text"),
        DataQuality.NonNegative("n_chars", "batch.n_chars")),
      wapAudit = true)
    ContinuousIngest.start(s,
      s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$base/in"),
      s"$base/ck", cfg).awaitTermination()
    rollup(s, s"$base/corpus")
  }

  /** DuckDB fragment: the PII scrub chain over `text` — the shared
    * mirror of [[TextOps.scrubPii]] (one definition for every oracle
    * replaying the scrub). */
  private def scrubSql: String = TextOps.scrubSqlChain("text")

  private val s25 = QueryDef(
    "s25_ingest_e2e",
    Some(s"""
      WITH b AS (
        SELECT doc_id,
          lower(trim(regexp_replace($scrubSql, '\\s+', ' ', 'g'))) AS norm,
          CAST(n_chars AS BIGINT) AS n_chars
        FROM documents),
      arr AS (
        SELECT doc_id % 3 AS slice, doc_id AS id, norm, n_chars FROM b
        UNION ALL
        SELECT 1, doc_id + $PlantedOffset, norm, n_chars FROM b
        WHERE doc_id % 3 = 0 AND doc_id % 5 = 0
        UNION ALL
        -- re-normalize the appended suffix: the engine normalizes the
        -- CONCATENATED text, so a blank base norm must collapse to the
        -- single token 'upd<id>' (and fail the 2-gram gate), not gain a
        -- phantom leading empty token
        SELECT 2, doc_id,
          lower(trim(regexp_replace(
            norm || ' upd' || CAST(doc_id AS VARCHAR), '\\s+', ' ', 'g'))),
          n_chars + 1000
        FROM b WHERE doc_id % 3 = 0 AND doc_id % 10 = 3),
      -- gates at the pinned thresholds: non-empty normalized text
      -- (punct ratio is NULL on '' and fails closed) + has a 2-gram
      gated AS (
        SELECT slice, id, norm, n_chars, string_split(norm, ' ') AS ws
        FROM arr
        WHERE len(norm) > 0 AND len(string_split(norm, ' ')) >= 2),
      -- within-batch exact dedup: min id per normalized fingerprint
      dedup AS (
        SELECT slice, id, norm, n_chars, ws FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY slice, norm
                                       ORDER BY id) AS rn
          FROM gated) WHERE rn = 1),
      -- canonical 3-gram shingle-SET key (exact Jaccard 1.0 <=> equal
      -- sets); docs with < 3 tokens have no shingles and can neither
      -- drop nor be dropped by the near-dup machinery
      skeys AS (
        SELECT d.slice, d.id,
          md5(string_agg(s.sh, chr(1) ORDER BY s.sh)) AS skey
        FROM dedup d, LATERAL (
          SELECT unnest(list_distinct(list_transform(
            range(1, greatest(len(d.ws) - 1, 1)),
            i -> d.ws[i] || ' ' || d.ws[i+1] || ' ' || d.ws[i+2]))) AS sh) s
        WHERE len(d.ws) >= 3
        GROUP BY d.slice, d.id),
      dk AS (
        SELECT d.slice, d.id, d.n_chars, k.skey
        FROM dedup d LEFT JOIN skeys k
          ON k.slice = d.slice AND k.id = d.id),
      -- within-batch component collapse at Jaccard 1.0: min id per
      -- shingle-set key; shingle-less docs pass through
      comp AS (
        SELECT slice, id, n_chars, skey FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY slice, skey
                                       ORDER BY id) AS rn2
          FROM dk WHERE skey IS NOT NULL) WHERE rn2 = 1
        UNION ALL
        SELECT slice, id, n_chars, skey FROM dk WHERE skey IS NULL),
      -- cross-batch index probe: a doc is dropped iff an ACCEPTED doc
      -- of an earlier batch carries the identical shingle set
      acc0 AS (SELECT * FROM comp WHERE slice = 0),
      acc1 AS (
        SELECT * FROM comp WHERE slice = 1 AND (skey IS NULL OR
          skey NOT IN (SELECT skey FROM acc0 WHERE skey IS NOT NULL))),
      acc2 AS (
        SELECT * FROM comp WHERE slice = 2 AND (skey IS NULL OR
          skey NOT IN (SELECT skey FROM acc0 WHERE skey IS NOT NULL
                       UNION
                       SELECT skey FROM acc1 WHERE skey IS NOT NULL))),
      -- keyed upsert: later slice wins per id (doc_date is id-derived,
      -- so the id IS the merge key)
      final AS (
        SELECT id, n_chars FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                       ORDER BY slice DESC) AS rn3
          FROM (SELECT * FROM acc0 UNION ALL
                SELECT * FROM acc1 UNION ALL
                SELECT * FROM acc2)) WHERE rn3 = 1)
      SELECT DATE '$Epoch' + CAST(id % 7 AS INTEGER) AS doc_date,
        COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(id) AS BIGINT) AS id_sum
      FROM final
      GROUP BY 1
      ORDER BY doc_date"""),
    (s, dir) => ingestE2E(s, dir),
    // Bench discipline (the s23/s24 scripted-sequence convention): the
    // staged three-batch ingest is the SETUP — a periodic pipeline run,
    // ~30 Spark jobs of per-batch protocol cost (gates, dedup, probe,
    // WAP stage+audit+publish, report merge, index append) that a real
    // deployment amortizes over its batch cadence, measured and
    // recorded per-leg in SCALE.md — and the timed path is the serving
    // read of the table the pipeline published. Verify always runs the
    // full self-contained `build`.
    benchBuild = Some((s, dir) =>
      rollup(s, s"${root(dir)}_b/corpus")),
    benchSetup = Some((s, dir) => {
      runIngest(s, dir, s"${root(dir)}_b", indexName(dir) + "_b")
      ()
    }))

  override val defs: Seq[QueryDef] = Seq(s25)
}
