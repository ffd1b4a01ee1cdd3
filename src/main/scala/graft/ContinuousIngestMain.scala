package graft

import graft.streaming.ContinuousIngest

/** Runnable entry point for the composed continuous-ingest pipeline —
  * the non-test caller of [[graft.streaming.ContinuousIngest]]. Points a
  * parquet-directory documents stream (schema: `documents` + a DATE
  * `doc_date` column) at a manifest-committed corpus and its MinHash
  * index, with periodic compaction/vacuum:
  *
  * {{{
  * sbt "runMain graft.ContinuousIngestMain <srcDir> <corpusPath> <indexName> <checkpointDir> [textIndexName [annIndexName [ivfIndexPath [chunkIndexName [sketchName]]]]]"
  * }}}
  *
  * The optional trailing names switch on the BM25 postings index, the
  * doc-level LSH ANN index (requires an `embedding` column in the
  * stream schema), the directory-layout IVF ANN index, the
  * chunk-level LSH index (continuous RAG ingestion; requires numeric
  * doc ids), and the persisted count-min sketch (corpus-wide token
  * frequency monitoring from O(d·w) state).
  *
  * Env toggles for the quality machinery: batch quality checks
  * (text completeness, non-negative `n_chars`) run by default and
  * reject a failing batch — `SPARK_GRAFT_BATCH_CHECKS=0` opts out;
  * `SPARK_GRAFT_WAP=1` merges via write-audit-publish (the batch
  * checks audit the exact post-merge state; a rejected batch leaves
  * zero readable trace at any version — WAP keeps the checks on even
  * under the opt-out, since they are the audit), and when a sketch is enabled
  * `SPARK_GRAFT_SKETCH_AUDIT=<n>` reconciles the persisted grid
  * against exact counts of the corpus's top-n tokens each maintenance
  * run, rebuilding a broken grid in place.
  *
  * Each invocation drains everything new in `srcDir` (AvailableNow) and
  * exits; re-running resumes from the checkpoint. Crash anywhere —
  * including between the merge and the index append — and the next run
  * converges (ContinuousIngestSpec injects each seam). On a cluster the
  * same object runs with a `master` the deployment sets and a durable
  * checkpoint dir.
  */
object ContinuousIngestMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4 && args.length <= 9,
      "usage: ContinuousIngestMain <srcDir> <corpusPath> <indexName> " +
        "<checkpointDir> [textIndexName [annIndexName [ivfIndexPath " +
        "[chunkIndexName [sketchName]]]]]")
    val Array(src, corpus, index, checkpoint) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // PERSISTENT catalog (Hive metastore on derby beside the corpus):
    // the index tables are catalog tables, and with the default
    // in-memory catalog a second JVM run would not see them —
    // `tableExists` false → the pipeline would quietly REBUILD the index
    // from the new batch alone, discarding the accumulated corpus index
    // and skipping the corpus near-dup probe. Cross-run state (corpus
    // manifest, index warehouse, metastore, batch logs) all lives under
    // the corpus path's parent, so it travels as one unit.
    val stateRoot = java.nio.file.Paths.get(corpus).toAbsolutePath.getParent
    val spark = graft.etl.LakeCatalog.persistentBuilder(
        s"local[$cpus]", cpus.toInt,
        warehouseDir = s"$stateRoot/_warehouse",
        metastoreDir = s"$stateRoot/_metastore")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fail fast with a usage-style message instead of a mid-stream
    // AnalysisException when srcDir is missing/empty (schema inference
    // below needs at least one parquet file)
    val schema = try spark.read.parquet(src).schema catch {
      case e: org.apache.spark.sql.AnalysisException =>
        System.err.println(s"[ingest] srcDir '$src' has no readable " +
          s"parquet files — nothing to drain (${e.getErrorClass})")
        spark.stop()
        sys.exit(2)
    }
    val t0 = System.nanoTime()
    val q = ContinuousIngest.start(spark,
      spark.readStream.schema(schema).parquet(src),
      checkpoint,
      ContinuousIngest.Config(corpusPath = corpus, indexName = index,
        compactEvery = 8,
        textIndexName = args.lift(4),
        annIndexName = args.lift(5),
        ivfIndexPath = args.lift(6),
        chunkIndexName = args.lift(7),
        sketchName = args.lift(8),
        // The batch quality gate is ON BY DEFAULT (the pre-round-14
        // behavior: a poison batch is rejected, never silently
        // committed) with an EXPLICIT opt-out — SPARK_GRAFT_BATCH_CHECKS=0
        // disables it for deployments that gate upstream. The opt-out is
        // ignored under SPARK_GRAFT_WAP=1: WAP's audit step IS these
        // checks, so WAP with an empty check list would publish every
        // staged batch unaudited.
        batchChecks =
          if (sys.env.get("SPARK_GRAFT_BATCH_CHECKS").contains("0") &&
              !sys.env.get("SPARK_GRAFT_WAP").contains("1")) Nil
          else
            Seq(
              graft.etl.DataQuality.Completeness("text", "batch.text"),
              graft.etl.DataQuality.NonNegative("n_chars", "batch.n_chars")),
        wapAudit = sys.env.get("SPARK_GRAFT_WAP").contains("1"),
        sketchAuditTokens = sys.env.get("SPARK_GRAFT_SKETCH_AUDIT")
          .map(_.toInt).getOrElse(0)))
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    // an empty drain on a brand-new corpus (no rows arrived, or every
    // doc was gated out) has no committed manifest yet — that's a valid
    // zero-row outcome, not a summary-time crash
    val n = graft.etl.ManifestTable.currentSnapshot(spark, corpus)
      .map(_ => graft.etl.ManifestTable.read(spark, corpus).count())
      .getOrElse(0L)
    println(f"[ingest] drained $src into $corpus (index: $index): " +
      f"corpus now $n rows, ${secs}%.1f s this run")
    spark.stop()
  }
}
