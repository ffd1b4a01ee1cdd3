package graft

import graft.streaming.ContinuousIngest

/** Runnable entry point for the composed continuous-ingest pipeline —
  * the non-test caller of [[graft.streaming.ContinuousIngest]]. Points a
  * parquet-directory documents stream (schema: `documents` + a DATE
  * `doc_date` column) at a manifest-committed corpus and its MinHash
  * index, with periodic compaction/vacuum:
  *
  * {{{
  * sbt "runMain graft.ContinuousIngestMain <srcDir> <corpusPath> <indexName> <checkpointDir> [textIndexName [annIndexName]]"
  * }}}
  *
  * The optional trailing names switch on the BM25 postings index and
  * the LSH ANN index (the latter requires an `embedding` column in the
  * stream schema).
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
    require(args.length >= 4 && args.length <= 6,
      "usage: ContinuousIngestMain <srcDir> <corpusPath> <indexName> " +
        "<checkpointDir> [textIndexName [annIndexName]]")
    val Array(src, corpus, index, checkpoint) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = spark.read.parquet(src).schema
    val t0 = System.nanoTime()
    val q = ContinuousIngest.start(spark,
      spark.readStream.schema(schema).parquet(src),
      checkpoint,
      ContinuousIngest.Config(corpusPath = corpus, indexName = index,
        compactEvery = 8,
        textIndexName = args.lift(4),
        annIndexName = args.lift(5)))
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val n = graft.etl.ManifestTable.read(spark, corpus).count()
    println(f"[ingest] drained $src into $corpus (index: $index): " +
      f"corpus now $n rows, ${secs}%.1f s this run")
    spark.stop()
  }
}
