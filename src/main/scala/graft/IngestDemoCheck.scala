package graft

/** Cross-JVM assertion for the continuous-ingest demo: opens the SAME
  * persistent catalog [[ContinuousIngestMain]] runs on and checks that
  * each maintained index covers the corpus row for row — the property a
  * catalog that failed to survive the JVM restart would break (the
  * second run would have rebuilt the index from its own batch alone).
  * With the optional args, the IVF lists (path-based, so the property
  * under test there is the batch-log exactly-once across JVMs) and the
  * chunk-level index (composite ids derived back to source docs) are
  * held to the same bar.
  *
  * {{{ sbt "runMain graft.IngestDemoCheck <corpusPath> <indexName> [ivfIndexPath [chunkIndexName [sketchName]]]" }}}
  */
object IngestDemoCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length <= 5,
      "usage: IngestDemoCheck <corpusPath> <indexName> [ivfIndexPath " +
        "[chunkIndexName [sketchName]]]")
    val Array(corpus, index) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val stateRoot = java.nio.file.Paths.get(corpus).toAbsolutePath.getParent
    val spark = graft.etl.LakeCatalog.persistentBuilder(
        s"local[$cpus]", cpus.toInt,
        warehouseDir = s"$stateRoot/_warehouse",
        metastoreDir = s"$stateRoot/_metastore")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = false
    def check(what: String, got: Long, want: Long): Unit = {
      println(s"[demo-check] $what: $got docs (corpus $want)")
      if (got != want) {
        System.err.println(s"[demo-check] FAIL: $what does not cover the " +
          "corpus — state did not survive the JVM restart")
        failed = true
      }
    }
    val corpusRows = graft.etl.ManifestTable.read(spark, corpus).count()
    check("minhash index", spark.table(s"${index}_sizes")
      .select("doc_id").distinct().count(), corpusRows)
    args.lift(2).foreach { ivf =>
      check("ivf lists", spark.read.parquet(ivf)
        .select("vec_id").distinct().count(), corpusRows)
    }
    args.lift(3).foreach { ck =>
      val span = graft.operators.SimilarityOps.ChunkIdSpan
      check("chunk index (distinct source docs)",
        spark.table(s"${ck}_vectors")
          .selectExpr(s"vec_id div $span as d").distinct().count(), corpusRows)
    }
    args.lift(4).foreach { cms =>
      // the linear-sketch conservation law: every grid row partitions the
      // SAME token stream, so each row's total mass equals the corpus
      // token count — a lost batch partition (catalog amnesia) breaks it
      import org.apache.spark.sql.functions._
      val total = graft.etl.ManifestTable.read(spark, corpus)
        .select(explode(graft.operators.DedupOps.tokens(col("text")))).count()
      val rowMasses = spark.table(s"${cms}_cells")
        .groupBy(col("i")).agg(sum(col("c")).as("s"))
        .collect().map(_.getLong(1)).distinct
      check("cms sketch (per-row grid mass)",
        if (rowMasses.length == 1) rowMasses.head else -1L, total)
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
