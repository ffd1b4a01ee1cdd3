package graft

/** Cross-JVM assertion for the continuous-ingest demo: opens the SAME
  * persistent catalog [[ContinuousIngestMain]] runs on and checks that
  * the MinHash index covers the corpus row for row — the property a
  * catalog that failed to survive the JVM restart would break (the
  * second run would have rebuilt the index from its own batch alone).
  *
  * {{{ sbt "runMain graft.IngestDemoCheck <corpusPath> <indexName>" }}}
  */
object IngestDemoCheck {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: IngestDemoCheck <corpusPath> <indexName>")
    val Array(corpus, index) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val stateRoot = java.nio.file.Paths.get(corpus).toAbsolutePath.getParent
    val spark = graft.etl.LakeCatalog.persistentBuilder(
        s"local[$cpus]", cpus.toInt,
        warehouseDir = s"$stateRoot/_warehouse",
        metastoreDir = s"$stateRoot/_metastore")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpusRows = graft.etl.ManifestTable.read(spark, corpus).count()
    val indexRows = spark.table(s"${index}_sizes")
      .select("doc_id").distinct().count()
    println(s"[demo-check] corpus $corpusRows rows, index $indexRows docs")
    if (corpusRows != indexRows) {
      System.err.println("[demo-check] FAIL: index does not cover the " +
        "corpus — the catalog did not survive the JVM restart")
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
