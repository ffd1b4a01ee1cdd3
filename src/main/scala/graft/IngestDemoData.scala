package graft

import org.apache.spark.sql.functions._

/** Batch generator for the continuous-ingest demo
  * (`tools/ingest_demo.sh`): materializes one documents micro-batch —
  * the testdata's `documents` columns plus the `doc_date` the manifest
  * table partitions by and a deterministic id-derived `embedding` for
  * the LSH ANN leg — into the demo's source directory, where the next
  * [[ContinuousIngestMain]] run drains it.
  *
  * {{{ sbt "runMain graft.IngestDemoData <sfDir> <srcDir> cold|incremental" }}}
  */
object IngestDemoData {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 &&
      (args(2) == "cold" || args(2) == "incremental"),
      "usage: IngestDemoData <sfDir> <srcDir> cold|incremental")
    val Array(sfDir, srcDir, phase) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.T(spark, sfDir, "documents")
    val batch = (if (phase == "cold")
        docs.filter(col("doc_id") % 10 =!= 0).limit(5000)
      else docs.filter(col("doc_id") % 10 === 0).limit(500))
      .withColumn("doc_date", to_date(lit("2024-01-15")))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(15)),
          k => (pmod(col("doc_id") * 31 + k * 7, lit(13)) - 6).cast("float")))
    batch.write.mode("append").parquet(srcDir)
    println(s"[demo-data] wrote ${batch.count()} $phase docs to $srcDir")
    spark.stop()
  }
}
