package graft

import org.apache.spark.sql.functions._

/** Throwaway mechanics probe — deleted before commit. */
object ProbeScratch {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.builder("local[4]", 4)
      .appName("probe")
      .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("probe-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    val df = Seq((1L,"a","b0"),(2L,"b","b0"),(3L,"c","b0")).toDF("doc_id","shingle","batch")
    try {
      df.write.partitionBy("batch").bucketBy(4,"doc_id","shingle").sortBy("doc_id","shingle").format("parquet").saveAsTable("t1")
      println("PB1: partitionBy+bucketBy saveAsTable OK")
    } catch { case e: Throwable => println("PB1 FAIL: " + e.getMessage.take(200)) }

    val df2 = Seq((4L,"d","b1")).toDF("doc_id","shingle","batch")
    try {
      df2.write.mode("append").partitionBy("batch").bucketBy(4,"doc_id","shingle").sortBy("doc_id","shingle").format("parquet").saveAsTable("t1")
      println("PB2: append OK, count=" + s.table("t1").count())
    } catch { case e: Throwable => println("PB2 FAIL: " + e.getMessage.take(200)) }

    try {
      s.sql("ALTER TABLE t1 DROP IF EXISTS PARTITION (batch='b1')")
      println("PB3: drop partition OK, count=" + s.table("t1").count())
    } catch { case e: Throwable => println("PB3 FAIL: " + e.getMessage.take(250)) }

    try {
      df2.write.mode("append").partitionBy("batch").bucketBy(4,"doc_id","shingle").sortBy("doc_id","shingle").format("parquet").saveAsTable("t1")
      println("PB4: re-append OK, count=" + s.table("t1").count())
    } catch { case e: Throwable => println("PB4 FAIL: " + e.getMessage.take(200)) }

    s.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = s.table("t1").drop("batch").groupBy($"doc_id",$"shingle").count().queryExecution.executedPlan.toString
    println("PB5: exchange in grouped plan = " + plan.contains("Exchange"))

    try {
      s.table("t1").drop("batch").write.bucketBy(4,"doc_id","shingle").sortBy("doc_id","shingle").format("parquet").saveAsTable("t1__c")
      s.sql("DROP TABLE t1")
      s.sql("ALTER TABLE t1__c RENAME TO t1")
      println("PB6: rename swap OK, count=" + s.table("t1").count())
    } catch { case e: Throwable => println("PB6 FAIL: " + e.getMessage.take(250)) }

    // 7: does fs-level partition dir delete confuse the in-memory catalog read?
    try {
      val df3 = Seq((9L,"z","b9")).toDF("doc_id","shingle","batch")
      df3.write.partitionBy("batch").bucketBy(4,"doc_id","shingle").sortBy("doc_id","shingle").format("parquet").saveAsTable("t2")
      val loc = s.sessionState.catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("t2")).location
      val p = new org.apache.hadoop.fs.Path(loc.toString, "batch=b9")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      s.catalog.refreshTable("t2")
      println("PB7: fs delete partition dir -> count=" + s.table("t2").count())
    } catch { case e: Throwable => println("PB7 FAIL: " + e.getMessage.take(250)) }
    println("PROBE DONE")
    s.stop()
  }
}
