package graft

import org.apache.spark.sql.SparkSession

/** Local mirror of the driver's t1 smoke: run the flagship entry query at
  * sf0.001 and assert rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    df.printSchema()
    rows.foreach(r => println(r.mkString("| ", " | ", " |")))
    println(s"[smoke] entry rows=${rows.length}")
    assert(rows.nonEmpty, "entry returned 0 rows")
    spark.stop()
  }
}
