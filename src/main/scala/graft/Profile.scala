package graft

/** Per-query timing harness for builder iteration: times the NAMED queries
  * (bench variant, same noop-sink protocol as [[Bench]]) and prints every
  * rep, so a regression can be profiled without paying for the full suite.
  * `SPARK_GRAFT_EXPLAIN=1` additionally prints the formatted plan.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    args.foreach { n =>
      val fn = SparkEntry.benchQueries(n)
      SparkEntry.benchSetups.get(n).foreach(_(spark, sfDir)) // offline artifacts
      if (explain) { println(s"\n===== $n ====="); fn(spark, sfDir).explain("formatted") }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        elapsed
      }
      println(f"[profile] $n%-30s ${times.map(t => f"$t%6.2f").mkString(" ")}  min=${times.min}%6.2f")
    }
    spark.stop()
  }
}
