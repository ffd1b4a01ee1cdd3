package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first measured query isn't charged for it
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // No query may leak cache into the next one's timing (round-2 lesson:
    // a leaked persist distorted ~50 downstream numbers).
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val results = SparkEntry.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min over `reps` runs: single-shot timings at this scale swing up to
      // 5x on identical code (JVM/OS noise) — the min is the stable signal.
      // Elapsed is captured BEFORE cleanup() so cache-teardown cost is not
      // charged to the query; failed reps are dropped (a fast failure must
      // not masquerade as a fast run), and an all-failed query reports -1.
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink forces full evaluation of every output column —
        // count() would let Catalyst prune the projections being measured.
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        cleanup()
        if (ok) Some(elapsed) else None
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout passes through sbt's "[info] " log prefix, which breaks naive
    // JSON parsing — always leave a clean copy on disk too
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    spark.stop()
  }
}
