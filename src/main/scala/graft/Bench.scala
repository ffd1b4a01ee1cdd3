package graft
object Bench {
  /** The load-suspect rule, factored out for direct testing: a measured
    * `v` seconds is suspect against a prior `p` when it exceeds 5× the
    * prior (sub-second priors exempt — 5× of 80 ms is scheduler jitter)
    * OR exceeds it by 10 absolute seconds (the slow-query blind spot: a
    * 9.7 s-anchor query riding at 36 s is a 3.7× load artifact that
    * slides under 5× while carrying ~26 phantom seconds into the
    * headline) OR — the mid-range term, closing the blind spot the
    * round-15 driver artifact proved (cp_diversity rode 4.85 s against a
    * 1.08 s anchor, 4.5×, into the headline unflagged and isolated back
    * to 1.09 s idle) — exceeds 3× a ≥0.5 s prior by more than 2 absolute
    * seconds. A failed measurement (−1) or a missing/invalid prior is
    * never suspect — there is nothing to compare against. */
  private[graft] def isLoadSuspect(v: Double, prior: Option[Double]): Boolean = {
    val SuspectFactor = 5.0
    val SuspectAbsSec = 10.0
    val MidFactor = 3.0
    val MidAbsSec = 2.0
    val MidMinPrior = 0.5
    v >= 0 && prior.exists(p =>
      p > 0 && ((v > SuspectFactor * p && v > math.max(1.0, p + 0.5)) ||
        v > p + SuspectAbsSec ||
        (p >= MidMinPrior && v > MidFactor * p && v > p + MidAbsSec)))
  }

  /** Per-query reference seconds: the PER-QUERY MIN across the previous
    * invocation (`target/bench.json`, written by every run) and the
    * committed idle-host anchor (`tools/bench_baseline.json`). The min —
    * not first-source-wins — because a load-poisoned previous run would
    * otherwise inflate every reference and silently defeat the suspect
    * detector, the exact failure mode the detector exists for; the
    * committed anchor caps how far a poisoned prior can drift the
    * reference. Parsed with a two-field regex — the files are this
    * main's own output, one flat `"name":seconds` map under
    * `"queries"`. */
  private def priorTimes(): Map[String, Double] = {
    val candidates = Seq("target/bench.json", "tools/bench_baseline.json")
    val maps = candidates.flatMap { p =>
      val f = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(f)) None
      else {
        val body = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        val qs = """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(body)
          .map(_.group(1)).getOrElse("")
        val m = """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9.]+)""".r.findAllMatchIn(qs)
          .map(g => g.group(1) -> g.group(2).toDouble).toMap
        if (m.nonEmpty) Some(m) else None
      }
    }
    mergePriors(maps)
  }

  /** Per-query min across reference sources, dropping non-positive
    * entries (a −1 failure sentinel must never become a reference). */
  private[graft] def mergePriors(maps: Seq[Map[String, Double]]): Map[String, Double] =
    maps.foldLeft(Map.empty[String, Double]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (k, v)) =>
        if (v <= 0) a
        else a.updated(k, a.get(k).fold(v)(math.min(_, v)))
      }
    }

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
    // local iteration only — the driver never sets it, so per-round bench
    // always covers the full surface
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // min over `n` runs: single-shot timings at this scale swing up to
    // 5x on identical code (JVM/OS noise) — the min is the stable signal.
    // Elapsed is captured BEFORE cleanup() so cache-teardown cost is not
    // charged to the query; failed reps are dropped (a fast failure must
    // not masquerade as a fast run), and an all-failed query reports -1.
    def measure(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        n: Int): Double = {
      val times = (1 to n).flatMap { _ =>
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
      if (times.isEmpty) -1.0 else times.min
    }
    val benchDefs = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    val firstPass = benchDefs.map { case (name, fn) =>
      // Offline artifact builds (persisted indexes) run ONCE, untimed —
      // they are periodic jobs amortized across probes, not per-query cost.
      // A failed setup is loud: the probe reps then fail and report -1.
      SparkEntry.benchSetups.get(name).foreach { setup =>
        try { setup(spark, sfDir); cleanup() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name setup failed: ${e.getMessage}")
        }
      }
      name -> measure(name, fn, reps)
    }
    // SELF-DEFENSE AGAINST HOST-LOAD POISONING (rounds 3/9/10/11/12 all
    // shipped artifacts with 10-50x phantom regressions that isolated
    // back to anchor on identical code): any query whose min exceeds 5x
    // its reference time — last invocation's target/bench.json, else the
    // committed idle-host anchor tools/bench_baseline.json — is re-run
    // AFTER the full sweep (transient load has had the whole suite's
    // duration to subside) and reports min-across-passes. Queries that
    // STILL exceed the rule after the retry are named in "load_suspect":
    // either real regressions or a persistently loaded host — both mean
    // "do not trust this number without isolating it", which is exactly
    // what the artifact's reader needs to know. Sub-second references are
    // exempt from the ratio term (5x of 80ms is scheduler jitter, not
    // signal). The ABSOLUTE term (v > p + 10s) closes the slow-query
    // blind spot: a 9.7s-anchor query riding at 36s is a 3.7x load
    // artifact that slides under 5x but carries ~26 phantom seconds into
    // the headline — 10 extra wall seconds is load, whatever the ratio.
    val prior = priorTimes()
    def suspect(name: String, v: Double): Boolean =
      Bench.isLoadSuspect(v, prior.get(name))
    val retried = firstPass.map { case (name, v) =>
      if (!suspect(name, v)) name -> v
      else {
        System.err.println(f"[bench] $name%s first-pass ${v}%.2fs vs prior " +
          f"${prior(name)}%.2fs — re-running (load suspected)")
        SparkEntry.benchSetups.get(name).foreach { setup =>
          try { setup(spark, sfDir); cleanup() } catch { case _: Throwable => () }
        }
        val v2 = measure(name, SparkEntry.benchQueries(name), reps)
        name -> (if (v2 >= 0) math.min(v, v2) else v)
      }
    }
    val loadSuspect = retried.collect {
      case (name, v) if suspect(name, v) => name
    }
    val results = retried
    // A failed query must not move the headline number (round-8 lesson: 18
    // -1.0 sentinels summed into "value" made the total smaller when the
    // engine broke). The total sums successes only; failures are named.
    val (succeeded, failed) = results.partition(_._2 >= 0)
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def render(rs: Seq[(String, Double)], omitted: Int): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted,"queries_full":"target/bench.json"""" else ""
      // "failed"/"load_suspect" are emitted UNCONDITIONALLY (empty = []):
      // an absent key is ambiguous between "nothing failed" and "not
      // computed", and the artifact's reader must be able to tell.
      val fl = failed.map(f => "\"" + f._1 + "\"")
        .mkString(""","failed":[""", ",", "]")
      val ls = loadSuspect.map(q => "\"" + q + "\"")
        .mkString(""","load_suspect":[""", ",", "]")
      s"""{"metric":"total","value":${fmt(succeeded.map(_._2).sum)},"unit":"sec","queries_ok":${succeeded.size},"queries":$qs$om$fl$ls,"sf":"$sfDir"}"""
    }
    val full = render(succeeded, 0)
    // The harness captures only the LAST ~2000 chars of stdout (with sbt's
    // [success] trailer after this line), so a line carrying 100+ queries
    // never parses. Keep stdout under budget by dropping the FASTEST
    // queries first — the slow ones are the grading signal — and always
    // leave the complete map on disk.
    val budget = 1700
    var kept = succeeded.sortBy(-_._2)
    var line = render(kept.sortBy(_._1), succeeded.size - kept.size)
    while (line.length > budget && kept.nonEmpty) {
      kept = kept.dropRight(1)
      line = render(kept.sortBy(_._1), succeeded.size - kept.size)
    }
    println(line)
    // stdout passes through sbt's "[info] " log prefix, which breaks naive
    // JSON parsing — always leave a clean copy on disk too
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, full.getBytes("UTF-8"))
    // The stdout line's ~1700-char budget drops the fastest queries
    // (143 of 200 at round 18), which leaves round-over-round pairing
    // blind for most of the suite. Mirror the COMPLETE map to a
    // committed path as well — additive: the stdout line and
    // target/bench.json keep their exact format and meaning.
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("tools"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("tools/bench_full.json"),
        full.getBytes("UTF-8"))
    } catch { case e: Throwable => // the mirror must never fail the bench
      System.err.println(s"[bench] full-map mirror failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
