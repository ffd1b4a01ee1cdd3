package graft

import graft.etl.{BatchLog, LshIndex, ManifestTable, MinhashIndex, TextIndex}
import graft.streaming.ContinuousIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-leg cost decomposition of the continuous-ingest micro-batch —
  * the measurement harness behind SCALE.md's ingest numbers. Runs the
  * cold build batch and then an incremental batch with each leg timed
  * individually (gates+dedup decision, manifest merge, MinHash /
  * BM25 / LSH / IVF appends), so optimization targets facts instead of
  * the aggregate wall clock.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IngestProfile" }}}
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GRAFT_PROFILE_HIVE=1 measures against the persistent Hive/derby
    // catalog ContinuousIngestMain runs on, to isolate metastore cost
    // from the in-memory-catalog leg costs
    val hiveRoot = java.nio.file.Files.createTempDirectory("prof_cat").toString
    val spark = (if (sys.env.get("GRAFT_PROFILE_HIVE").contains("1"))
        graft.etl.LakeCatalog.persistentBuilder(s"local[$cpus]", cpus.toInt,
          s"$hiveRoot/_warehouse", s"$hiveRoot/_metastore")
      else graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("ingest_prof").toString
    val corpus = s"$root/corpus"
    // unique per-run names: the warehouse dir (and each index family's
    // BatchLog beside it) outlives the JVM, and a stale committed marker
    // from a previous profile run silently no-ops an append leg — which
    // is exactly the kind of measurement lie this harness exists to avoid
    val runTag = (System.nanoTime() % 1000000).toString
    val (mh, ti, ann) = (s"prof${runTag}_mh", s"prof${runTag}_ti", s"prof${runTag}_ann")
    val ivf = s"$root/ivf_index"
    val ck = s"prof${runTag}_ck"
    val cfg = ContinuousIngest.Config(corpusPath = corpus, indexName = mh,
      textIndexName = Some(ti), annIndexName = Some(ann), annDims = 16,
      ivfIndexPath = Some(ivf), chunkIndexName = Some(ck),
      sketchName = Some(s"prof${runTag}_cms"))

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // deterministic 16-dim embedding derived from doc_id (the testdata's
    // embeddings table has its own ids; the profile only needs shape)
    def withCols(df: DataFrame): DataFrame = df
      .withColumn("doc_date", to_date(lit("2024-01-15")))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(15)),
          k => (pmod(col("doc_id") * 31 + k * 7, lit(13)) - 6).cast("float")))

    val docs = graft.core.T(spark, sfDir, "documents")
    val cold = withCols(docs.filter(col("doc_id") % 10 =!= 0).limit(5000))
    val inc = withCols(docs.filter(col("doc_id") % 10 === 0).limit(500))

    t("cold batch (build, 5000)") {
      ContinuousIngest.ingestBatch(spark, cold, 0L, cfg)
    }

    // incremental batch, leg by leg (the same sequence ingestBatch runs)
    // accept internals, mirrored from [[ContinuousIngest.accepted]]
    t("accept: stages in isolation") {
      import graft.operators.{CorpusPipeline, DedupOps}
      val th = cfg.thresholds
      val scrubbed = inc.withColumn("text",
        graft.operators.TextOps.scrubPii(col("text")))
      val quality = t("  gates (quality+repetition)") {
        CorpusPipeline.repetitionFilter(
          CorpusPipeline.qualityFilter(scrubbed, th), th).localCheckpoint()
      }
      val deduped = t("  exact dedup") {
        CorpusPipeline.exactDedup(quality).localCheckpoint()
      }
      val losers = t("  within-batch components") {
        DedupOps.minhashComponents(spark, deduped, cfg.nearDupThreshold)
          .filter(col("component") =!= col("doc_id"))
          .select(col("doc_id")).localCheckpoint()
      }
      val keepers = deduped.join(losers, Seq("doc_id"), "left_anti")
      t("  corpus-index probe") {
        MinhashIndex
          .incrementalPairs(spark, keepers, mh, cfg.nearDupThreshold)
          .filter(col("doc_old") =!= col("doc_new"))
          .select(col("doc_new").as("doc_id")).distinct().count()
      }
    }
    val accept = t("accept: gates+dedup+probe") {
      // localCheckpoint for the same reason ingestBatch uses it: the
      // appends below mutate the index tables the accept lineage probes
      val a = ContinuousIngest.accepted(spark, inc, cfg).localCheckpoint()
      println(s"[profile]   accepted rows: ${a.count()}")
      a
    }
    val bid = "b1"
    t("manifest merge") {
      ManifestTable.mergeInto(spark, accept, cfg.corpusPath, cfg.keys, cfg.dateCol)
    }
    t("minhash append") {
      // inlined [[MinhashIndex.append]] with per-step timers (same ops,
      // same order) — the leg is the batch's dominant cost, so its
      // internal decomposition is what the optimization loop needs
      val tabs = MinhashIndex.tables(mh)
      BatchLog.runOnce(spark, BatchLog.logDir(spark, mh), bid) {
        t("  purge (3x drop partition)") {
          Seq(tabs.shingles, tabs.sizes, tabs.banded).foreach(tb =>
            spark.sql(s"ALTER TABLE $tb DROP IF EXISTS PARTITION " +
              s"(batch_id='$bid')"))
        }
      } {
        val meta = graft.etl.IndexMeta.read(spark, mh)
        val numPerms = meta("num_perms").toInt
        val bands = meta("bands").toInt
        val nBuckets = meta("n_buckets").toInt
        val sh = graft.operators.DedupOps.shingleRows(accept).persist()
        try {
          t("  shingle write") {
            MinhashIndex.writeBucketed(sh, tabs.shingles, nBuckets,
              append = true, bid, "doc_id", "shingle")
          }
          val sig = t("  sig derive+persist") {
            val g = graft.operators.DedupOps.minhashSigFromShingles(sh,
              numPerms, (c, seed) => xxhash64(c, lit(seed))).persist()
            g.count()
            g
          }
          try {
            t("  sizes write") {
              MinhashIndex.writeBucketed(
                sig.select(col("doc_id"), col("n_sh")), tabs.sizes,
                nBuckets, append = true, bid, "doc_id")
            }
            t("  banded write") {
              MinhashIndex.writeBucketed(
                graft.operators.DedupOps.bandedBuckets(sig, numPerms, bands,
                  (c, seed) => xxhash64(c, lit(seed))),
                tabs.banded, nBuckets, append = true, bid, "band", "bucket")
            }
          } finally sig.unpersist(blocking = false)
        } finally sh.unpersist(blocking = false)
      }
    }
    t("bm25 append") {
      TextIndex.append(spark, accept, ti, bid)
    }
    t("lsh append") {
      LshIndex.append(spark,
        accept.select(col("doc_id").as("vec_id"), col("embedding")), ann, bid)
    }
    t("ivf append") {
      graft.operators.IvfIndex.appendIndexDir(spark,
        accept.select(col("doc_id").as("vec_id"), col("embedding")), ivf, bid)
    }
    t("chunk-index append") {
      LshIndex.append(spark,
        graft.operators.SimilarityOps.chunkIndexFrame(spark, accept, cfg.chunkDims),
        ck, bid)
    }
    // the round-12 quality legs, in the ingestBatch order/shape
    locally {
      import graft.etl.DataQuality
      import graft.etl.DataQuality._
      t("quality gate: batch checks (one scan)") {
        val rep = DataQuality.report(Seq(DataQuality.rowChecks(accept, Seq(
          Completeness("lang", "batch.lang"),
          NonNegative("n_chars", "batch.n_chars"),
          MinRows("batch", 1.0)))))
        println(s"[profile]   gate passed: ${DataQuality.allPassed(rep)}")
      }
      t("table health: hybrid (metadata + 1 scan)") {
        DataQuality.hybridReport(spark, corpus, Seq(
          MinRows("corpus", 1.0),
          NonNegative("n_chars", "corpus.n_chars"),
          Completeness("text", "corpus.text"))).collect()
      }
      t("table health: metadata-only checks") {
        Seq(MinRows("corpus", 1.0),
            NonNegative("n_chars", "corpus.n_chars"))
          .foreach(c => DataQuality.provableFromMetadata(spark, corpus, c))
      }
    }
    // the round-13 legs: sketch maintenance and the WAP merge form
    locally {
      import graft.etl.{DataQuality, SketchStore}
      import graft.etl.DataQuality._
      val cms = cfg.sketchName.get
      t("sketch append (O(batch) grid)") {
        SketchStore.append(spark, accept, cms, bid)
      }
      t("sketch reconcile audit (1 corpus scan)") {
        val bad = SketchStore
          .audit(spark, ManifestTable.read(spark, corpus), cms, 16)
          .filter(col("under_ok") === 0L || col("over_ok") === 0L).count()
        println(s"[profile]   audit violations: $bad")
      }
      // WAP: the same checks the pre-merge gate would run, but staged
      // and audited against the post-merge state — the timing isolates
      // what the stage+audit+publish protocol costs over a plain merge
      val inc2 = withCols(docs.filter(col("doc_id") % 10 === 5).limit(500))
      val accept2 = ContinuousIngest.accepted(spark, inc2, cfg).localCheckpoint()
      println(s"[profile]   wap batch rows: ${accept2.count()}")
      t("WAP merge (stage+audit+publish)") {
        ManifestTable.writeAuditPublishRetrying(spark, accept2, corpus,
          cfg.keys, cfg.dateCol) { merged =>
          DataQuality.allPassed(DataQuality.report(Seq(
            DataQuality.rowChecks(merged, Seq(
              NonNegative("n_chars", "corpus.n_chars"),
              MinRows("corpus", 1.0))))))
        }
      }
    }
    accept.unpersist(blocking = false)
    t("empty-batch drain") {
      ContinuousIngest.ingestBatch(spark, inc.limit(0), 2L, cfg)
    }

    graft.etl.LshIndex.dropAll(spark, ann) // generation-aware
    graft.etl.LshIndex.dropAll(spark, ck)
    val cms = s"prof${runTag}_cms"
    Seq(s"${mh}_banded", s"${mh}_shingles", s"${mh}_sizes", s"${mh}_meta",
      s"${ti}_postings", s"${ti}_doclens", s"${ti}_stats", s"${ti}_meta",
      s"${cms}_cells", s"${cms}_meta")
      .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
    Seq(mh, ti, ann, cms).foreach(n =>
      BatchLog.reset(spark, BatchLog.logDir(spark, n)))
    spark.stop()
  }
}
