package graft

import graft.operators.{CorpusPipeline, CorpusPrepOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: dup-token and top-2-gram fractions on a known doc") {
    val docs = Seq(
      (1L, "a a a b"),       // 4 tokens, 2 distinct; 2-grams: "a a"×2, "a b"
      (2L, "x y z w"))       // no repetition at all
      .toDF("doc_id", "text")
    val out = CorpusPrepOps.repetitionStats(docs).orderBy($"doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_tokens") == 4)
    assert(r1.getAs[Long]("n_distinct_tokens") == 2)
    assert(r1.getAs[Double]("dup_token_frac") == 0.5)
    assert(r1.getAs[Long]("top_2gram_count") == 2)
    assert(r1.getAs[Double]("top_2gram_frac") == 2.0 / 3.0)
    val r2 = out(1)
    assert(r2.getAs[Double]("dup_token_frac") == 0.0)
    assert(r2.getAs[Long]("top_2gram_count") == 1)
  }

  test("decontaminate flags exactly the train docs sharing an n-gram with eval") {
    // eval doc 0 shares a verbatim 5-gram with train doc 1; doc 2 is clean
    val leak = "the quick brown fox jumps"
    val docs = Seq(
      (0L, s"benchmark question about $leak over things"),
      (1L, s"training text containing $leak plus more words"),
      (2L, "completely unrelated clean training document text here"))
      .toDF("doc_id", "text")
    val out = CorpusPrepOps
      .decontaminate(docs, id => id % 97 === 0)
      .orderBy($"doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L)) // eval excluded
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(0).getAs[Long]("n_shared_ngrams") >= 1)
    assert(out(0).getAs[Long]("n_eval_docs") == 1)
    assert(!out(1).getAs[Boolean]("contaminated"))
    assert(out(1).getAs[Long]("n_shared_ngrams") == 0)
  }

  test("fuzzy decontamination drops near-copies of eval docs that exact overlap would pass") {
    import graft.operators.DedupOps
    // eval doc 0 (id % 97 == 0); train doc 1 is a light paraphrase —
    // every 5-gram differs (word changed mid-window) but trigram
    // jaccard stays high; train doc 2 is unrelated
    val eval0 = (1 to 20).map(i => s"w$i").mkString(" ")
    val paraphrase = (1 to 20).map(i => if (i == 5) "swapped" else s"w$i")
      .mkString(" ")
    val docs = Seq(
      (0L, eval0), (1L, paraphrase),
      (2L, (1 to 20).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    // exact 5-gram decontamination: the paraphrase SHARES 5-grams with
    // eval (windows not covering position 5 survive) — to isolate the
    // fuzzy case, check the near-dup pair machinery directly
    val pairs = DedupOps.minhashPairsAgainst(spark,
        docs.filter($"doc_id" =!= 0), docs.filter($"doc_id" === 0))
      .collect().map(r => (r.getLong(1), r.getLong(0))) // (new, old)
    assert(pairs.toSeq == Seq((1L, 0L)),
      "only the paraphrase near-duplicates the eval doc")
    // and the declared query's shape: retained = train minus flagged
    val isEval = col("doc_id") % 97 === 0
    val flagged = DedupOps.minhashPairsAgainst(spark,
        docs.filter(!isEval), docs.filter(isEval))
      .select($"doc_new".as("doc_id")).distinct()
    val retained = docs.filter(!isEval).select($"doc_id")
      .join(flagged, Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert(retained == Set(2L), "paraphrase dropped, unrelated doc kept")
  }

  test("stratifiedSample is deterministic, respects rates, and weights invert them") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = CorpusPrepOps.stratifiedSample(docs).orderBy($"doc_id").collect()
    val b = CorpusPrepOps.stratifiedSample(docs).orderBy($"doc_id").collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be run-deterministic")
    assert(a.nonEmpty && a.length < docs.count())
    // every kept row satisfies the declared keep predicate and weight
    val rates = CorpusPrepOps.keepMillis.toMap
    a.foreach { r =>
      val millis = rates.getOrElse(r.getAs[String]("lang"), 1000L)
      assert(r.getAs[Double]("weight") == 1000.0 / millis)
    }
    // unlisted langs keep everything
    val keptByLang = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    val allByLang = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("de", "es").foreach { l =>
      assert(keptByLang.getOrElse(l, 0) == allByLang(l).toInt, s"lang $l must keep all")
    }
  }

  test("weightedSample: key = min of w per-doc draws, global k smallest, ties by doc_id") {
    val langs = Seq("en", "fr", "zh", "xx")
    val docs = (0L until 40L)
      .map(i => (i, langs((i % 4).toInt), s"s${i % 3}", s"text $i"))
      .toDF("doc_id", "lang", "source", "text")
    val got = CorpusPrepOps.weightedSample(docs, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getLong(4))).toSeq
    // brute replay of the declared key: md5Hash32("wsk<j>_<id>"), j ≤ w
    def md5h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(24, 32), 16)
    }
    val weights = CorpusPrepOps.sampleWeights.toMap.withDefaultValue(1)
    val expect = (0L until 40L).map { i =>
      val lang = langs((i % 4).toInt)
      val w = weights(lang)
      (i, lang, w, (1 to w).map(j => md5h(s"wsk${j}_$i")).min)
    }.sortBy(t => (t._4, t._1)).take(10)
    assert(got == expect,
      "weighted sample must equal the brute min-of-w-hashes top-k")
    // run-determinism (the property rand() cannot give)
    assert(got == CorpusPrepOps.weightedSample(docs, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getLong(4))).toSeq)
  }

  test("weightedSample: heavier weights are selected proportionally more often") {
    // two langs, weight 4 vs 1, equal counts: across a large draw the
    // w=4 docs should win ~4x as many slots — exact odds per pair are
    // w_A/(w_A+w_B), so a loose 2.5x floor is variance-safe at n=600
    val docs = (0L until 1200L)
      .map(i => (i, if (i % 2 == 0) "en" else "xx", "s0", s"t$i"))
      .toDF("doc_id", "lang", "source", "text")
    val sel = CorpusPrepOps.weightedSample(docs, k = 200).collect()
    val en = sel.count(_.getString(1) == "en")
    val xx = sel.length - en
    assert(en > xx * 2.5, s"weight-4 lang must dominate weight-1: en=$en xx=$xx")
  }

  test("vocabTopK: ranks are dense, coverage is monotone and bounded by 1") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val vocabSize = docs
      .select(explode(graft.operators.DedupOps.tokens($"text")).as("t"))
      .select($"t").distinct().count()
    val out = CorpusPrepOps.vocabTopK(docs, k = 50).orderBy($"rank").collect()
    assert(out.length == math.min(50L, vocabSize))
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
    val cov = out.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage must be monotone")
    assert(cov.last > 0.0 && cov.last <= 1.0)
    val ns = out.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
  }

  test("lengthHistogram: doc shares sum to 1 and buckets partition the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = CorpusPrepOps.lengthHistogram(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val share = out.map(_.getAs[Double]("doc_share")).sum
    assert(math.abs(share - 1.0) < 1e-9)
  }

  test("hard negatives: every neighbor has a different label, top-3 per anchor") {
    val out = SparkEntry.queries("sim_hard_negatives")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("q_label") != r.getAs[Int]("neighbor_label"))
      assert(r.getAs[Int]("rank") <= 3)
    }
    val byAnchor = out.groupBy(_.getAs[Long]("q_id"))
    byAnchor.values.foreach(rs => assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length)))
  }

  test("ANN hard negatives: same invariants, bounded recall vs the exact miner") {
    import graft.operators.SimilarityOps
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val anchors = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val ann = SimilarityOps.hardNegativesAnn(spark, emb, anchors).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      assert(r.getAs[Int]("q_label") != r.getAs[Int]("neighbor_label"))
      assert(r.getAs[Int]("rank") <= 3)
    }
    // recall of the exact miner's pairs on the clustered testdata
    val exact = SparkEntry.queries("sim_hard_negatives")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = ann
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN hard-negative recall $recall too low")
    // every pair the ANN path DOES return scores identically to exact
    val exactScores = SparkEntry.queries("sim_hard_negatives")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine_sim")).toMap
    ann.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      exactScores.get(k).foreach(s =>
        assert(s == r.getAs[Double]("cosine_sim"), "rerank must be the exact cosine"))
    }
  }

  test("domainRebalance: under-target sources keep everything, over-target shrink toward target") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = CorpusPrepOps.domainRebalance(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getAs[Double]("keep_prob")
      val n = r.getAs[Long]("n_docs")
      val kept = r.getAs[Long]("n_kept")
      assert(p > 0.0 && p <= 1.0)
      if (p == 1.0) assert(kept == n, "at-or-under-target sources must keep every doc")
      else assert(kept <= n)
    }
    // downsampling must actually fire for at least one source on this corpus
    assert(out.exists(r => r.getAs[Double]("keep_prob") < 1.0 &&
      r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs")))
    // deterministic: a rerun decides identically
    val again = CorpusPrepOps.domainRebalance(docs).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("blocklist matching is case-insensitive on the list side") {
    import graft.operators.TextOps
    val docs = Seq((1L, "the MERGE ran a merge", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.blocklistScore(docs, Seq("Merge")).collect()
    assert(out.head.getAs[Long]("n_hits") == 2L,
      "a mixed-case blocklist entry must match the lowercased tokens")
  }

  test("domainDrift: a source with zero vocabulary overlap gets chi2 0, not NULL") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    // a source whose tokens can never enter the global top-50
    val alien = Seq((100001L, "zzqx1 zzqx2 zzqx3 zzqx4", "xx", "alien_feed", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // k = 20 < the corpus's distinct-token count, so the alien's
    // count-1 tokens cannot enter the vocabulary
    val out = CorpusPrepOps.domainDrift(base.unionByName(alien), k = 20).collect()
    val row = out.find(_.getAs[String]("source") == "alien_feed").get
    assert(!row.isNullAt(row.fieldIndex("chi2")), "chi2 must not be NULL")
    assert(row.getAs[Double]("chi2") == 0.0)
    assert(row.getAs[Long]("n_vocab_tokens") == 0L,
      "the zero-overlap alarm is n_vocab_tokens = 0")
    // every source sums the same K cells — statistics stay comparable
    assert(out.map(_.getAs[Long]("k_cells")).distinct.length == 1)
  }

  test("domainMix: shares sum to 1 and weights rebalance to uniform") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = CorpusPrepOps.domainMix(docs).collect()
    assert(math.abs(out.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-9)
    // weighted shares are uniform: share * weight == 1/n_sources for every source
    val n = out.length
    out.foreach { r =>
      val reweighted = r.getAs[Double]("token_share") * r.getAs[Double]("uniform_weight")
      assert(math.abs(reweighted - 1.0 / n) < 1e-12)
    }
  }

  test("writeTrainingShards: partition-pruned layout, budget respected, round trip") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val summary = CorpusPrepOps.writeTrainingShards(docs, dir, budget = 2048L)
      .collect()
    // one directory per shard (hive-style partition pruning)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(shardDirs.length == summary.length && shardDirs.nonEmpty)
    // greedy packing: a shard never exceeds budget by more than one doc's tail
    val maxDoc = docs
      .select(org.apache.spark.sql.functions.max(
        graft.operators.TextOps.tokenCount($"text"))).head().getLong(0)
    summary.foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= 2048L + maxDoc,
        s"shard ${r.getAs[Long]("shard_id")} overflows")
    }
    // every doc survives the round trip exactly once
    assert(summary.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val end2end = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val (report, shards) = CorpusPipeline.prepareTrainingData(
      spark, docs, end2end)
    val nearDup = report.collect().find(_.getString(0) == "near_dup").get.getLong(1)
    assert(shards.collect().map(_.getAs[Long]("n_docs")).sum == nearDup,
      "every curated doc must land in exactly one shard")
  }

  test("packShards two-pass prefix sum equals the naive global window") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val fast = CorpusPrepOps.packShards(docs, budget = 512L, bucket = 7L)
      .orderBy($"doc_id").collect()
    // naive oracle: one global window
    val w = Window.orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .select($"doc_id", graft.operators.TextOps.tokenCount($"text").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .select($"doc_id", $"n_tokens",
        expr("cum_before div 512").as("shard_id"),
        ($"cum_before" % 512L).as("offset_in_shard"))
      .orderBy($"doc_id").collect()
    assert(fast.toSeq == naive.toSeq)
    // shards are contiguous in doc order and respect the budget modulus
    val shards = fast.map(_.getAs[Long]("shard_id"))
    assert(shards.sameElements(shards.sorted), "shard ids must be monotone in doc order")
  }

  test("packSequences assembles each shard's bytes in doc order") {
    val docs = Seq(
      (1L, "one two three"), (2L, "four five"), (3L, "six"),
      (4L, "seven eight nine ten")).toDF("doc_id", "text")
    // budget 6 tokens: docs 1,2 fill shard 0 (3+2), doc 3 starts at cum 5
    // (still shard 0), doc 4 at cum 6 -> shard 1
    val out = CorpusPrepOps.packSequences(docs, budget = 6L).collect()
    assert(out.length == 2)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("seq_md5")
      == hex("one two three<eos>four five<eos>six"))
    assert(out(1).getAs[String]("seq_md5") == hex("seven eight nine ten"))
    assert(out.map(_.getAs[Long]("n_docs")).toSeq == Seq(3L, 1L))
  }

  test("splitAssign: deterministic, exhaustive, and content-copies co-split") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val a = CorpusPrepOps.splitAssign(docs).select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = CorpusPrepOps.splitAssign(docs).select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split must be a pure function of content")
    assert(a.size == docs.count())
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // train must dominate with the 90/5/5 defaults
    val train = a.values.count(_ == "train").toDouble / a.size
    assert(train > 0.75 && train < 1.0, s"train fraction $train implausible for 90%")
  }

  test("splitAssign puts case/whitespace variants of one document in one split") {
    val docs = Seq(
      (1L, "The Quick   Brown Fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an unrelated document about shuffle partitioning strategy")
    ).toDF("doc_id", "text")
    val by = CorpusPrepOps.splitAssign(docs).select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(by(1L) == by(2L), "same normalized content must co-split (no eval leakage)")
  }

  test("chunkDocuments: window/stride coverage, overlap, and tail semantics are exact") {
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                       // shorter than window
      (3L, "")                                           // empty → no chunks
    ).toDF("doc_id", "text")
    val out = CorpusPrepOps.chunkDocuments(docs, window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // doc 1: starts 0,3,6 → ceil(max(10-4,0)/3)+1 = 3 chunks; the last
    // covers tokens 6..9, so every token lands in ≥1 chunk and adjacent
    // chunks overlap by window-stride = 1 token
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, "t0 t1 t2 t3", 4),
      (1L, 1, "t3 t4 t5 t6", 4),
      (1L, 2, "t6 t7 t8 t9", 4)))
    // a doc shorter than the window is exactly one whole-doc chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2)))
    // blank text yields NO chunk rows (split("") gives one "" token in
    // both engines — the trim gate must drop the doc, not emit a phantom
    // empty chunk)
    assert(!out.exists(_._1 == 3L))
    // full-coverage property on the live corpus: per-doc token sums
    // reconstruct n_tokens + (chunks-1) * overlap
    val live = CorpusPrepOps.chunkDocuments(
      graft.core.T(spark, sf0001, "documents"))
    val bad = live.groupBy($"doc_id")
      .agg(sum($"n_chunk_tokens").as("sum_t"), count(lit(1)).as("k"))
      .join(graft.core.T(spark, sf0001, "documents")
        .select($"doc_id", size(graft.operators.DedupOps.tokens($"text")).as("n")),
        "doc_id")
      .filter($"sum_t" =!= $"n" + ($"k" - 1) * (64 - 48))
      .count()
    assert(bad == 0, "every token must be covered with exactly window-stride overlap")
  }

  test("splitLeakage = near-dup pairs joined to split labels, cross-boundary only") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val out = CorpusPrepOps.splitLeakage(spark, docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    // independent recompute from the two building blocks
    val pairs = graft.operators.DedupOps.minhashNearDups(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val splits = CorpusPrepOps.splitAssign(docs).select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = pairs.filter { case (a, b) => splits(a) != splits(b) }
      .map { case (a, b) => (a, splits(a), b, splits(b)) }.sortBy(t => (t._1, t._3))
    assert(out.toSeq == expect.toSeq,
      "leakage must be exactly the cross-split subset of the near-dup pairs")
    out.foreach { case (_, sa, _, sb) => assert(sa != sb) }
  }

  test("chunkRetrieval attributes a planted duplicate chunk to its source doc at rank 1") {
    // query doc 0 carries corpus doc 5's exact text → every query chunk's
    // rank-1 neighbor must be the matching chunk of doc 5 at cosine 1.0
    val shared = (0 until 70).map(i => s"w$i").mkString(" ")
    val docs = (Seq((0L, shared), (1L, (100 until 160).map(i => s"x$i").mkString(" "))) ++
      (2L to 6L).map(id => (id,
        if (id == 5L) shared
        else (id * 1000 until id * 1000 + 60).map(i => s"y$i").mkString(" "))))
      .toDF("doc_id", "text")
    val out = graft.operators.SimilarityOps.chunkRetrieval(spark, docs)
    val rank1 = out.filter($"q_doc" === 0 && $"rank" === 1)
      .collect().map(r => (r.getInt(1), r.getLong(3), r.getInt(4), r.getDouble(5)))
    assert(rank1.nonEmpty)
    rank1.foreach { case (qChunk, nDoc, nChunk, cos) =>
      assert(nDoc == 5L && nChunk == qChunk && cos == 1.0,
        s"chunk $qChunk must retrieve doc 5's chunk $qChunk exactly, got ($nDoc,$nChunk,$cos)")
    }
  }

  test("temperatureMix: √n shares flatten the head, budget caps at the most-upweighted source") {
    // a SKEWED corpus (the testdata's sources are uniform, where α=½ is
    // the identity): 64 / 16 / 4 docs → √-shares ∝ 8 : 4 : 2
    val skewed = (
      (1 to 64).map(i => (i.toLong, s"big doc $i tokens here", "srcA")) ++
      (1 to 16).map(i => (100L + i, s"mid doc $i tokens here", "srcB")) ++
      (1 to 4).map(i => (200L + i, s"small doc $i tokens here", "srcC"))
    ).toDF("doc_id", "text", "source")
    val rows = graft.operators.CorpusPrepOps.temperatureMix(skewed).collect()
    val n = rows.map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    val share = rows.map(r => r.getAs[String]("source") -> r.getAs[Double]("mix_share")).toMap
    val keep = rows.map(r => r.getAs[String]("source") -> r.getAs[Double]("keep_prob")).toMap
    assert(math.abs(share.values.sum - 1.0) < 1e-9, "mix shares sum to 1")
    assert(math.abs(share("srcA") - 8.0 / 14) < 1e-9 &&
      math.abs(share("srcB") - 4.0 / 14) < 1e-9 &&
      math.abs(share("srcC") - 2.0 / 14) < 1e-9,
      s"√n shares must be 8:4:2, got $share")
    // flattening: head share below natural, tail above
    assert(share("srcA") < 64.0 / 84 && share("srcC") > 4.0 / 84)
    // the budget is the largest realizable: the most-upweighted source
    // (argmin n/q — the tail) is retained in full
    val capSource = n.keys.minBy(s => n(s) / share(s))
    assert(capSource == "srcC" && keep("srcC") >= 1.0 - 1e-9,
      s"the budget-capping tail source must keep everything, got $keep")
    assert(keep.values.forall(p => p > 0.0 && p <= 1.0))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs")) }
    // on the real corpus: invariants hold and a second run is
    // bit-identical (stateless hash, no RNG)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val real = graft.operators.CorpusPrepOps.temperatureMix(docs).collect()
    assert(real.nonEmpty &&
      math.abs(real.map(_.getAs[Double]("mix_share")).sum - 1.0) < 1e-9)
    assert(real.forall(r => r.getAs[Long]("n_kept") > 0),
      "every source must retain something under α-smoothing")
    val again = graft.operators.CorpusPrepOps.temperatureMix(docs).collect()
    assert(real.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
