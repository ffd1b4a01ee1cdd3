package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again today"
  private val docB = "the quick brown fox jumps over the lazy dog again and again tonight" // near-dup of A
  private val docC = "completely different content about spark shuffles and partitions here now"

  test("shingles builds sliding word trigrams") {
    val out = Seq("a b c d").toDF("text")
      .select(DedupOps.shingles($"text").as("sh"))
      .head().getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
  }

  test("shingles of short text is empty") {
    val out = Seq("a b").toDF("text")
      .select(DedupOps.shingles($"text").as("sh"))
      .head().getSeq[String](0)
    assert(out.isEmpty)
  }

  test("keepBestPerCluster: longest doc of each cluster survives, ties break to smallest id, uniques pass") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val dup = (1 to 30).map(i => s"alt$i").mkString(" ")
    val docs = Seq(
      (1L, s"$base extraword"), // cluster {1,2}: longer → kept
      (2L, base),               // dropped
      (4L, dup),                // cluster {4,5}: identical texts —
      (5L, dup),                //   tie on length → doc_id 4 kept
      (3L, docC)                // no near-dup → passes through
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    val kept = DedupOps.keepBestPerCluster(spark, docs,
        hashFn = DedupOps.portableSeededHash)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept == Map(1L -> "cluster_best", 4L -> "cluster_best",
      3L -> "unique"))
  }

  test("minhash LSH finds the planted near-dup pair and only it") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDups(spark, docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("minhash LSH finds near-dups in the synthetic corpus") {
    val docs = graft.core.T(spark, sf0001, "documents")
    val n = DedupOps.minhashNearDups(spark, docs).count()
    assert(n > 0, "corpus has planted near-dups (shared prefixes); none found")
  }

  test("simhashCorpus (scale path) agrees with the column variant") {
    val docs = graft.core.T(spark, sf0001, "documents").limit(50)
    val viaCorpus = DedupOps.simhashCorpus(docs)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaColumn = docs.select(
        $"doc_id",
        DedupOps.simhash64(split(lower(trim(regexp_replace($"text", "\\s+", " "))), " ")).as("h"))
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaCorpus == viaColumn)
  }

  test("simhash is identical for identical text, close for near-dups") {
    def sh(t: String): Long =
      Seq(t).toDF("text")
        .select(DedupOps.simhash64(split($"text", " ")).as("h"))
        .head().getLong(0)
    assert(sh(docA) == sh(docA))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(docA), sh(docB)) < hamming(sh(docA), sh(docC)),
      "near-dup must be closer in hamming distance than unrelated text")
  }

  test("simhash hamming-band pairs = brute force within distance 3 (pigeonhole completeness)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val banded = DedupOps.simhashHammingPairs(docs)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming"))).toSet
    // brute force over all simhash pairs
    val sims = DedupOps.simhashCorpus(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- sims; (b, hb) <- sims if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(banded == brute, "block banding must find EXACTLY the <=3-distance pairs")
    assert(banded.nonEmpty, "corpus has exact dups, so distance-0 pairs must exist")
  }

  test("ngram-jaccard's shingle extraction is shared via exchange reuse, not persisted") {
    // The round-3 caching policy in one assertion: the three consumers of
    // the exploded shingle table (both self-join sides + sizes) must
    // share its distinct()'s shuffle in the EXECUTED adaptive plan — a
    // regression here means the corpus gets re-shingled per consumer
    // (or someone re-added the persist that measured 3x slower).
    // relative, not absolute: other suites sharing this session may
    // legitimately hold pinned blocks (e.g. an index-maintenance
    // localCheckpoint); the assertion is that THIS query pins nothing
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val df = SparkEntry.queries("dd_ngram_jaccard")(spark, sf0001)
    df.collect() // execute through this QueryExecution so AQE materializes
    val plan = df.queryExecution.executedPlan.toString
    val initialIdx = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (initialIdx >= 0) plan.substring(0, initialIdx) else plan
    val reused = "ReusedExchange".r.findAllIn(finalPlan).length
    assert(reused >= 2, s"expected >=2 ReusedExchange in final plan, got $reused")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore).isEmpty,
      "dd_ngram_jaccard must not pin blocks")
  }

  test("levenshteinVerify: small in-place edits pass, large appends fail, distances exact") {
    // pair (1,2): one word swapped in place — shingle-similar AND
    // edit-similar; pair (3,4): a long append — still shingle-similar
    // (all base shingles shared) but FAR over the 20% edit budget,
    // exactly the distinction this verify stage exists to draw
    val base1 = (1 to 16).map(i => s"alpha_$i").mkString(" ")
    val edit1 = base1.replace("alpha_9", "edited9")
    val base3 = (1 to 20).map(i => s"beta_$i").mkString(" ")
    val append = (1 to 10).map(i => s"appendix_$i").mkString(" ")
    val docs = Seq(
      (1L, base1), (2L, edit1),
      (3L, base3), (4L, s"$base3 $append")).toDF("doc_id", "text")
    val out = DedupOps.levenshteinVerify(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set((1L, 2L), (3L, 4L)),
      s"both planted near-pairs must surface as candidates: ${out.keySet}")
    // reference DP for the exact distances
    def lev(a: String, b: String): Long = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length).toLong
    }
    assert(out((1L, 2L)) ==
      ((lev(base1, edit1), math.max(base1.length, edit1.length).toLong, 1L)),
      "in-place edit must be similar with the exact DP distance")
    val (d34, m34, s34) = out((3L, 4L))
    assert(d34 == (append.length + 1).toLong && s34 == 0L,
      s"append distance must be the appended chars and fail the 20% budget ($d34/$m34)")
  }

  test("boilerplateCoverage marks exactly the positions under a shared 8-gram") {
    // docs 1 and 2 share one 8-token passage at different offsets; doc 3
    // is disjoint. Coverage = the 8 positions of that window, nothing else.
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two $passage three four five"),
      (2L, s"$passage nine ten eleven twelve thirteen fourteen"),
      (3L, "p q r s t u v w x y z aa bb cc")).toDF("doc_id", "text")
    val out = DedupOps.boilerplateCoverage(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 8L && out(2L)._1 == 8L)
    assert(out(3L) == ((0L, 0.0)))
    assert(math.abs(out(1L)._2 - 8.0 / 13.0) < 1e-15)
  }

  test("boilerplateCoverage: overlapping shared windows union their positions") {
    // two docs identical for 9 tokens -> two overlapping shared 8-grams
    // covering 9 distinct positions, not 16
    val nine = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    val docs = Seq(
      (1L, s"$nine tailone tailtwo tailthree"),
      (2L, s"$nine othera otherb otherc")).toDF("doc_id", "text")
    val out = DedupOps.boilerplateCoverage(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 9L && out(2L) == 9L)
  }

  test("boilerplateCoverage: docs shorter than the window are reported uncovered") {
    val docs = Seq((1L, "just three words"), (2L, "just three words")).toDF("doc_id", "text")
    val out = DedupOps.boilerplateCoverage(docs).collect()
    assert(out.length == 2 && out.forall(_.getLong(2) == 0L))
  }

  test("ngramNovelty: originals score 1, a verbatim copy scores 0") {
    val original = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, original),
      (2L, original), // copy: every 8-gram first seen in doc 1
      (3L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val out = DedupOps.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 1.0)))
    assert(out(2L) == ((3L, 0.0)))
    assert(out(3L) == ((3L, 1.0)))
  }

  test("boilerplate: universal-gram cap bounds the dictionary; position rows never shuffle on gram") {
    import org.apache.spark.sql.functions._
    // a footer 8-gram planted in EVERY doc — the 100 TB hot-spot shape
    val footer = "copyright acme corp all rights reserved worldwide inc"
    val docs = (1L to 40L).map { i =>
      val body = (1 to 12).map(k => s"w${i}_$k").mkString(" ")
      val shared = if (i <= 10) " alpha beta gamma delta epsilon zeta eta theta" else ""
      (i, s"$body$shared $footer")
    }.toDF("doc_id", "text")
    // cap off: every doc is covered by the universal footer
    val uncapped = DedupOps.boilerplateCoverage(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uncapped.values.forall(_ >= 8L), "footer must cover all docs when uncapped")
    // cap 0.5: the universal gram is dropped from the dictionary; only
    // the 10-doc shared passage (25% of docs) still counts
    val capped = DedupOps.boilerplateCoverage(docs, maxDocFrac = Some(0.5)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 10L).forall(capped(_) >= 8L), "sub-cap shared passage must survive")
    assert((11L to 40L).forall(capped(_) == 0L),
      "universal footer must be dropped by the cap")
    // plan shape: the position rows reach the dictionary via BROADCAST,
    // and the ONLY exchange keyed on gram_h alone carries partially
    // aggregated rows (≤ one row per gram per upstream partition) — a
    // universal gram can never own a reducer with its raw position rows
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
      val plan = DedupOps.boilerplateCoverage(docs, maxDocFrac = Some(0.5))
        .queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
        "shared-gram dictionary must broadcast")
      val gramOnly = plan.collect {
        case sh: ShuffleExchangeExec => sh
      }.filter(_.outputPartitioning match {
        case hp: HashPartitioning =>
          hp.expressions.flatMap(_.references.toSeq).map(_.name) == Seq("gram_h")
        case _ => false
      })
      import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
      def strip(p: SparkPlan): SparkPlan = p match {
        case w: WholeStageCodegenExec => strip(w.child)
        case i: InputAdapter => strip(i.child)
        case other => other
      }
      gramOnly.foreach { sh =>
        assert(strip(sh.child).isInstanceOf[BaseAggregateExec],
          s"gram_h-keyed exchange must carry partial aggregates, not raw rows: ${sh.child.nodeName}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("boilerplate shuffle-join mode: identical results; cap bounds the gram-keyed partition") {
    import org.apache.spark.sql.functions._
    val footer = "copyright acme corp all rights reserved worldwide inc"
    val docs = (1L to 40L).map { i =>
      val body = (1 to 12).map(k => s"w${i}_$k").mkString(" ")
      (i, s"$body $footer")
    }.toDF("doc_id", "text")
    // shuffle-join mode (the dictionary-outgrew-broadcast deployment)
    // returns exactly the broadcast mode's rows, capped and uncapped
    Seq(None, Some(0.5): Option[Double]).foreach { cap =>
      val b = DedupOps.boilerplateCoverage(docs, maxDocFrac = cap)
        .collect().map(_.toSeq).toSet
      val s = DedupOps.boilerplateCoverage(docs, maxDocFrac = cap,
        broadcastDict = false).collect().map(_.toSeq).toSet
      assert(b == s, s"modes diverged at cap=$cap")
    }
    // in shuffle-join mode the cap is what bounds the hot partition:
    // count position rows surviving the dictionary join per gram — with
    // the universal footer capped away, no gram funnels the corpus
    val toks = DedupOps.tokens(col("text"))
    val wins = docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 8)).as("pos"))
      .select(col("doc_id"),
        md5(array_join(slice(col("toks"), col("pos") + 1, lit(8)), " ")).as("gram_h"))
    val perGram = wins.groupBy(col("gram_h")).agg(count(lit(1)).as("n"))
    val nDocs = 40.0
    val hotUncapped = perGram.agg(max(col("n"))).head().getLong(0)
    val hotCapped = perGram
      .join(wins.select(col("gram_h"), col("doc_id")).distinct()
        .groupBy(col("gram_h")).agg(count(lit(1)).as("nd")), "gram_h")
      .filter(col("nd") <= nDocs * 0.5)
      .agg(coalesce(max(col("n")), lit(0L))).head().getLong(0)
    assert(hotUncapped >= 40L, "the planted footer must dominate uncapped")
    assert(hotCapped < hotUncapped / 4,
      s"cap must bound the hottest gram: $hotCapped vs $hotUncapped")
  }

  test("ngramNovelty measuredSalt: salted strategy returns identical results under planted skew") {
    import org.apache.spark.sql.functions._
    val footer = "copyright acme corp all rights reserved worldwide inc"
    val docs = (1L to 40L).map { i =>
      val body = (1 to 12).map(k => s"w${i}_$k").mkString(" ")
      (i, s"$body $footer")
    }.toDF("doc_id", "text")
    val plain = DedupOps.ngramNovelty(docs).collect().map(_.toSeq).toSet
    val salted = DedupOps.ngramNovelty(docs, measuredSalt = true).collect().map(_.toSeq).toSet
    assert(plain == salted, "salted join must be result-identical")
  }

  test("embeddingNearDups envelope guard routes oversized inputs off the O(N²) path") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    def hasNlj(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
    // within the envelope: the exact all-pairs tool (broadcast NLJ)
    val exact = DedupOps.embeddingNearDups(spark, emb)
    assert(hasNlj(exact), "small input must take the exact all-pairs path")
    val exactPairs = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exactPairs.nonEmpty)
    // past the envelope (forced low): auto-routed to the LSH-bucketed
    // candidate path — no nested-loop join anywhere in the plan
    val routed = DedupOps.embeddingNearDups(spark, emb, maxExactVectors = 10L)
    assert(!hasNlj(routed), "oversized input must never plan an all-pairs NLJ")
    val routedPairs = routed.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // routed results are a recall-bounded subset with identical verify math
    assert(routedPairs.nonEmpty)
    assert(routedPairs.keySet.subsetOf(exactPairs.keySet))
    routedPairs.foreach { case (k, cos) => assert(cos == exactPairs(k)) }
  }

  test("routed path catches planted high-cosine near-dups (the LSH design regime)") {
    import org.apache.spark.sql.functions._
    // this corpus has NO pair above cosine 0.48 — plant five jittered
    // copies (cosine ≈ 1), the duplicates semantic dedup exists to catch
    val base = graft.core.T(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
    val dup = base.filter($"vec_id" < 5)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", x => x * lit(1.001f) + lit(0.001f)).as("embedding"))
    val emb = base.unionByName(dup)
    val routed = DedupOps.embeddingNearDups(spark, emb,
        tau = 0.9, maxExactVectors = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach { i =>
      assert(routed.contains((i, i + 10000L)), s"missed planted near-dup $i")
    }
  }

  test("corpus overlap estimate tracks exact slice Jaccard within the binomial bound") {
    // controlled overlap: slice A covers token windows 0..97, slice B
    // 50..147 (48 shared shingles of 148 distinct → J ≈ 0.324), slice C
    // disjoint
    def seqText(from: Int, n: Int) =
      (from until from + n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, "A", seqText(0, 100)),
      (2L, "B", seqText(50, 100)),
      (3L, "C", seqText(1000, 100))).toDF("doc_id", "source", "text")
    val est = DedupOps.corpusOverlap(spark, docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == Set("A" -> "B", "A" -> "C", "B" -> "C"))
    // exact slice Jaccard via the same shingle definition
    val sh = DedupOps.shingleRows(docs)
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .select($"source", $"shingle").distinct().collect()
      .groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getString(1)).toSet }
    def exact(a: String, b: String) =
      sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
    assert(math.abs(est("A" -> "B") - exact("A", "B")) <= 0.25,
      s"est ${est("A" -> "B")} vs exact ${exact("A", "B")} — outside ~3σ of 32 perms")
    assert(est("A" -> "C") <= 0.1 && est("B" -> "C") <= 0.1,
      "disjoint slices must estimate ≈ 0")
    // declared (portable-hash) variant: same estimator, replayable hash
    val portable = DedupOps.corpusOverlap(spark, docs,
        hashFn = DedupOps.portableSeededHash)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(portable("A" -> "B") - exact("A", "B")) <= 0.25)
    // live-shape sanity: one row per source pair on the testdata corpus
    val live = DedupOps.corpusOverlap(spark,
      graft.core.T(spark, sf0001, "documents")).collect()
    val k = graft.core.T(spark, sf0001, "documents")
      .select($"source").distinct().count()
    assert(live.length == k * (k - 1) / 2)
    assert(live.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("repeatedPassages: maximal co-linear runs with exact spans; boilerplate df gate") {
    def fill(tag: String, n: Int) = (1 to n).map(i => s"${tag}_$i").mkString(" ")
    val common = (1 to 30).map(i => s"p$i").mkString(" ") // 30-token passage
    val docs = Seq(
      (1L, s"x1 x2 x3 $common y1 y2"),          // passage at tokens 4..33
      (2L, s"z1 $common ${fill("w", 20)}"),     // passage at tokens 2..31
      (3L, s"${fill("q", 40)}")                 // unrelated
    ).toDF("doc_id", "text")
    val got = DedupOps.repeatedPassages(spark, docs, w = 8, minLen = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getInt(4)))
    // ONE maximal run covering the full 30 tokens — not 23 window hits
    assert(got.toSeq == Seq((1L, 4, 2L, 2, 30)),
      s"expected the single maximal passage, got ${got.toSeq}")

    // df gate: a phrase in MORE than maxDf docs is boilerplate — no pairs
    val boiler = (1L to 9L).map(i => (i, s"head1 head2 head3 head4 head5 " +
      s"head6 head7 head8 ${fill(s"u$i", 12)}")).toDF("doc_id", "text")
    assert(DedupOps.repeatedPassages(spark, boiler, w = 8, maxDf = 5,
      minLen = 8).collect().isEmpty,
      "windows above the df gate must not generate pairs")
    // ...but under the gate the same phrase IS reported
    val few = (1L to 3L).map(i => (i, s"head1 head2 head3 head4 head5 " +
      s"head6 head7 head8 ${fill(s"u$i", 12)}")).toDF("doc_id", "text")
    val fewGot = DedupOps.repeatedPassages(spark, few, w = 8, maxDf = 5,
      minLen = 8).collect()
    assert(fewGot.length == 3, s"3 doc pairs share the header, got ${fewGot.length}")

    // oracle-portable and production hash agree on spans (values differ,
    // runs don't)
    val md5Got = DedupOps.repeatedPassages(spark, docs, w = 8, minLen = 10,
      hashFn = DedupOps.md5Hash32).collect().map(_.toSeq)
    assert(md5Got.toSeq == got.map(t => Seq(t._1, t._2, t._3, t._4, t._5)).toSeq)
  }

  test("repeatedPassagesRolling: O(tokens) pass yields identical passages") {
    // the rolling fingerprint depends only on window CONTENTS: the same
    // token run at different positions in different docs must collide
    val wh = graft.functions.WindowHashes
      .windowHashes(spark, split(col("text"), " "), 3)
    val hs = Seq("a b c d e", "x a b c d").toDF("text")
      .select(wh.as("h")).collect().map(_.getSeq[Long](0))
    assert(hs(0).length == 3 && hs(1).length == 3)
    assert(hs(0)(0) == hs(1)(1) && hs(0)(1) == hs(1)(2),
      "equal windows must hash equal regardless of position")
    assert(hs(0).distinct.length == 3, "distinct windows must not collide")
    // a doc shorter than the window yields no fingerprints
    assert(Seq("a b").toDF("text").select(wh.as("h"))
      .collect().head.getSeq[Long](0).isEmpty)

    // end-to-end: the rolling pipeline and the composed window-string
    // pipeline produce THE SAME passages on the spec fixture and on the
    // real sf0.001 corpus (hash values differ; pair/run structure can't)
    def fill(tag: String, n: Int) = (1 to n).map(i => s"${tag}_$i").mkString(" ")
    val common = (1 to 30).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"x1 x2 x3 $common y1 y2"),
      (2L, s"z1 $common ${fill("w", 20)}"),
      (3L, s"${fill("q", 40)}")
    ).toDF("doc_id", "text")
    assert(DedupOps.repeatedPassagesRolling(spark, docs, w = 8, minLen = 10)
      .collect().map(_.toSeq).toSeq ==
      DedupOps.repeatedPassages(spark, docs, w = 8, minLen = 10)
        .collect().map(_.toSeq).toSeq)
    val corpus = graft.core.T(spark, sf0001, "documents")
    val composed = DedupOps.repeatedPassages(spark, corpus)
      .collect().map(_.toSeq).toSeq
    assert(DedupOps.repeatedPassagesRolling(spark, corpus)
      .collect().map(_.toSeq).toSeq == composed)
  }
}
