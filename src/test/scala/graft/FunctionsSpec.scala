package graft

import graft.operators.{SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("ISO day-of-week: weekday()+1 gives Mon=1..Sun=7 (SURVEY §7.4.1)") {
    val out = Seq("2024-01-15", "2024-01-20", "2024-01-21") // Mon, Sat, Sun
      .toDF("d")
      .select((weekday(to_date($"d")) + 1).as("iso"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 6, 7))
  }

  test("tokenCount counts whitespace tokens") {
    val n = Seq("  a  b\tc\nd ").toDF("t")
      .select(TextOps.tokenCount($"t")).head().getLong(0)
    assert(n == 4)
  }

  test("occurrences counts non-overlapping literal matches") {
    val n = Seq("x the y the z").toDF("t")
      .select(TextOps.occurrences($"t", " the ").as("n")).head().getDouble(0)
    assert(n == 2.0)
  }

  test("cosine similarity: identical=1, orthogonal=0") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .toDF("a", "b", "c")
    val r = df.select(
      SimilarityOps.cosine($"a", $"b").as("same"),
      SimilarityOps.cosine($"a", $"c").as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("lshAnn recovers >=80% of brute-force top-5 pairs (and is deterministic)") {
    import graft.functions.CosineSimilarity
    import org.apache.spark.sql.expressions.Window
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    // ground truth: exact top-5 per query (same ranking as sim_cosine_topk)
    val q = queries.select($"vec_id".as("q_id"),
      $"embedding".cast("array<double>").as("qv"))
    val e = emb.select($"vec_id".as("neighbor_id"),
      $"embedding".cast("array<double>").as("ev"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine_sim".desc, $"neighbor_id".asc)
    val truth = broadcast(q).crossJoin(e)
      .filter($"neighbor_id" =!= $"q_id")
      .select($"q_id", $"neighbor_id",
        CosineSimilarity.cosineNative(spark, $"qv", $"ev").as("cosine_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"q_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SimilarityOps.lshAnn(spark, emb, queries)
      .select($"q_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann2 = SimilarityOps.lshAnn(spark, emb, queries)
      .select($"q_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann == ann2, "seeded planes must make the result deterministic")
    assert(ann.nonEmpty)
    val recall = (ann intersect truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"LSH ANN recall $recall < 0.8 (got ${ann.size} pairs)")
  }

  test("PII scrub redacts emails, IPs, and phone numbers; counts match") {
    import graft.operators.TextOps
    val rows = Seq(
      (1L, "mail bob.smith+x@corp.example.com now"),
      (2L, "server at 192.168.001.1 rebooted"),
      (3L, "call +1 (555) 123-4567 today"),
      (4L, "clean text with no pii at all"))
      .toDF("doc_id", "text")
    val out = rows.select($"doc_id", TextOps.scrubPii($"text").as("s"))
      .orderBy($"doc_id").collect().map(_.getString(1))
    assert(out(0) == "mail <email> now")
    assert(out(1) == "server at <ipv4> rebooted")
    assert(out(2) == "call <phone> today")
    assert(out(3) == "clean text with no pii at all")
    val counted = rows.select(
      org.apache.spark.sql.functions.regexp_count(
        $"text", org.apache.spark.sql.functions.lit(TextOps.piiPatterns.head._2)).as("n"))
      .collect().map(_.getInt(0)).sum
    assert(counted == 1, "exactly one email in the fixture")
  }

  test("semantic dedup keeps exactly one representative per cluster") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val out = SimilarityOps.semanticDedup(spark, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == emb.count())
    val keepers = out.filter(_._3).map(_._1).toSet
    out.foreach { case (vec, keeper, kept) =>
      assert(keeper <= vec, "cluster representative is the minimum id")
      assert(keepers.contains(keeper), "every keeper must itself be kept")
      assert(kept == (vec == keeper))
    }
    assert(keepers.size < out.length, "corpus has planted near-dup vectors")
  }

  test("anomalousDays flags the planted spike and skips flat users") {
    import java.sql.Timestamp
    def day(d: Int, k: Int) = (1 to k).map(_ =>
      Timestamp.valueOf(f"2024-03-${d}%02d 10:00:00"))
    // user 1: 9 days of 2 events, day 10 spikes to 20; user 2: flat
    val rows =
      (1 to 9).flatMap(d => day(d, 2)).map(ts => (1L, ts)) ++
        day(10, 20).map(ts => (1L, ts)) ++
        (1 to 9).flatMap(d => day(d, 3)).map(ts => (2L, ts))
    val ev = rows.toDF("user_id", "ts")
    val out = graft.operators.EventOps.anomalousDays(ev).collect()
    assert(out.length == 1, s"exactly the spike: ${out.mkString(",")}")
    assert(out.head.getAs[Long]("user_id") == 1L
      && out.head.getAs[Long]("n") == 20L)
    assert(out.head.getAs[Double]("z") > 2.0)
  }

  test("bm25: term frequency saturates and absent terms score nothing") {
    val docs = Seq(
      (1L, "spark spark spark spark unrelated filler words here"),
      (2L, "spark appears once among other filler words here"),
      (3L, "no relevant terms in this document at all okay")).toDF("doc_id", "text")
    val out = TextOps.bm25(docs, Seq("spark", "zzz_absent"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 has no query terms -> no row; tf=4 beats tf=1 but not 4x (k1 saturation)
    assert(!out.contains(3L))
    assert(out(1L) > out(2L))
    assert(out(1L) < 4.0 * out(2L), "BM25 must saturate, not scale linearly in tf")
  }

  test("ta_lm_score: a bigram is rare when its context usually continues elsewhere") {
    import org.apache.spark.sql.functions._
    // 30 docs say "the cat sat"; one says "the zebra sat". p(zebra|the)
    // = 1/31 < 0.05 — rare. p(sat|zebra) = 1 (zebra's ONLY continuation)
    // — not rare: rarity measures the context's fan-out, not the word's
    // corpus frequency. So doc 999 scores n_rare=1, rare_frac=0.5.
    val docs = ((1L to 30L).map(i => (i, "the cat sat")) :+
      (999L, "the zebra sat")).toDF("doc_id", "text")
    val build = graft.SparkEntry.queries("ta_lm_score")
    // reuse the query builder against a temp dir holding just these docs
    val dir = java.nio.file.Files.createTempDirectory("lmscore").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = build(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((0L, 0.0)), "the common phrasing has no rare bigrams")
    assert(out(999L) == ((1L, 0.5)),
      "(the,zebra) is rare; (zebra,sat) is zebra's only continuation")
  }

  test("plane_buckets: dimension-mismatched vector yields NULL, not a prefix bucket") {
    import org.apache.spark.sql.functions._
    val planes = Seq(Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)))
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0)), // matches 3-dim planes
      (2L, Seq(1.0, 2.0))       // malformed: 2-dim
    ).toDF("id", "v")
    val out = df.select($"id",
        graft.functions.PlaneBuckets.buckets(spark, $"v", planes).as("b"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined, "well-formed vector must bucket")
    assert(out(2L).isEmpty,
      "mismatched vector must be NULL — same semantics as zip_with/list_zip")
  }
}
