package graft

import graft.core.T
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** The prefix-filtered set-similarity join's one claim over LSH is
  * EXACTNESS: candidates may be pruned, results may not. The spec pins
  * (a) result equality with the unfiltered all-pairs shingle join,
  * (b) that the prefix actually prunes (otherwise it's the quadratic
  * join with extra steps), and (c) the edge shapes — identical docs,
  * shingle-less short docs, and boilerplate-dominated docs. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: org.apache.spark.sql.DataFrame, t: Double) = {
    val sh = DedupOps.shingleRows(docs)
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b")), "doc_b")
      .select($"doc_a", $"doc_b", $"n_inter",
        ($"n_a" + $"n_b" - $"n_inter").as("n_union"))
      .filter($"n_inter".cast("double") / $"n_union" >= t)
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_a", $"doc_b", $"n_inter", $"n_union").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("no false negatives: prefix-filtered results equal the all-pairs join on real docs") {
    val docs = T(spark, sf0001, "documents")
    Seq(0.5, 0.6, 0.8).foreach { t =>
      val fast = DedupOps.prefixFilterJoin(docs, t)
      assert(asSet(fast) == asSet(brute(docs, t)),
        s"prefix filter dropped or invented a pair at t=$t")
    }
  }

  test("the prefix prunes: candidate pairs are strictly fewer than shingle-sharing pairs") {
    val docs = T(spark, sf0001, "documents")
    val sh = DedupOps.shingleRows(docs)
    val allSharing = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    // re-derive the candidate count exactly as prefixFilterJoin builds it
    // (prefix + length filter)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"df".asc, $"shingle".asc)
    val freq = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val prefix = sh.join(freq, "shingle")
      .withColumn("rnk", row_number().over(w)).join(sizes, "doc_id")
      .filter($"rnk" <= $"n_sh" - ceil(lit(0.6) * $"n_sh") + 1)
      .select($"doc_id", $"shingle", $"n_sh")
    val cands = prefix.as("a").join(prefix.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id" &&
          lit(0.6) * $"a.n_sh" <= $"b.n_sh" &&
          lit(0.6) * $"b.n_sh" <= $"a.n_sh")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    assert(cands < allSharing,
      s"prefix generated $cands candidates vs $allSharing sharing pairs — no pruning")
    assert(cands > 0, "the sf0.001 corpus has near-dups; candidates expected")
  }

  test("edges: identical docs, shingle-less short docs, boilerplate-dominated docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),      // identical -> J=1
      (3L, "alpha beta gamma delta zeta"),         // 2 of 4... J=0.4
      (4L, "too short"),                           // < 3 tokens: no shingles
      (5L, "one two three"),                       // exactly one shingle
      (6L, "one two three"),                       // identical single-shingle
      (7L, "the of and the of and the of and"),    // repeated boilerplate
      (8L, "the of and the of and extra words here")) // shares 7's grams
      .toDF("doc_id", "text")
    Seq(0.3, 0.5, 0.99).foreach { t =>
      assert(asSet(DedupOps.prefixFilterJoin(docs, t)) == asSet(brute(docs, t)),
        s"edge corpus diverged at t=$t")
    }
    val pairs = asSet(DedupOps.prefixFilterJoin(docs, 0.99)).map(p => (p._1, p._2))
    assert(pairs == Set((1L, 2L), (5L, 6L)),
      "exact duplicates (including single-shingle sets) must survive t=0.99")
  }

  test("agrees with dd_ngram_jaccard on the qualifying pair set (same sets, same threshold)") {
    val docs = T(spark, sf0001, "documents")
    val viaPrefix = DedupOps.prefixFilterJoin(docs, 0.6)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaAllPairs = SparkEntry.queries("dd_ngram_jaccard")(spark, sf0001)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPrefix == viaAllPairs,
      "two independent exact algorithms over the same sets must agree")
  }
}
