package graft

import graft.core.T
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** The prefix-filtered set-similarity join's one claim over LSH is
  * EXACTNESS: candidates may be pruned, results may not. The spec pins
  * (a) result equality with the unfiltered all-pairs join, (b) that the
  * prefix actually prunes (otherwise it's the quadratic join with extra
  * steps), and (c) the edge shapes — tiny sets, identical sets, and
  * stopword-dominated documents. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: org.apache.spark.sql.DataFrame, t: Double) = {
    val toks = docs.select($"doc_id",
      explode(array_distinct(DedupOps.tokens($"text"))).as("token"))
    val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("n_tok"))
    toks.as("a").join(toks.as("b"),
        $"a.token" === $"b.token" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select($"doc_id".as("doc_a"), $"n_tok".as("n_a")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"n_tok".as("n_b")), "doc_b")
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

  test("the prefix prunes: candidate pairs are strictly fewer than token-sharing pairs") {
    val docs = T(spark, sf0001, "documents")
    val toks = docs.select($"doc_id",
      explode(array_distinct(DedupOps.tokens($"text"))).as("token"))
    val allSharing = toks.as("a").join(toks.as("b"),
        $"a.token" === $"b.token" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    // re-derive the candidate count exactly as prefixFilterJoin builds it
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"df".asc, $"token".asc)
    val freq = toks.groupBy($"token").agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("n_tok"))
    val prefix = toks.join(freq, "token")
      .withColumn("rnk", row_number().over(w)).join(sizes, "doc_id")
      .filter($"rnk" <= $"n_tok" - ceil(lit(0.6) * $"n_tok") + 1)
      .select($"doc_id", $"token")
    val cands = prefix.as("a").join(prefix.as("b"),
        $"a.token" === $"b.token" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    assert(cands < allSharing,
      s"prefix generated $cands candidates vs $allSharing sharing pairs — no pruning")
    assert(cands > 0, "the sf0.001 corpus has near-dups; candidates expected")
  }

  test("edges: identical docs, tiny sets, stopword-dominated docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),          // identical -> J=1
      (3L, "alpha beta gamma epsilon"),        // J=3/5=0.6 with 1 and 2
      (4L, "zeta"),                            // singleton set
      (5L, "zeta"),                            // identical singleton -> J=1
      (6L, "the the the the of of of and"),    // stopword-heavy, dup tokens
      (7L, "the of and or but nor yet so"))    // shares stopwords only
      .toDF("doc_id", "text")
    Seq(0.5, 0.99).foreach { t =>
      assert(asSet(DedupOps.prefixFilterJoin(docs, t)) == asSet(brute(docs, t)),
        s"edge corpus diverged at t=$t")
    }
    val pairs = asSet(DedupOps.prefixFilterJoin(docs, 0.99))
      .map(p => (p._1, p._2))
    assert(pairs == Set((1L, 2L), (4L, 5L)),
      "exact duplicates (including singletons) must survive t=0.99")
  }
}
