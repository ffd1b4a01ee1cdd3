package graft

import graft.functions.HeavyHittersAggregate
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Misra-Gries invariants under Spark's real partial/merge machinery —
  * the corpus tables have a 31-token vocabulary that never fills a
  * k=63 summary, so the eviction and merge-reduction paths are
  * stressed here with a planted skewed stream over a large vocabulary
  * and forced multi-partition merges. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 40,000 noise items over a 4,000-word vocabulary (10 each) + three
  // planted heavy hitters far above n/(k+1)
  private def skewed(parts: Int) = {
    val noise = (0 until 40000).map(i => s"w${i % 4000}")
    val heavy = Seq.fill(4000)("alpha") ++ Seq.fill(3000)("beta") ++
      Seq.fill(2500)("gamma")
    (noise ++ heavy).toDF("token").repartition(parts)
  }

  private def summary(parts: Int, k: Int): Map[String, Long] =
    skewed(parts)
      .agg(HeavyHittersAggregate.heavyHitters(spark, $"token", k).as("s"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("guarantee: every item above n/(k+1) survives, at any partitioning") {
    val n = 40000 + 4000 + 3000 + 2500 // 49,500; n/(k+1) with k=63 is ~773
    Seq(1, 8, 32).foreach { parts =>
      val s = summary(parts, 63)
      assert(s.size <= 63, s"capacity must bound the summary, got ${s.size}")
      assert(Set("alpha", "beta", "gamma").subsetOf(s.keySet),
        s"planted heavy hitters missing at parts=$parts: ${s.keySet -- Set("alpha", "beta", "gamma")}")
      // estimates undercount by at most n/(k+1), never overcount
      val bound = n / (63 + 1)
      Seq("alpha" -> 4000L, "beta" -> 3000L, "gamma" -> 2500L).foreach {
        case (t, truth) =>
          assert(s(t) <= truth, s"$t overcounted: ${s(t)} > $truth")
          assert(truth - s(t) <= bound,
            s"$t undercounted past the MG bound: ${s(t)} vs $truth (bound $bound)")
      }
    }
  }

  test("no item below the guarantee floor is REQUIRED, but kept estimates never overcount") {
    val truth = skewed(8).groupBy($"token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    summary(8, 9).foreach { case (t, est) =>
      assert(est <= truth(t), s"$t: estimate $est exceeds true ${truth(t)}")
    }
  }

  test("composite heavyHitterTokens is EXACT: equals the full group-by filter") {
    // documents whose token stream has a big vocabulary and a few
    // genuinely frequent words (>= 1/20 of occurrences)
    val docs = (0 until 200).map { i =>
      val filler = (0 until 20).map(j => s"rare_${i}_$j").mkString(" ")
      val hot = if (i % 2 == 0) " common common alpha alpha alpha"
        else " common common"
      (i.toLong, filler + hot)
    }.toDF("doc_id", "text")
    val got = TextOps.heavyHitterTokens(spark, docs, k = 63, pctDen = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = docs.select(explode(
      graft.operators.DedupOps.tokens($"text")).as("token"))
    val n = toks.count()
    val want = toks.groupBy($"token").count()
      .filter($"count" * 20 >= n)
      .orderBy($"count".desc, $"token".asc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(want.nonEmpty, "fixture must contain real heavy hitters")
    assert(got == want,
      s"bounded-state composite diverged from exact: $got vs $want")
  }

  test("the SQL-registered form works and coerces non-string items") {
    HeavyHittersAggregate.register(spark)
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("hh_fixture")
    val viaSql = spark.sql(
      "SELECT graft_heavy_hitters(t, 4) AS s FROM hh_fixture")
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == Map("a" -> 2L, "b" -> 1L))
    // non-string items: ImplicitCastInputTypes inserts the cast at
    // analysis time instead of ClassCastException-ing mid-job
    spark.range(3).createOrReplaceTempView("hh_ints")
    val viaInts = spark.sql(
      "SELECT graft_heavy_hitters(id, 4) AS s FROM hh_ints")
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0)).toSet
    assert(viaInts == Set("0", "1", "2"))
    spark.catalog.dropTempView("hh_fixture")
    spark.catalog.dropTempView("hh_ints")
  }

  test("guards: k must be a positive literal; nulls are skipped") {
    intercept[IllegalArgumentException] {
      TextOps.heavyHitterTokens(spark, Seq((1L, "x")).toDF("doc_id", "text"),
        k = 10, pctDen = 20)
    }
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("token")
    val s = withNulls
      .agg(HeavyHittersAggregate.heavyHitters(spark, $"token", 4).as("s"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("a" -> 2L, "b" -> 1L))
  }
}
