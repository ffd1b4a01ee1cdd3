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

  test("lshAnn returns deterministic buckets (seeded planes)") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val a = SimilarityOps.lshAnn(spark, emb).collect().toSeq
    val b = SimilarityOps.lshAnn(spark, emb).collect().toSeq
    assert(a == b)
  }
}
