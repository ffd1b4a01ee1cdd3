package graft

import graft.functions.CosineSimilarity
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.core.T(spark, sf0001, "embeddings")
    .select($"vec_id", $"embedding".cast(ArrayType(DoubleType)).as("v"))

  test("native expression is bit-identical to the composed HOF form") {
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < $"b.vec_id").limit(2000)
      .select(
        SimilarityOps.cosine($"a.v", $"b.v").as("hof"),
        CosineSimilarity.cosineNative(spark, $"a.v", $"b.v").as("native"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("registered SQL function works via spark.sql") {
    CosineSimilarity.register(spark)
    emb.createOrReplaceTempView("emb_t")
    val r = spark.sql(
      "SELECT cosine_sim(v, v) AS c FROM emb_t LIMIT 5").collect()
    assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-12))
  }

  test("type check rejects non-array<double> inputs") {
    val err = intercept[Exception] {
      Seq(("a", "b")).toDF("x", "y")
        .select(CosineSimilarity.cosineNative(spark, $"x", $"y")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("int8 quantization: range, error bound, and zero-vector guard") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val out = SimilarityOps.quantizeInt8(emb).collect()
    assert(out.length == emb.count())
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_max") <= 127)
      // round-to-nearest: reconstruction error is at most half a step
      assert(r.getAs[Double]("max_abs_err") <= scale / 2 + 1e-12,
        s"err ${r.getAs[Double]("max_abs_err")} > scale/2 ${scale / 2}")
    }
    val zero = Seq((1L, Array.fill(4)(0f))).toDF("vec_id", "embedding")
    val z = SimilarityOps.quantizeInt8(zero).head()
    assert(z.getAs[Double]("scale") == 0.0 && z.getAs[Long]("q_sum") == 0L
      && z.getAs[Double]("max_abs_err") == 0.0)
  }

  test("MRL recall: one row per query, fraction bounded, full prefix = 1.0") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val q = emb.filter($"vec_id" < 10)
    val audit = SimilarityOps.mrlRecall(spark, emb, q, prefixDims = 16).collect()
    assert(audit.length == q.count())
    audit.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0 && n <= 5)
      assert(r.getAs[Double]("recall_at_k") == n / 5.0)
    }
    // a prefix that covers every dimension ranks identically -> recall 1.0
    val dims = emb.select(size($"embedding")).head().getInt(0)
    SimilarityOps.mrlRecall(spark, emb, q, prefixDims = dims).collect()
      .foreach(r => assert(r.getAs[Double]("recall_at_k") == 1.0))
    intercept[IllegalArgumentException] {
      SimilarityOps.mrlRecall(spark, emb, q, prefixDims = 0)
    }
  }

  test("quantized top-k recalls most of the exact top-k") {
    val emb = graft.core.T(spark, sf0001, "embeddings")
    val q = emb.filter($"vec_id" < 10)
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val exact = topSets(SparkEntry.queries("sim_cosine_topk")(spark, sf0001))
    val quant = topSets(SimilarityOps.quantizedTopK(spark, emb, q, topK = 5))
    val recalls = exact.map { case (k, ex) =>
      quant(k).intersect(ex).size.toDouble / ex.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, s"int8 ranking lost too much: avg recall@5 = $avg")
  }
}
