package graft

import graft.core.T
import graft.operators.Salting
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val li = T(spark, sf0001, "lineitem")
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sum_l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = Salting
      .saltedSum(li, Seq("l_returnflag"), "l_quantity", saltBy = "l_orderkey")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val li = T(spark, sf0001, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val o = T(spark, sf0001, "orders")
    val plain = li.join(o, Seq("o_orderkey"))
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Salting
      .saltedJoin(li, o, key = "o_orderkey", saltBy = "l_linenumber")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("suggestBuckets sees skew; autoSaltedSum matches plain on both shapes") {
    // hot key: 9000 of 10000 rows on one key; 8-way parallelism means the
    // hot key is ~7 ideal reducer shares
    val skewed = ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong)))
      .toDF("k", "v")
    val sb = Salting.suggestBuckets(skewed, Seq("k"), parallelism = 8)
    assert(sb > 1 && sb <= 64, s"skewed input must salt, got $sb")
    val uniform = (1 to 1000).map(i => (s"k${i % 100}", i.toLong)).toDF("k", "v")
    assert(Salting.suggestBuckets(uniform, Seq("k"), parallelism = 8) == 1,
      "uniform input must not salt")
    // sampled measurement: the factor is a ratio, so it survives sampling
    // — a strongly-skewed input must still salt, and close to the full
    // measurement's factor (the estimate is unbiased; tolerance for noise)
    val sbSampled = Salting.suggestBuckets(skewed, Seq("k"), parallelism = 8,
      sampleFraction = 0.1)
    assert(sbSampled > 1, s"sampled measurement must still see the skew")
    assert(math.abs(sbSampled - sb) <= math.max(2, sb / 2),
      s"sampled factor $sbSampled too far from full measurement $sb")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Salting.autoSaltedSum(df, Seq("k"), "v", saltBy = "v", parallelism = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def plainSums(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(sum($"v")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums(skewed) == plainSums(skewed))
    assert(sums(uniform) == plainSums(uniform))
  }
}
