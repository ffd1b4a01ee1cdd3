package graft

import graft.etl.LakeLayout
import org.apache.spark.sql.functions._

/** Bucketed layout = the pre-paid shuffle: fact↔fact joins and
  * aggregations keyed on the bucket column must run with zero Exchange
  * in the EXECUTED plan, while the same query over plain parquet
  * shuffles both sides (control). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed fact-fact join and bucket-key aggregation are exchange-free") {
    val orders = graft.core.T(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val line = graft.core.T(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    // string check on the final adaptive plan: AQE query-stage wrappers
    // hide their subplans from TreeNode.collect, so LakeLayout's
    // node-walking shuffleCount undercounts here
    def exchangeFree(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val i = plan.indexOf("== Initial Plan ==")
      val fin = if (i >= 0) plan.substring(0, i) else plan
      !fin.contains("Exchange hashpartitioning")
    }
    LakeLayout.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    LakeLayout.writeBucketed(line, "b_lineitem", "l_orderkey", 8)
    try withNoBroadcast {
      val bo = spark.table("b_orders")
      val bl = spark.table("b_lineitem")
      val joined = bo.join(bl, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey")
        .agg(sum($"l_quantity").as("qty"))
      assert(exchangeFree(joined),
        "bucketed join + bucket-key agg must not shuffle")
      assert(joined.count() > 0)
      // control: identical query over non-bucketed scans DOES shuffle
      val plain = orders.join(line, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey")
        .agg(sum($"l_quantity").as("qty"))
      assert(!exchangeFree(plain),
        "control should shuffle — otherwise this test proves nothing")
      // results identical either way
      val a = joined.orderBy($"o_orderkey").collect().toSeq
      val b = plain.orderBy($"o_orderkey").collect().toSeq
      assert(a == b)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
