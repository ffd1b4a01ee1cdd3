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
}
