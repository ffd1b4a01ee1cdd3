package graft

import graft.functions.TopKAggregate
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[TopKAggregate]] — the map-side-truncating grouped top-k must select
  * exactly what the window form selects (ties included), keep its buffer
  * bounded at k through update/merge/serialize, and plan as partial+final
  * ObjectHashAggregate (the shape whose exchange carries ≤ k entries per
  * map task per group). */
class TopKSpec extends SparkSpec {
  import org.scalatest.matchers.should.Matchers._

  private def fixture = {
    import spark.implicits._
    // heavy ties (score = i % 7) force the id tiebreak at every rank
    // boundary; nulls must be skipped like the window form skips them
    (1 to 2000).map { i =>
      val g = s"g${i % 5}"
      val score: java.lang.Double = if (i % 97 == 0) null else (i % 7).toDouble
      (g, score, i.toLong)
    }.toDF("g", "score", "id").repartition(8)
  }

  test("selects exactly the window form's top-k, ties broken identically") {
    import spark.implicits._
    val df = fixture
    val got = df.groupBy($"g")
      .agg(TopKAggregate.topK(spark, $"score", $"id", 4).as("top"))
      .select($"g", explode($"top").as("e"))
      .select($"g", $"e.id".as("id"), $"e.score".as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = df.filter($"score".isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)))
      .filter($"rn" <= 4)
      .select($"g", $"id", $"score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    got shouldBe want
  }

  test("result arrays arrive best-first and never exceed k") {
    import spark.implicits._
    val rows = fixture.groupBy($"g")
      .agg(TopKAggregate.topK(spark, $"score", $"id", 6).as("top"))
      .select($"top").collect()
    rows.foreach { r =>
      val entries = r.getSeq[org.apache.spark.sql.Row](0)
        .map(e => (e.getDouble(0), e.getLong(1)))
      assert(entries.size <= 6)
      entries.sliding(2).foreach {
        case Seq((s1, i1), (s2, i2)) =>
          assert(s1 > s2 || (s1 == s2 && i1 < i2), s"not best-first: $entries")
        case _ =>
      }
    }
  }

  test("buffer stays bounded at k through offer, merge, and serialization") {
    val a = new TopKAggregate.Buffer(3)
    (1 to 100).foreach(i => a.offer(i.toDouble, i.toLong))
    a.size shouldBe 3
    a.sortedBestFirst.map(_._1).toSeq shouldBe Seq(100.0, 99.0, 98.0)
    val b = new TopKAggregate.Buffer(3)
    (200 to 205).foreach(i => b.offer(i.toDouble, i.toLong))
    b.foreach(a.offer) // merge path
    a.size shouldBe 3
    a.sortedBestFirst.map(_._1).toSeq shouldBe Seq(205.0, 204.0, 203.0)
    // tie eviction prefers the smaller id
    val t = new TopKAggregate.Buffer(2)
    t.offer(1.0, 10L); t.offer(1.0, 5L); t.offer(1.0, 7L)
    t.sortedBestFirst.map(_._2).toSeq shouldBe Seq(5L, 7L)
  }

  test("NaN and -0.0 follow the comparator's total order, not IEEE ==") {
    // a split decision procedure (IEEE >/== in offer, Double.compare in
    // the heap) would corrupt selection exactly on these two values
    val a = new TopKAggregate.Buffer(1)
    a.offer(0.0, 10L); a.offer(Double.NaN, 5L)
    val best = a.sortedBestFirst.head
    assert(best._1.isNaN && best._2 == 5L, "NaN ranks greatest, like DESC sort")
    val z = new TopKAggregate.Buffer(1)
    z.offer(-0.0, 5L); z.offer(0.0, 10L)
    val zb = z.sortedBestFirst.head
    assert(java.lang.Double.doubleToRawLongBits(zb._1) == 0L && zb._2 == 10L,
      "0.0 ranks above -0.0 under the total order")
  }

  test("the SQL-registered form coerces int and decimal scores at analysis time") {
    import spark.implicits._
    TopKAggregate.register(spark)
    fixture.createOrReplaceTempView("tk_fixture")
    // int score and int-ish id: ImplicitCastInputTypes must insert the
    // casts — without the contract this ClassCastExceptions mid-job
    val viaInt = spark.sql(
      """SELECT g, graft_top_k(CAST(id AS INT), id, 2) AS top
         FROM tk_fixture GROUP BY g""").collect()
    assert(viaInt.length == 5 &&
      viaInt.forall(_.getSeq[org.apache.spark.sql.Row](1).size == 2))
    val viaDec = spark.sql(
      """SELECT g, graft_top_k(CAST(score AS DECIMAL(10,2)), id, 3) AS top
         FROM tk_fixture WHERE score IS NOT NULL GROUP BY g""").collect()
    assert(viaDec.length == 5)
    spark.catalog.dropTempView("tk_fixture")
  }

  test("plans as partial+final ObjectHashAggregate — the exchange sits between truncated buffers") {
    import spark.implicits._
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = fixture.groupBy($"g")
        .agg(TopKAggregate.topK(spark, $"score", $"id", 3).as("top"))
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val aggs = plan.collect { case o: ObjectHashAggregateExec => o }
      assert(aggs.size >= 2,
        s"expected partial+final ObjectHashAggregate, got:\n$plan")
    }
  }
}
