package graft

import graft.etl.{DataQuality, ManifestTable}
import graft.etl.DataQuality._
import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The declarative check compiler: violations are measured exactly, all
  * row-level checks on a table share ONE scan, the report/gate forms
  * behave, and on a manifest table the provable checks answer from
  * zone-map metadata alone. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  // id 4 dup, name null at id 3, v negative at id 4, status 'X' at id 5
  private def dirty = Seq(
    (1L, "a", 1.0, "OK"), (2L, "b", 2.0, "OK"), (3L, null, 3.0, "OK"),
    (4L, "d", -4.0, "OK"), (4L, "e", 5.0, "OK"), (5L, "f", 6.0, "X")
  ).toDF("id", "name", "v", "status")

  test("violations are measured as exact fractions") {
    val rep = DataQuality.report(Seq(DataQuality.rowChecks(dirty, Seq(
      Completeness("name", "t.name"),
      Uniqueness("id", "t.id"),
      NonNegative("v", "t.v"),
      AcceptedValues("status", Seq("OK"), "t.status"),
      InRange("v", 0.0, 4.0, "t.v"),
      MinRows("t", threshold = 10.0)))))
    val rows = rep.collect().map(r =>
      r.getString(0) -> ((r.getDouble(1), r.getLong(3)))).toMap
    assert(rows("completeness(t.name)") == ((5.0 / 6.0, 0L)))
    assert(rows("uniqueness(t.id)") == ((5.0 / 6.0, 0L)))
    assert(rows("non_negative(t.v)") == ((5.0 / 6.0, 0L)))
    assert(rows("accepted_values(t.status)") == ((5.0 / 6.0, 0L)))
    // values {1,2,3,-4,5,6}: only 1,2,3 lie in [0,4]
    assert(rows("in_range(t.v)") == ((3.0 / 6.0, 0L)))
    assert(rows("min_rows(t)") == ((6.0, 0L)))
    assert(!DataQuality.allPassed(rep))
  }

  test("a clean table passes every check, nulls fail value checks") {
    val clean = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v")
    val rep = DataQuality.report(Seq(DataQuality.rowChecks(clean, Seq(
      Completeness("name", "t.name"), Uniqueness("id", "t.id"),
      NonNegative("v", "t.v"), MinRows("t", 2.0)))))
    assert(DataQuality.allPassed(rep))
    // a null value is a range-check FAILURE, not a skipped row
    val withNull = Seq((1L, Some(1.0)), (2L, None))
      .toDF("id", "v")
    val r2 = DataQuality.report(Seq(DataQuality.rowChecks(withNull,
      Seq(NonNegative("v", "t.v"), InRange("v", 0.0, 9.0, "t.v")))))
    assert(r2.collect().forall(_.getDouble(1) == 0.5))
  }

  test("empty input: fraction checks pass vacuously, MinRows catches it") {
    // the scan path must agree with provableFromMetadata, which reports
    // completeness 1.0 at rows == 0 — "no rows" is "no violating rows";
    // emptiness is MinRows' job
    val empty = dirty.filter(lit(false))
    val rep = DataQuality.report(Seq(
      DataQuality.rowChecks(empty, Seq(
        Completeness("name", "t.name"), Uniqueness("id", "t.id"),
        NonNegative("v", "t.v"), InRange("v", 0.0, 4.0, "t.v"),
        MinRows("t", threshold = 1.0))),
      DataQuality.containment(empty, "id", Seq(1L).toDF("pk"), "pk", "t.id")))
    val rows = rep.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows.filter(_._1 != "min_rows(t)").values.forall(_ == 1L))
    assert(rows("min_rows(t)") == 0L) // the one check that fails
  }

  test("containment measures FK coverage; null FKs fail") {
    val fact = Seq((1L, 10L), (2L, 20L), (3L, 99L))
      .toDF("id", "fk")
      .unionByName(Seq((4L, Option.empty[Long])).toDF("id", "fk"))
    val dim = Seq(10L, 20L, 30L).toDF("pk")
    val rep = DataQuality.report(Seq(
      DataQuality.containment(fact, "fk", dim, "pk", "fact.fk")))
    val r = rep.collect().head
    assert(r.getString(0) == "containment(fact.fk)")
    assert(r.getDouble(1) == 0.5) // 10, 20 hit; 99 and null miss
    assert(r.getLong(3) == 0L)
  }

  test("all row-level checks on a table compile into ONE scan") {
    // AQE hides scans inside leaf query stages; disable it for the plan
    // walk, the house convention (PlanAuditSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      val orders = graft.core.T(spark, sf0001, "orders")
      val checked = DataQuality.rowChecks(orders, Seq(
        Completeness("o_orderpriority", "o"),
        Uniqueness("o_orderkey", "o"),
        AcceptedValues("o_orderstatus", Seq("O", "F", "P"), "o"),
        MinRows("o", 1.0)))
      checked.collect()
      checked.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.size == 1,
      s"expected one scan for four checks incl. a distinct, got ${scans.size}")
  }

  test("profile: exact per-column metrics; nulls counted, not distinct") {
    val p = DataQuality.profile(dirty, Seq("id", "name", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(p("id") == ((6L, 0L, 5L, "1", "5")))      // id 4 duplicated
    assert(p("name") == ((6L, 1L, 5L, "a", "f")))    // one null name
    assert(p("v") == ((6L, 0L, 6L, "-4.0", "6.0")))
  }

  test("profile: two scan legs, distincts on the hash path, no corpus sort") {
    // The split shape (see DataQuality.profile): the count/distinct leg
    // must plan as HashAggregate over the Expand — a string-buffered
    // min/max in the same aggregate would force SortAggregate with a
    // full sort of the (k+1)-expanded rows — and the min/max leg is a
    // grouping-free fold, so NO Sort node may appear below the stack
    // anywhere. Exactly two scans: one per leg, never one per metric.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (scans, sorts, hashAggs) = try {
      val prof = DataQuality.profile(graft.core.T(spark, sf0001, "orders"),
        Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))
      prof.collect()
      val plan = prof.queryExecution.executedPlan
      (plan.collect { case f: FileSourceScanExec => f },
        plan.collect { case s: org.apache.spark.sql.execution.SortExec => s },
        plan.collect {
          case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
        })
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.size == 2,
      s"expected two scan legs (counts+distincts, min/max), got ${scans.size}")
    // exactly ONE SortExec: the final ORDER BY column_name over the k
    // stacked rows; a second one means the expanded distinct rows are
    // being sorted into a SortAggregate again
    assert(sorts.size == 1,
      s"expected only the final k-row ORDER BY sort, got ${sorts.size}: $sorts")
    assert(hashAggs.nonEmpty, "expected the distinct leg on HashAggregate")
  }

  test("drift flags a trailing-mean deviation; short history stays null") {
    // a completeness series: five healthy batches at ~0.99, then a
    // slide to 0.94 — passes any 0.9 floor, must still flag
    val hist = (1 to 5).map(i => (i, "batch", "completeness(t.x)", 0.99)) :+
      ((6, "batch", "completeness(t.x)", 0.94))
    val rep = hist.toDF("bid", "scope", "check_name", "metric_value")
    val d = DataQuality.drift(rep, col("bid"), k = 5, tolerance = 0.02)
      .collect().map(r => r.getAs[Int]("bid") ->
        ((Option(r.getAs[java.lang.Double]("drift")),
          Option(r.getAs[java.lang.Boolean]("drifted"))))).toMap
    // batches 1..5: fewer than k predecessors → no baseline, no verdict
    (1 to 5).foreach(i => assert(d(i) == ((None, None)),
      s"batch $i has <k history and must not be judged"))
    // batch 6: trailing mean 0.99, drift -0.05, |drift| > 0.02 → flagged
    assert(d(6)._1.exists(x => math.abs(x - (-0.05)) < 1e-9))
    assert(d(6)._2.contains(true))
    // an in-tolerance wobble is not flagged
    val calm = ((1 to 5).map(i => (i, "batch", "c", 0.99)) :+
      ((6, "batch", "c", 0.98))).toDF("bid", "scope", "check_name", "metric_value")
    val calmRow = DataQuality.drift(calm, col("bid"), k = 5, tolerance = 0.02)
      .filter($"bid" === 6).collect().head
    assert(calmRow.getAs[java.lang.Boolean]("drifted") == false)
  }

  test("manifest metadata proves checks with zero data-file reads") {
    val base = Files.createTempDirectory("dq").toString + "/fact"
    val rows = (1 to 100).map(i => (s"k$i", f"2023-${i % 12 + 1}%02d-15", i.toDouble))
    ManifestTable.mergeInto(spark,
      rows.toDF("id", "date", "v").withColumn("date", to_date($"date")),
      base, Seq("id", "date"), "date")

    // exact from stats: completeness and the row floor
    val comp = DataQuality.provableFromMetadata(spark, base,
      Completeness("v", "fact.v"))
    assert(comp.contains(MetaVerdict("completeness(fact.v)", 1.0, 1.0, true)))
    val nrows = DataQuality.provableFromMetadata(spark, base,
      MinRows("fact", 50.0))
    assert(nrows.contains(MetaVerdict("min_rows(fact)", 100.0, 50.0, true)))

    // bounds 1..100 prove v ≥ 0 and v ∈ [0, 1000]
    assert(DataQuality.provableFromMetadata(spark, base,
      NonNegative("v", "fact.v")).exists(_.passed))
    assert(DataQuality.provableFromMetadata(spark, base,
      InRange("v", 0.0, 1000.0, "fact.v")).exists(_.passed))

    // bounds straddling the limit: UNPROVABLE, never a guess — the
    // caller must fall back to the scanning path
    assert(DataQuality.provableFromMetadata(spark, base,
      InRange("v", 0.0, 50.0, "fact.v")).isEmpty)
    // metric types min/max stats can't answer: unprovable
    assert(DataQuality.provableFromMetadata(spark, base,
      Uniqueness("id", "fact.id")).isEmpty)

    // the fallback scan agrees with what metadata proved
    val scanned = DataQuality.report(Seq(DataQuality.rowChecks(
      ManifestTable.read(spark, base),
      Seq(Completeness("v", "fact.v"), NonNegative("v", "fact.v")))))
    assert(DataQuality.allPassed(scanned))
  }

  test("metadata refuses a null-bearing column for bounds proofs") {
    val base = Files.createTempDirectory("dqn").toString + "/fact"
    val df = Seq((1L, "2023-01-15", Some(5.0)), (2L, "2023-02-15", None))
      .toDF("id", "date", "v")
      .withColumn("date", to_date($"date"))
    ManifestTable.mergeInto(spark, df, base, Seq("id", "date"), "date")
    // min 5.0 would "prove" non-negativity, but the null row FAILS the
    // scan metric — bounds proofs require a fully non-null column
    assert(DataQuality.provableFromMetadata(spark, base,
      NonNegative("v", "fact.v")).isEmpty)
    // completeness stays answerable, and reports the null exactly
    val c = DataQuality.provableFromMetadata(spark, base,
      Completeness("v", "fact.v", threshold = 1.0))
    assert(c.exists(v => v.metricValue == 0.5 && !v.passed))
  }

  test("histogram: clean-width buckets, boundary values, under/overflow arms, nulls excluded") {
    val df = Seq(Option(-5.0), Option(0.0), Option(49.9), Option(50.0),
      Option(99.9), Option(100.0), Option(250.0), Option.empty[Double])
      .toDF("v")
    val h = DataQuality.histogram(df, "v", lo = 0.0, hi = 100.0, buckets = 2)
      .collect()
    assert(h.map(r => (r.getInt(0), r.getLong(3))).toSeq ==
      Seq((-1, 1L), (0, 2L), (1, 2L), (2, 2L)),
      "-5 underflows, [0,50) holds {0,49.9}, [50,100) holds {50,99.9}, " +
        "{100,250} overflow (hi is exclusive), the null is no row")
    val b0 = h.find(_.getInt(0) == 0).get
    assert(b0.getDouble(1) == 0.0 && b0.getDouble(2) == 50.0,
      "bucket edges derive from lo + idx * width")
  }
}
