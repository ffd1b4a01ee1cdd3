package graft

import graft.etl.MergeService

/** A12 merge semantics: update / insert / unchanged / audit-on-decrease
  * (SURVEY §2.4 A12; ref `ingestStreamateModelPerformance.py:72-169`). */
class MergeServiceSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    ("u1", "2024-01-01", 10.0),
    ("u1", "2024-01-02", 20.0),
    ("u2", "2024-01-01", 30.0)).toDF("_id", "date", "total_earnings")

  private def updates = Seq(
    ("u1", "2024-01-01", 15.0), // increase → update, no audit
    ("u2", "2024-01-01", 5.0),  // decrease → update + audit
    ("u3", "2024-01-01", 99.0)) // new key → insert
    .toDF("_id", "date", "total_earnings")

  test("upsert updates matched, inserts new, keeps unmatched") {
    val out = MergeService.upsert(base, updates, Seq("_id", "date"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(out == Set(
      ("u1", "2024-01-01", 15.0, "updated"),
      ("u1", "2024-01-02", 20.0, "unchanged"),
      ("u2", "2024-01-01", 5.0, "updated"),
      ("u3", "2024-01-01", 99.0, "inserted")))
  }

  test("upsert is idempotent on re-application") {
    val once = MergeService.upsert(base, updates, Seq("_id", "date"))
      .drop("merge_action")
    val twice = MergeService.upsert(once, updates, Seq("_id", "date"))
      .drop("merge_action")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("upsert stamps updated_at on the matched-update path only") {
    import org.apache.spark.sql.functions.lit
    val baseS = base.withColumn("updated_at", lit("2024-01-01T00:00:00"))
    val updS = updates.withColumn("updated_at", lit("2024-06-01T00:00:00"))
    val clock = lit("2024-09-15T12:00:00") // injectable, deterministic
    val out = MergeService.upsert(baseS, updS, Seq("_id", "date"),
        stamp = Some(("updated_at", clock)))
      .collect()
      .map(r => (r.getString(0) + "/" + r.getString(1)) ->
        ((r.getString(4), r.getString(3))))
      .toMap
    assert(out("u1/2024-01-01") == ("updated", "2024-09-15T12:00:00"),
      "updated rows get the clock")
    assert(out("u2/2024-01-01") == ("updated", "2024-09-15T12:00:00"))
    assert(out("u1/2024-01-02") == ("unchanged", "2024-01-01T00:00:00"),
      "untouched rows keep the stored stamp")
    assert(out("u3/2024-01-01") == ("inserted", "2024-06-01T00:00:00"),
      "inserted rows keep the incoming value, not the clock")
  }

  test("audit emits only numeric decreases") {
    val trace = MergeService.audit(base, updates, Seq("_id", "date"),
      oldValue = "total_earnings", newValue = "total_earnings")
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(trace.toSeq == Seq(("u2", 30.0, 5.0)))
  }
}
