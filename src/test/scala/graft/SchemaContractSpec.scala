package graft

import graft.core.T
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The loader-level schema contract (round-8 lesson: environment drift
  * surfaced as 18 analysis errors deep in a bench tail; now it's one
  * error at load naming table, column, arrived vs absorbable types). */
class SchemaContractSpec extends SparkSpec {
  import spark.implicits._

  test("all ten live testdata tables satisfy their contracts") {
    T.names.foreach(n => T(spark, sf0001, n)) // any violation throws
  }

  test("a mis-typed column fails at load with a named, actionable error") {
    val dir = Files.createTempDirectory("contract").toString
    Seq((1L, "t", "en", "s", "not-a-number"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](T(spark, dir, "documents"))
    assert(e.getMessage.contains("documents.n_chars"))
    assert(e.getMessage.contains("string"))
  }

  test("narrow fixtures load clean: only present columns are type-checked") {
    // Specs write minimal tables carrying just the columns they exercise;
    // a missing column already fails analysis with a clear name, so the
    // contract must not reject the subset — only a retyped column.
    val dir = Files.createTempDirectory("contract2").toString
    Seq((1L, "t")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    assert(T(spark, dir, "documents").count() == 1)
  }

  test("inadmissible drift: o_orderdate as raw LONG is rejected at load") {
    // Unlike events.ts there is no adaptive loader for order dates —
    // queries call to_date()/year() directly, so a raw integer must fail
    // HERE with a named error, not deep inside analysis.
    val dir = Files.createTempDirectory("contract4").toString
    Seq((1L, 2L, "O", 10.0, 1705276800000000000L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val e = intercept[IllegalStateException](T(spark, dir, "orders"))
    assert(e.getMessage.contains("orders.o_orderdate"))
    assert(e.getMessage.contains("bigint"))
  }

  test("admissible drift: events.ts as DATE passes contract AND loader") {
    // Contract/loader agreement on the fourth encoding (the round-9
    // advice found the contract admitting DATE while the loader threw).
    val dir = Files.createTempDirectory("contract5").toString
    Seq((1L, java.sql.Date.valueOf("2024-01-15"), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    assert(T(spark, dir, "events").count() == 1)
    assert(graft.operators.EventOps.events(spark, dir).count() == 1)
  }

  test("admissible drift loads clean: events.ts as raw LONG passes the contract") {
    val dir = Files.createTempDirectory("contract3").toString
    Seq((1L, 1705276800000000000L, 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    assert(T(spark, dir, "events").count() == 1)
  }
}
