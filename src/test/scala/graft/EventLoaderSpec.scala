package graft

import graft.operators.EventOps
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression for the round-8 breakage: the testdata's events.ts physical
  * encoding changed (TIMESTAMP(NANOS)-as-raw-long → TIMESTAMP(MICROS)) and
  * the loader's unconditional `ts div 1000` rebuild died at analysis,
  * taking all 18 events-family queries with it. The loader is now
  * schema-adaptive; this spec writes the same events in every physical
  * encoding the testdata has ever shipped and asserts identical loader
  * output for each.
  */
class EventLoaderSpec extends SparkSpec {
  import spark.implicits._

  // Three events with µs-granular timestamps (what every generation of the
  // testdata carries, whatever the physical encoding).
  private val micros = Seq(1705276800000000L, 1705280400123456L, 1705320000999999L)
  private val base = micros.zipWithIndex.map { case (us, i) =>
    (i.toLong, us, i.toLong % 2, s"type_$i", i * 1.5, s"""{"k":$i}""")
  }

  private def writeDir(): String =
    Files.createTempDirectory("graft-evloader").toString

  /** Write `base` with ts in the given encoding, return the loader output
    * as (event_id, epoch-µs) pairs. */
  private def roundTrip(encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                        tsWriteType: DataType): Seq[(Long, Long)] = {
    val dir = writeDir()
    base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", encode($"ts").cast(tsWriteType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampType,
      s"loader must normalize to TimestampType, got ${out.schema("ts").dataType}")
    out.select($"event_id", unix_micros($"ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  private val expected = base.map(r => (r._1, r._2))

  test("raw-nanos LONG encoding rebuilds the µs timestamp losslessly") {
    val got = roundTrip(c => c * 1000L, LongType) // µs → ns, stored as plain int64
    assert(got == expected)
  }

  test("TIMESTAMP(MICROS) encoding passes through unchanged") {
    val got = roundTrip(c => timestamp_micros(c), TimestampType)
    assert(got == expected)
  }

  test("TIMESTAMP_NTZ encoding casts losslessly under the UTC session") {
    val got = roundTrip(c => timestamp_micros(c), TimestampNTZType)
    assert(got == expected)
  }

  test("DATE encoding loads as midnight-UTC timestamps") {
    // The fourth encoding the T() contract admits; day-granular by
    // definition, so the loader yields each event's date at 00:00 UTC.
    val got = roundTrip(c => timestamp_micros(c), DateType)
    val midnights = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us / 86400000000L * 86400000000L)
    }
    assert(got == midnights)
  }

  test("an unrecognized ts type fails with a named, actionable error") {
    val dir = writeDir()
    base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts".cast(StringType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](EventOps.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }

  test("the live testdata loads with a normalized TimestampType ts") {
    // Smoke against the real file (value-level parity vs DuckDB is the
    // driver correctness gate's job — every ev_* oracle covers it).
    val ev = EventOps.events(spark, sf0001)
    assert(ev.count() > 0)
    assert(ev.schema("ts").dataType == TimestampType)
  }
}
