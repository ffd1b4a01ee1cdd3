package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** Bronze ingestion — SURVEY §2.9 E2/E3/E4/E5, §2.1 S1/S5/S6.
  *
  * Mirrors the reference's bronze jobs (`bronze_ingest_streamate_mock.py`,
  * `BronzeIngestUsers.py`): land raw JSON, stamp processing time, dedup,
  * write parquet partitioned for pruning. The clock is injected for
  * deterministic tests (the reference stamps server-local `datetime.now()`,
  * `bronze_ingest_streamate_mock.py:36`; we pin UTC — SURVEY §7.4.8).
  */
object BronzeIngest {

  /** S1: JSON payloads (driver-fetched from an API or read as files) →
    * DataFrame with schema inference — the crawler-equivalent
    * (`spark.read.json` inference, ref `bronze_ingest_streamate_mock.py:33`). */
  def fromJsonPayloads(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(payloads))
  }

  /** S1 at scale: the same ingest with malformed payloads QUARANTINED
    * instead of silently nulled. Against 100 TB of API responses some
    * rows are always corrupt; Spark's default PERMISSIVE mode makes a
    * bad row all-nulls plus a corrupt-record column, and dropping that
    * column silently (the [[fromJsonPayloads]] behavior when every field
    * fails to parse) loses data with no signal. Returns (good rows
    * without the marker column, quarantined raw payloads) — good rows
    * flow to bronze, the quarantine lands next to it for replay after a
    * parser fix. A row that parses but misses fields is DATA (nulls),
    * not quarantine — only unparseable payloads divert. */
  def fromJsonPayloadsQuarantined(spark: SparkSession, payloads: Seq[String],
      schema: org.apache.spark.sql.types.StructType): (DataFrame, DataFrame) = {
    import spark.implicits._
    // from_json (not the json datasource): no corrupt-column filter
    // restriction, and the quarantine keeps the ORIGINAL payload bytes
    // for replay. PERMISSIVE from_json signals an unparseable payload
    // either as a null struct or as an all-null struct with the corrupt
    // marker populated — divert on both.
    val marker = "__corrupt_record"
    val withMarker = schema.add(marker,
      org.apache.spark.sql.types.StringType)
    val parsed = spark.createDataset(payloads).toDF("raw_payload")
      .select(col("raw_payload"),
        from_json(col("raw_payload"), withMarker,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> marker)).as("rec"))
    val corrupt = col("rec").isNull || col(s"rec.$marker").isNotNull
    val good = parsed.filter(!corrupt)
      .select(schema.fieldNames.map(f => col(s"rec.$f")).toSeq: _*)
    val quarantine = parsed.filter(corrupt).select(col("raw_payload"))
    (good, quarantine)
  }

  /** E2: processing-time stamping with an injectable clock. */
  def stamp(df: DataFrame, clock: LocalDate): DataFrame =
    df.withColumn("processing_date", lit(java.sql.Date.valueOf(clock)))

  /** A11/E4: dedup on a key subset; struct/array columns are serialized to
    * JSON first when deduping on all columns (the reference's
    * "non-hashable column" sanitization, `BronzeIngestUsers.py:82-87`). */
  def dedup(df: DataFrame, keys: Seq[String]): DataFrame =
    if (keys.nonEmpty) df.dropDuplicates(keys)
    else {
      val safe = df.schema.fields.map { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.StructType |
               _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType =>
            to_json(col(f.name)).as(f.name)
          case _ => col(f.name)
        }
      }
      df.select(safe.toSeq: _*).distinct()
    }

  /** E5: duplicate diagnostic (logged metric, ref `BronzeIngestUsers.py:90-95`). */
  def duplicateCount(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()

  /** E3: align a new batch to an existing schema
    * (ref pandas `reindex(columns=...)` `BronzeIngestUsers.py:71`). */
  def alignAndAppend(existing: DataFrame, batch: DataFrame): DataFrame =
    existing.unionByName(batch, allowMissingColumns = true)

  /** S5: partitioned bronze write — `partitionBy(processing_date)` gives
    * Catalyst partition pruning on every downstream date filter. */
  def writeBronze(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("processing_date").parquet(path)
}
