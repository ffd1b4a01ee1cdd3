package graft.etl

import graft.core.{QueryDef, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) clustered layout — multi-dimensional data skipping
  * for the lake's fact tables.
  *
  * A table laid out by ONE sort key prunes scans on that key and nothing
  * else: a `l_suppkey` filter over a partkey-sorted table reads every
  * file. Interleaving the bits of two keys into one Morton key and
  * range-partitioning by it gives every file a small bounding BOX in
  * (x, y) space, so file-level min/max statistics prune filters on
  * EITHER dimension — the Z-ordering every lakehouse engine (Delta
  * OPTIMIZE ZORDER BY, Iceberg sort orders) offers, built here from
  * plain Spark primitives:
  *
  *  - the Morton key is pure codegen arithmetic (shift/and/or magic-number
  *    bit spreading — no UDF, no custom expression needed);
  *  - the layout is one `repartitionByRange` + `sortWithinPartitions` —
  *    Spark's range partitioner turns contiguous Morton ranges into
  *    files, which is exactly what bounds each file's box;
  *  - skipping is file-level min/max intersection, the same decision
  *    parquet row-group pruning and catalog file stats make. The
  *    [[candidateFiles]] measure here derives min/max with one grouped
  *    scan (test-sized); production reads the identical numbers from
  *    parquet footers without touching rows.
  *
  * At 100 TB: the write is one shuffle (the range exchange) regardless of
  * dimensions; queries keep ordinary pushed filters and simply touch
  * fewer files. Dimensions are grid-normalized to equal bit widths first
  * ([[gridBucket]]) so neither key dominates the interleave.
  */
object ZOrderLayout {

  private val spreadSteps = Seq(
    (8, 0x00FF00FFL),
    (4, 0x0F0F0F0FL),
    (2, 0x33333333L),
    (1, 0x55555555L))

  /** Bit-spread of the low 16 bits of `c`: bit i moves to bit 2i (the
    * classic magic-number dilation, public-domain bit-twiddling). */
  def spread16(c: Column): Column =
    spreadSteps.foldLeft(c.cast(LongType).bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Morton key of two ≤16-bit dimensions: x bits at even positions, y
    * bits at odd. Bijective on the 16-bit grid; nearby (x,y) points get
    * nearby keys — the space-filling property data skipping rides on. */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Inverse of [[spread16]]: collapse even-position bits back to a
    * 16-bit value (mirror masks, shifting right). */
  private def compact16(c: Column): Column =
    Seq((1, 0x33333333L), (2, 0x0F0F0F0FL), (4, 0x00FF00FFL), (8, 0xFFFFL))
      .foldLeft(c.bitwiseAND(lit(0x55555555L))) { case (x, (s, m)) =>
        x.bitwiseOR(shiftright(x, s)).bitwiseAND(lit(m))
      }

  /** Recover (x, y) from a Morton key — the round-trip proof that the
    * key loses nothing ([[ZOrderSpec]] checks it over the full grid). */
  def deinterleave16(z: Column): (Column, Column) =
    (compact16(z), compact16(shiftright(z, 1)))

  /** DuckDB replay of [[spread16]] — same shifts, same masks. */
  def spreadSql(e: String): String =
    spreadSteps.foldLeft(s"($e & 65535)") { case (x, (s, m)) =>
      s"(($x | ($x << $s)) & $m)"
    }

  def interleaveSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Normalize a `[0, maxExclusive)` dimension onto a `2^bits` grid so
    * both interleaved dimensions carry equal weight. Exact in both
    * engines: the scaled product stays far inside exact-double range. */
  def gridBucket(c: Column, maxExclusive: Long, bits: Int = 8): Column =
    floor(c * (1L << bits) / lit(maxExclusive.toDouble)).cast(LongType)

  /** Write `df` Z-order-clustered on the two given dimension columns:
    * one range exchange on the Morton key, files = contiguous key
    * ranges = bounded (x,y) boxes. The key is dropped from the stored
    * schema — it is a layout device, not data. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
      nFiles: Int): Unit =
    df.withColumn("__z", interleave16(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file [min, max] of a column — the statistics a skipping reader
    * consults. One grouped scan here (test-sized data); production reads
    * these from parquet footers / a file-stats catalog without scanning. */
  def fileStats(spark: SparkSession, path: String, dim: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))

  /** (files whose [min,max] intersects [lo,hi], total files) — how many
    * files a `dim BETWEEN lo AND hi` scan must open under file skipping. */
  def candidateFiles(spark: SparkSession, path: String, dim: String,
      lo: Long, hi: Long): (Int, Int) = {
    val st = fileStats(spark, path, dim).collect()
    (st.count(r => r.getAs[Long]("lo") <= hi && r.getAs[Long]("hi") >= lo),
      st.length)
  }

  /** The Morton key as a declared, oracle-checked function: DuckDB
    * replays the identical shift/mask pipeline bit for bit. */
  val f18: QueryDef = QueryDef(
    "f18_zorder_key",
    Some(s"""
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        ${interleaveSql("l_partkey", "l_suppkey")} AS zkey
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) => T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        interleave16(col("l_partkey"), col("l_suppkey")).as("zkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber")))
}
