package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared engine capability: a Spark DataFrame builder over the
  * testdata tables plus (when SQL-expressible) an equivalent DuckDB oracle
  * query. Column names MUST match between the two — the driver sorts
  * columns by name and hashes values.
  *
  * `benchBuild`, when set, is what Bench times instead of `build`: some
  * queries are DECLARED with an oracle-portable hash (md5-derived, so
  * DuckDB can replay the pipeline value-for-value) whose scalar cost is
  * not the production path's. Verify always checks `build`; Bench measures
  * `benchBuild.getOrElse(build)`. The two must be the same pipeline shape —
  * only a scalar primitive may differ (the hash, or the ordered-fold vs
  * `avg` mean in IVF training).
  *
  * `benchSetup`, when set, runs ONCE before Bench's timed reps — for
  * queries that probe a persisted artifact (e.g. the MinHash band index)
  * whose construction is an offline job amortized across many probes, not
  * part of the per-query cost being measured. Verify never uses it: the
  * `build` path must be self-contained (it rebuilds any artifact inline so
  * correctness never depends on stale state).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame,
    benchBuild: Option[(SparkSession, String) => DataFrame] = None,
    benchSetup: Option[(SparkSession, String) => Unit] = None)

trait QueryModule { def defs: Seq[QueryDef] }

/** Testdata table loader. Tables are single parquet files per TESTDATA.md. */
object T {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Helpers shared by all operator modules.
  *
  * Money math policy (oracle parity): monetary source columns are doubles
  * that carry exact 2-dp values, so casting them to DECIMAL reproduces the
  * intended value exactly in both Spark and DuckDB. All arithmetic then
  * stays in decimal (exact, order-independent) and only the FINAL value is
  * cast back to double — which is also exact. Never cast a *computed*
  * double to decimal: the two engines round binary doubles to decimal
  * differently (shortest-repr vs binary-expansion) and may diverge.
  */
object H {
  /** 2-dp money column as exact decimal (default fits TPC-H price ranges). */
  def dec2(c: Column, prec: Int = 12): Column = c.cast(DecimalType(prec, 2))

  /** (1 - discount) as exact DECIMAL(4,2); mirrors the SQL helper below. */
  def oneMinus(c: Column): Column =
    (lit(1) - c.cast(DecimalType(4, 2))).cast(DecimalType(4, 2))

  /** (1 + tax) as exact DECIMAL(4,2). */
  def onePlus(c: Column): Column =
    (lit(1) + c.cast(DecimalType(4, 2))).cast(DecimalType(4, 2))

  def dbl(c: Column): Column = c.cast(DoubleType)

  /** DuckDB fragments mirroring the helpers above. */
  def sqlDec2(col: String, prec: Int = 12): String =
    s"CAST($col AS DECIMAL($prec,2))"
  def sqlOneMinus(col: String): String =
    s"CAST(1 - CAST($col AS DECIMAL(4,2)) AS DECIMAL(4,2))"
  def sqlOnePlus(col: String): String =
    s"CAST(1 + CAST($col AS DECIMAL(4,2)) AS DECIMAL(4,2))"
}
