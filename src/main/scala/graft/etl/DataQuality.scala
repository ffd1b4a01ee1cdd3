package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Declarative data-quality checks (the Deequ/Great-Expectations shape:
  * completeness, uniqueness, accepted values, ranges, referential
  * containment, row-count floors) compiled into the FEWEST possible
  * passes — the validation gate a lakehouse ingest runs before accepting
  * a batch, and the standing health report a curation pipeline publishes
  * next to each table. The reference validates request shapes at its API
  * edge (`src/lambdas/earnings/lambda_function.py` parameter checks);
  * this is the data-side counterpart a 100 TB corpus needs.
  *
  * Scale design:
  *  - EVERY row-level check on a table folds into ONE aggregation over
  *    ONE scan ([[rowChecks]] builds a single `agg(...)` with one
  *    aggregate expression per check) — ten checks cost the same scan
  *    as one. All the aggregates are map-side combinable; the shuffle is
  *    k doubles per upstream partition. A [[Uniqueness]] check adds a
  *    distinct aggregate (Catalyst plans it via Expand — still one scan,
  *    ×2 row multiplier on the aggregation input only).
  *  - [[containment]] (FK coverage) is a left join against the DISTINCT
  *    reference keys — broadcast by default (dimension-sized refs), a
  *    shuffled join when the caller says the ref is fact-sized.
  *  - the 1-row aggregate → k check rows unpivot is a `stack` projection
  *    on a single row: no shuffle, no driver round-trip.
  *  - on a [[ManifestTable]], [[provableFromMetadata]] answers checks
  *    from the per-file zone-map stats alone — ZERO data files opened —
  *    falling back to the scanning path only for checks the metadata
  *    cannot prove (bounds straddle the limit, truncated string stats,
  *    stats-uncovered files). At 100 TB, completeness / row-floor /
  *    in-bounds checks on a well-maintained table are metadata reads.
  */
object DataQuality {

  sealed trait Check {
    def name: String
    def threshold: Double
  }

  /** A check whose metric is one aggregate expression over the table —
    * all [[RowCheck]]s on a table share a single scan+aggregation. The
    * metric is a fraction in [0,1] (or a count for [[MinRows]]): every
    * partial sum is integer-valued, so the double math is bit-exact and
    * engine-portable (the DuckDB oracle replays it value-for-value). */
  sealed trait RowCheck extends Check {
    private[graft] def metric: org.apache.spark.sql.Column
    /** Column whose manifest zone-map stats could answer this check
      * without a scan (None: never provable from min/max/null stats). */
    private[graft] def statColumn: Option[String] = None
  }

  /** Non-null fraction of `column` ≥ threshold. */
  final case class Completeness(column: String, label: String,
      threshold: Double = 1.0) extends RowCheck {
    val name = s"completeness($label)"
    private[graft] def metric =
      avg(when(col(column).isNotNull, 1.0).otherwise(0.0))
    override private[graft] def statColumn = Some(column)
  }

  /** distinct/total ratio of `column` ≥ threshold (1.0 = a true key).
    * Null keys count toward total but not distinct, so any null fails a
    * 1.0 threshold — the usual primary-key reading. */
  final case class Uniqueness(column: String, label: String,
      threshold: Double = 1.0) extends RowCheck {
    val name = s"uniqueness($label)"
    private[graft] def metric =
      countDistinct(col(column)).cast(DoubleType) / count(lit(1))
  }

  /** Fraction of rows whose `column` is one of `values` ≥ threshold
    * (nulls fail — an unknown status is not an accepted one). */
  final case class AcceptedValues(column: String, values: Seq[String],
      label: String, threshold: Double = 1.0) extends RowCheck {
    val name = s"accepted_values($label)"
    private[graft] def metric =
      avg(when(col(column).isin(values: _*), 1.0).otherwise(0.0))
  }

  /** Fraction of rows with lo ≤ column ≤ hi ≥ threshold (nulls fail). */
  final case class InRange(column: String, lo: Double, hi: Double,
      label: String, threshold: Double = 1.0) extends RowCheck {
    val name = s"in_range($label)"
    private[graft] def metric =
      avg(when(col(column).between(lo, hi), 1.0).otherwise(0.0))
    override private[graft] def statColumn = Some(column)
  }

  /** Fraction of rows with column ≥ 0 ≥ threshold (nulls fail). */
  final case class NonNegative(column: String, label: String,
      threshold: Double = 1.0) extends RowCheck {
    val name = s"non_negative($label)"
    private[graft] def metric =
      avg(when(col(column) >= 0.0, 1.0).otherwise(0.0))
    override private[graft] def statColumn = Some(column)
  }

  /** Row count ≥ threshold — the "did the upstream actually deliver"
    * floor. Metric is the count itself (as double), not a fraction. */
  final case class MinRows(label: String, threshold: Double)
      extends RowCheck {
    val name = s"min_rows($label)"
    private[graft] def metric = count(lit(1)).cast(DoubleType)
  }

  /** All row-level checks over `table` in ONE scan: a single global
    * aggregation computing every metric, then a stack unpivot of the
    * 1-row result into (check_name, metric_value, threshold) rows.
    *
    * Empty-input semantics: fraction metrics are vacuously 1.0 on an
    * empty table (coalesce over the null avg) — "no rows" means "no
    * violating rows", and [[MinRows]] is the check that catches
    * emptiness. This keeps the scan path and [[provableFromMetadata]]
    * (which reports completeness 1.0 at rows == 0) in agreement on the
    * same input. */
  def rowChecks(table: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowChecks needs at least one check")
    // coalesce is a no-op on non-empty input (avg of a non-null when/
    // otherwise arm); MinRows' count is never null
    def m(c: RowCheck) = coalesce(c.metric, lit(1.0))
    val agged = table.agg(
      m(checks.head).as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        m(c).as(s"m${i + 1}")
      }: _*)
    val parts = checks.zipWithIndex.map { case (c, i) =>
      s"'${c.name}', m$i, CAST(${c.threshold} AS DOUBLE)"
    }
    agged.selectExpr(
      s"stack(${checks.size}, ${parts.mkString(", ")})" +
        " AS (check_name, metric_value, threshold)")
  }

  /** Referential containment: fraction of `table.column` values present
    * in `ref.refColumn` ≥ threshold (null FKs fail). Left join against
    * the DISTINCT ref keys — broadcast by default; pass
    * `broadcastRef = false` when the reference side is fact-sized and
    * the join should shuffle on the key instead. */
  def containment(table: DataFrame, column: String, ref: DataFrame,
      refColumn: String, label: String, threshold: Double = 1.0,
      broadcastRef: Boolean = true): DataFrame = {
    val pk = ref.select(col(refColumn).as("__dq_pk")).distinct()
    val pkSide = if (broadcastRef) broadcast(pk) else pk
    table.select(col(column).as("__dq_fk"))
      .join(pkSide, col("__dq_fk") === col("__dq_pk"), "left")
      // empty fact side: vacuously contained (same rule as rowChecks)
      .agg(coalesce(avg(when(col("__dq_pk").isNotNull, 1.0)
        .otherwise(0.0)), lit(1.0)).as("metric_value"))
      .select(lit(s"containment($label)").as("check_name"),
        col("metric_value"),
        lit(threshold).cast(DoubleType).as("threshold"))
  }

  /** COLUMN PROFILER (the Deequ/Great-Expectations ColumnProfiler
    * shape): per column — row count, null count, exact distinct count,
    * min and max (as strings, for a type-uniform report).
    *
    * TWO aggregation legs over the table, crossed at one row each, NOT
    * one: min/max of a string column carries a string aggregation
    * buffer, which no hash aggregate supports — one mixed aggregate
    * forces the WHOLE pipeline (the k-way Expand the exact
    * `countDistinct`s plan through, k+1× the row count) onto
    * SortAggregate with a full sort of the expanded rows below it.
    * Split, the distinct leg plans as pure HashAggregate over the
    * Expand (no sort anywhere) and the min/max leg is a grouping-free
    * SortAggregate — no keys, so no sort either, just a per-partition
    * fold. The price is a second scan of the k profiled columns; the
    * saving is the (k+1)·rows sort — at any scale the sort costs more
    * than the narrow re-scan (measured 1.7 s mixed vs 0.8 s split over
    * both legs at sf0.1). Values are identical: the same aggregate
    * functions over the same rows, only planned separately. Min/max of
    * floating-point columns stringify engine-specifically — profile
    * integral/string/date columns when cross-engine hash-exactness
    * matters (the declared query does). */
  def profile(table: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    columns.foreach(c => require(table.columns.contains(c),
      s"profile column $c is not in the table"))
    val countAggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"))
    } :+ count(lit(1)).as("n_rows")
    val minMaxAggs = columns.flatMap { c =>
      Seq(min(col(c)).cast(org.apache.spark.sql.types.StringType).as(s"mn_$c"),
        max(col(c)).cast(org.apache.spark.sql.types.StringType).as(s"mx_$c"))
    }
    val agged = table.agg(countAggs.head, countAggs.tail: _*)
      .crossJoin(broadcast(table.agg(minMaxAggs.head, minMaxAggs.tail: _*)))
    val parts = columns.map(c =>
      s"'$c', n_rows, n_rows - nn_$c, nd_$c, mn_$c, mx_$c")
    agged.selectExpr(
      s"stack(${columns.size}, ${parts.mkString(", ")})" +
        " AS (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)")
      .orderBy(col("column_name"))
  }

  /** EQUI-WIDTH HISTOGRAM of a numeric column in ONE scan — the shape
    * view [[profile]]'s min/max can't give (a min/max pair hides a
    * bimodal or a one-sided pile-up completely). Bucket -1 catches
    * values below `lo`, bucket `buckets` above-or-at `hi` (the
    * `width_bucket` convention); empty buckets are absent, not
    * zero-filled — at 300 columns × 1000 buckets the dense spine is the
    * expensive shape. Cross-engine exact when (hi − lo) / buckets is a
    * clean literal: the bucket index is one subtraction, one division
    * and a floor over the same operands in either engine. */
  def histogram(table: DataFrame, column: String, lo: Double, hi: Double,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"need at least one bucket, got $buckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / buckets
    val x = col(column)
    val idx = when(x < lo, lit(-1))
      .when(x >= hi, lit(buckets))
      .otherwise(floor((x - lit(lo)) / lit(width)).cast("int"))
    table.filter(x.isNotNull)
      .groupBy(idx.as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * lit(width)).as("lo_edge"),
        (lit(lo) + (col("bucket") + 1) * lit(width)).as("hi_edge"),
        col("n_rows"))
      .orderBy(col("bucket"))
  }

  /** METRIC DRIFT over a published report history (the table
    * [[graft.streaming.ContinuousIngest]] appends per batch): for every
    * (scope, check) series, compare each batch's metric against the
    * trailing mean of its `k` predecessors and flag rows deviating by
    * more than `tolerance` — the "this batch passed every absolute
    * check but looks nothing like the stream" signal absolute
    * thresholds cannot express (a completeness slide from 0.999 to
    * 0.95 passes a 0.9 floor; it should still page someone).
    *
    * `orderCol` orders the series (a numeric batch id or commit time —
    * the string batch ids the ingest publishes sort wrong lexically,
    * so the caller supplies the real order). Keyed window per series:
    * shuffles one row per (batch, check), never data-sized. Rows
    * with fewer than `k` predecessors report `drift = null` (no
    * baseline, never a guess). */
  def drift(report: DataFrame, orderCol: org.apache.spark.sql.Column,
      k: Int = 5, tolerance: Double = 0.05): DataFrame = {
    require(k >= 1, s"drift needs at least one trailing batch, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("scope"), col("check_name")).orderBy(orderCol)
      .rowsBetween(-k, -1)
    report
      .withColumn("trailing_mean",
        when(count(col("metric_value")).over(w) >= k,
          avg(col("metric_value")).over(w)))
      .withColumn("drift", col("metric_value") - col("trailing_mean"))
      .withColumn("drifted",
        when(col("drift").isNotNull, abs(col("drift")) > tolerance))
  }

  /** Assemble per-table result frames into the final report: union,
    * verdict column, deterministic order. */
  def report(results: Seq[DataFrame]): DataFrame = {
    require(results.nonEmpty, "report needs at least one result frame")
    results.reduce(_.union(_))
      .select(col("check_name"), col("metric_value"), col("threshold"),
        when(col("metric_value") >= col("threshold"), 1L).otherwise(0L)
          .as("passed"))
      .orderBy(col("check_name"))
  }

  /** Gate form: true iff every check passed. One action over the report
    * frame (bounded: one row per check). */
  def allPassed(reportDf: DataFrame): Boolean =
    reportDf.filter(col("passed") === 0).isEmpty

  /** A metadata-proved check verdict: the metric (exact for
    * completeness/min-rows; 1.0 for a bounds-proved range check) and
    * whether it passed — derived from manifest zone-map stats alone,
    * zero data files opened. */
  final case class MetaVerdict(name: String, metricValue: Double,
      threshold: Double, passed: Boolean)

  /** Try to answer a row-level check on a [[ManifestTable]] from its
    * per-file stats without scanning:
    *  - [[Completeness]]: nonNull/rows is EXACT from the stats;
    *  - [[MinRows]]: total rows is exact;
    *  - [[InRange]] / [[NonNegative]]: proved passed (metric 1.0) when
    *    the metadata bounds lie inside the check's bounds AND the column
    *    has no nulls (a null fails the scan-path metric, and min/max
    *    stats say nothing about null positions otherwise);
    *  - anything else, stats-uncovered files, or bounds that straddle
    *    the limit: None — caller falls back to the scanning path.
    * Never guesses: a None here means "must scan", not "failed". */
  /** Hybrid evaluation of row-level checks on a [[ManifestTable]]: each
    * check is first offered to [[provableFromMetadata]] — a driver-side
    * fold over the manifest's zone-map lines, ZERO data files opened, no
    * Spark job — and only the unprovable remainder shares ONE fallback
    * scan. The `from_metadata` column records which path answered each
    * row; by the statsAgg soundness contract both paths produce the same
    * values on the same input, so an oracle can check whichever ran. At
    * 100 TB a healthy table's standing health report is a metadata read. */
  def hybridReport(spark: SparkSession, basePath: String,
      checks: Seq[RowCheck]): DataFrame = {
    import spark.implicits._
    require(checks.nonEmpty, "hybridReport needs at least one check")
    val tried = checks.map(c => c -> provableFromMetadata(spark, basePath, c))
    val (proved, toScan) = tried.partition(_._2.isDefined)
    val metaRows = proved.flatMap(_._2)
      .map(v => (v.name, v.metricValue, v.threshold,
        if (v.passed) 1L else 0L))
      .toDF("check_name", "metric_value", "threshold", "passed")
      .withColumn("from_metadata", lit(1L))
    val out =
      if (toScan.isEmpty) metaRows
      else metaRows.unionByName(
        report(Seq(rowChecks(ManifestTable.read(spark, basePath),
          toScan.map(_._1)))).withColumn("from_metadata", lit(0L)))
    out.orderBy(col("check_name"))
  }

  def provableFromMetadata(spark: SparkSession, basePath: String,
      check: RowCheck): Option[MetaVerdict] = check match {
    case MinRows(_, th) =>
      // any fully-stats-covered column proves the row count; pick one
      // deterministically whose stats statsAgg will accept (numeric
      // bounds, or all-null — string-stats columns are range-loose and
      // statsAgg refuses them)
      for {
        snap <- ManifestTable.currentSnapshot(spark, basePath)
        first <- snap.fileStats.values.headOption
        colName <- first.toSeq.sortBy(_._1).collectFirst {
          case (n, st) if st.bounds.nonEmpty || st.nulls == st.rows => n
        }
        agg <- ManifestTable.statsAgg(spark, basePath, colName)
      } yield MetaVerdict(check.name, agg.rows.toDouble, th,
        agg.rows.toDouble >= th)
    case c @ Completeness(colName, _, th) =>
      ManifestTable.statsAgg(spark, basePath, colName).map { agg =>
        val metric =
          if (agg.rows == 0L) 1.0
          else agg.nonNull.toDouble / agg.rows.toDouble
        MetaVerdict(c.name, metric, th, metric >= th)
      }
    case c: RowCheck =>
      val boundsOk: Option[(BigDecimal, BigDecimal) => Boolean] = c match {
        case InRange(_, lo, hi, _, _) =>
          Some((mn, mx) => mn >= BigDecimal(lo) && mx <= BigDecimal(hi))
        case NonNegative(_, _, _) =>
          Some((mn, _) => mn >= BigDecimal(0))
        case _ => None
      }
      for {
        prove <- boundsOk
        colName <- c.statColumn
        agg <- ManifestTable.statsAgg(spark, basePath, colName)
        (mn, mx) <- agg.bounds
        // bounds prove every NON-NULL value in range; any null fails
        // the scan metric, so only a fully non-null column is provable
        if agg.nonNull == agg.rows && prove(mn, mx)
      } yield MetaVerdict(c.name, 1.0, c.threshold, c.threshold <= 1.0)
  }
}
