package graft.operators

import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators — SURVEY.md §2.4 (A1–A13).
  *
  * Each reference aggregation pattern (Athena/Presto SQL templated by the
  * lambdas under `src/lambdas/earnings/`, see SURVEY §2.4 citations)
  * re-expressed over the driver testdata with a DuckDB oracle. Spark-first:
  * declarative groupBy/agg so Catalyst gets partial (map-side) aggregation
  * and whole-stage codegen for free; decimal money math per [[graft.core.H]].
  */
object AggOps extends QueryModule {

  /** A1+A3+F1: grouped multi-aggregate pricing summary (TPC-H Q1 shape).
    * Ref pattern: earnings sums per group, `queries/earnings_by_day.sql:1-11`. */
  private val a1 = QueryDef(
    "a1_pricing_summary",
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    (s, dir) => {
      import s.implicits._
      val price = H.dec2($"l_extendedprice")
      val disc = H.oneMinus($"l_discount")
      val tax = H.onePlus($"l_tax")
      T(s, dir, "lineitem")
        .filter(to_date($"l_shipdate") <= lit(java.sql.Date.valueOf("2000-12-01")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          H.dbl(sum($"l_quantity")).as("sum_qty"),
          H.dbl(sum(price)).as("sum_base_price"),
          H.dbl(sum(price * disc)).as("sum_disc_price"),
          H.dbl(sum(price * disc * tax)).as("sum_charge"),
          (H.dbl(sum($"l_quantity")) / count(lit(1))).as("avg_qty"),
          (H.dbl(sum(price)) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    })

  /** A2: group by computed calendar expressions (year/month rollup).
    * Ref: `GROUP BY nickname, YEAR(date), WEEK(date)` `README.md:48-50`. */
  private val a2 = QueryDef(
    "a2_calendar_group",
    Some("""
      SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY 1, 2
      ORDER BY o_year, o_month"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
        .agg(
          H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_year", $"o_month")
    })

  /** A3+A5: multi-aggregate with min/max pick-any per group.
    * Ref: sales+time `detailedRanking.py:96-97`; MAX(us.picture) `models_earning_distribution.py:96-98`. */
  private val a3 = QueryDef(
    "a3_multi_agg_minmax",
    Some("""
      SELECT s_nationkey,
        CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
        MIN(s_acctbal) AS min_bal,
        MAX(s_acctbal) AS max_bal,
        MAX(s_name) AS any_name,
        COUNT(*) AS n
      FROM supplier
      GROUP BY s_nationkey
      ORDER BY s_nationkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "supplier")
        .groupBy($"s_nationkey")
        .agg(
          H.dbl(sum(H.dec2($"s_acctbal"))).as("total_bal"),
          min($"s_acctbal").as("min_bal"),
          max($"s_acctbal").as("max_bal"),
          max($"s_name").as("any_name"),
          count(lit(1)).as("n"))
        .orderBy($"s_nationkey")
    })

  /** A4: AVG (computed exactly as decimal-sum / count — see H policy).
    * Ref: `AVG(total_earnings)` `needle.py:134`. */
  private val a4 = QueryDef(
    "a4_avg_by_segment",
    Some("""
      SELECT c_mktsegment,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal,
        COUNT(*) AS n_customers
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(
          (H.dbl(sum(H.dec2($"c_acctbal"))) / count(lit(1))).as("avg_acctbal"),
          count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    })

  /** A6: exact COUNT(DISTINCT expr) incl. a computed (date-cast) argument.
    * Ref: `COUNT(DISTINCT CAST(combined.date AS DATE))` `earningsByDayOfWeek.py:124`. */
  private val a6 = QueryDef(
    "a6_count_distinct",
    Some("""
      SELECT o_orderstatus,
        COUNT(DISTINCT o_custkey) AS n_customers,
        COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          countDistinct($"o_custkey").as("n_customers"),
          countDistinct(to_date($"o_orderdate")).as("n_days"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderstatus")
    })

  /** A8: global (ungrouped) aggregate.
    * Ref: `SELECT SUM(avg_per_day) FROM averages` `earningsByDayOfWeek.py:129-132`. */
  private val a8 = QueryDef(
    "a8_global_agg",
    Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS total_revenue,
        COUNT(*) AS n_rows
      FROM lineitem"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .agg(
          H.dbl(sum(H.dec2($"l_extendedprice") * H.oneMinus($"l_discount"))).as("total_revenue"),
          count(lit(1)).as("n_rows"))
    })

  /** A9+A10: scalar-subquery denominator → percentage-of-total per group.
    * Ref: inline `(SELECT SUM(..) ..)` `earnings_by_day_of_week.sql:11-16`.
    * Spark-first: the scalar is a 1-row aggregate broadcast via crossJoin —
    * no driver round-trip, stays one logical plan. */
  private val a9 = QueryDef(
    "a9_pct_of_total",
    Some("""
      SELECT c_mktsegment,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS seg_bal,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
          / (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) FROM customer) * 100 AS pct
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    (s, dir) => {
      import s.implicits._
      val c = T(s, dir, "customer")
      val total = c.agg(H.dbl(sum(H.dec2($"c_acctbal"))).as("total_bal"))
      c.groupBy($"c_mktsegment")
        .agg(H.dbl(sum(H.dec2($"c_acctbal"))).as("seg_bal"))
        .crossJoin(broadcast(total))
        .select(
          $"c_mktsegment",
          $"seg_bal",
          ($"seg_bal" / $"total_bal" * 100).as("pct"))
        .orderBy($"c_mktsegment")
    })

  /** A7+P9: null-safe SUM over a null-extending join + HAVING-style filter.
    * Ref: `SUM(COALESCE(CAST(x AS DOUBLE),0))` `averageProfitability.py:81-82`;
    * post-agg row filter `detailedRanking.py:220-221`. */
  private val a7 = QueryDef(
    "a7_nullsafe_sum_having",
    Some("""
      SELECT c.c_custkey, c.c_name,
        CAST(SUM(COALESCE(CAST(o.o_totalprice AS DECIMAL(14,2)), 0)) AS DOUBLE) AS total_spent,
        COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey, c.c_name
      HAVING CAST(SUM(COALESCE(CAST(o.o_totalprice AS DECIMAL(14,2)), 0)) AS DOUBLE) > 500000
      ORDER BY c.c_custkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "customer")
        .join(T(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey", $"c_name")
        .agg(
          H.dbl(sum(coalesce(H.dec2($"o_totalprice", 14), lit(0)))).as("total_spent"),
          count($"o_orderkey").as("n_orders"))
        .filter($"total_spent" > 500000)
        .orderBy($"c_custkey")
    })

  /** A11: exact deduplication (DISTINCT over a column subset).
    * Ref: `dropDuplicates(['studioId','date'])` `bronze_ingest_streamate_mock.py:44-45`. */
  private val a11 = QueryDef(
    "a11_dedup_exact",
    Some("""
      SELECT DISTINCT l_suppkey, l_returnflag
      FROM lineitem
      ORDER BY l_suppkey, l_returnflag"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .select($"l_suppkey", $"l_returnflag")
        .distinct()
        .orderBy($"l_suppkey", $"l_returnflag")
    })

  /** A13 (beyond-parity convenience): ROLLUP calendar hierarchy. */
  private val a13 = QueryDef(
    "a13_rollup",
    Some("""
      SELECT year(o_orderdate) AS o_year, o_orderstatus,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM orders
      GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
      ORDER BY o_year NULLS FIRST, o_orderstatus NULLS FIRST"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .rollup(year($"o_orderdate").as("o_year"), $"o_orderstatus")
        .agg(
          H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy($"o_year".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
    })

  /** Beyond-parity: exact interpolated percentiles (Presto has
    * approx_percentile; DuckDB's quantile_cont uses the same linear
    * interpolation as Spark's exact `percentile`). */
  private val a14 = QueryDef(
    "a14_percentiles",
    Some("""
      SELECT o_orderstatus,
        quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.9) AS p90,
        COUNT(*) AS n
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    })

  /** Beyond-parity: HLL approximate distinct — the sketch the exact A6
    * trades against at 100 TB (no oracle: different sketch impls; the
    * spec asserts a relative-error bound vs exact).
    *
    * Two-level aggregate instead of `agg(approx_count_distinct,
    * countDistinct)`: mixing a distinct aggregate with a non-distinct
    * one makes Spark carry the non-distinct PARTIAL BUFFER through the
    * per-(group, distinct-key) first aggregate — one ~3 KB HLL register
    * array (rsd 0.02 ⇒ 2^12 registers) PER DISTINCT ORDERKEY, ~GBs of
    * buffers churned and shuffled for a 3-row answer (measured 3.6 s at
    * sf0.1). Deduping (flag, orderkey) first and aggregating the keys
    * leaves 3 HLL buffers total. Values are IDENTICAL by construction:
    * HLL register state is a per-register max over hashed inputs, so
    * inserting each distinct key once yields the same registers as
    * inserting every duplicate, and `count(key)` over the deduped pairs
    * IS `countDistinct(key)` (both skip nulls). */
  private val a15 = QueryDef(
    "a15_approx_count_distinct",
    None,
    (s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .select($"l_returnflag", $"l_orderkey")
        .distinct()
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
          count($"l_orderkey").as("exact_orders"))
        .orderBy($"l_returnflag")
    })

  /** A13 sibling: CUBE over two dimensions (all grouping-set combos). */
  private val a16 = QueryDef(
    "a16_cube",
    Some("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(
          H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    })

  /** Skew-salted two-phase SUM as a declared query: identical result to
    * the plain grouped sum (the oracle), with the hot key spread over 16
    * partial-aggregate buckets first — the rewrite for group skew AQE
    * can't fix ([[Salting.saltedSum]]). Values are integer-valued
    * doubles, so the re-associated addition stays exact (< 2^53). */
  private val a17 = QueryDef(
    "a17_salted_sum",
    Some("""
      SELECT l_returnflag, SUM(l_quantity) AS sum_l_quantity
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
    (s, dir) => {
      import s.implicits._
      Salting.saltedSum(T(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_quantity", saltBy = "l_orderkey", buckets = 16)
        .orderBy($"l_returnflag")
    })

  /** Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    * year totals, status totals, and the grand total in ONE pass — the
    * dashboard "three aggregation grains, one scan" shape. `grouping()`
    * flags disambiguate a NULL group key from a subtotal row, the
    * standard SQL marker both engines implement. One Expand + one
    * aggregate — at 100 TB this replaces three scans with one, and the
    * Expand factor is the set count (3), not the key cardinality. */
  private val a18 = QueryDef(
    "a18_grouping_sets",
    Some("""
      SELECT year(o_orderdate) AS o_year, o_orderstatus,
        CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_year,
        CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderstatus), ())
      ORDER BY o_year NULLS FIRST, o_orderstatus NULLS FIRST"""),
    (s, dir) => {
      import s.implicits._
      // the grouping-set exprs and the grouping cols must be the SAME
      // expression (an alias wrapper breaks the match and nulls the
      // key) — alias by rename after the aggregate instead
      T(s, dir, "orders")
        .groupingSets(
          Seq(Seq(year($"o_orderdate")), Seq($"o_orderstatus"), Seq.empty),
          year($"o_orderdate"), $"o_orderstatus")
        .agg(
          grouping(year($"o_orderdate")).cast("long").as("g_year"),
          grouping($"o_orderstatus").cast("long").as("g_status"),
          H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"),
          count(lit(1)).as("n"))
        .withColumnRenamed("year(o_orderdate)", "o_year")
        .orderBy($"o_year".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
    })

  override val defs: Seq[QueryDef] =
    Seq(a1, a2, a3, a4, a6, a7, a8, a9, a11, a13, a14, a15, a16, a17, a18)
}
