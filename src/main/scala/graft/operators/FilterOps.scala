package graft.operators

import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection / filter / sort / set operators — SURVEY.md §2.2, §2.6, §2.7.
  *
  * All predicates are built as typed `Column` expressions (never SQL string
  * concatenation — the reference's manual quote-escaping `earnings.py:56-63`
  * becomes injection-safe by construction) so Catalyst pushes them into the
  * parquet scan (`PushedFilters` in explain).
  */
object FilterOps extends QueryModule {

  /** P1+P2+F1: projection with aliases, computed column, literal column.
    * Ref: `SELECT eap.date, SUM(..) AS totalAmount` + `'Streamate' AS
    * source` `queries/earnings_by_day.sql:1-2`, `earnings.py:72`. */
  private val p1 = QueryDef(
    "p1_projection_computed",
    Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DOUBLE) AS revenue,
        'lineitem' AS src
      FROM lineitem
      WHERE l_orderkey <= 1000
      ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .filter($"l_orderkey" <= 1000)
        .select(
          $"l_orderkey", $"l_linenumber",
          H.dbl(H.dec2($"l_extendedprice") * H.oneMinus($"l_discount")).as("revenue"),
          lit("lineitem").as("src"))
        .orderBy($"l_orderkey", $"l_linenumber")
    })

  /** P3+F2: date-equality filter with a DATE literal.
    * Ref: `WHERE date = DATE '2024-07-17'` `README.md:8`. */
  private val p3 = QueryDef(
    "p3_date_eq_filter",
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus
      FROM orders
      WHERE CAST(o_orderdate AS DATE) = DATE '1996-06-15'
      ORDER BY o_orderkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .filter(to_date($"o_orderdate") === lit(java.sql.Date.valueOf("1996-06-15")))
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
        .orderBy($"o_orderkey")
    })

  /** P4: BETWEEN date-range filter feeding a grouped sum.
    * Ref: `CAST(eap.date AS DATE) BETWEEN DATE(..) AND DATE(..)`
    * `queries/earnings_by_day.sql:6`. */
  private val p4 = QueryDef(
    "p4_date_between",
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .filter(to_date($"l_shipdate").between("1996-01-01", "1996-12-31"))
        .groupBy($"l_returnflag")
        .agg(H.dbl(sum(H.dec2($"l_extendedprice"))).as("revenue"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    })

  /** P5+F3: calendar-bucket filter (WEEK/MONTH/YEAR equality).
    * Ref: `WEEK(date)=WEEK(..) AND YEAR(date)=YEAR(..)` `README.md:16`. */
  private val p5 = QueryDef(
    "p5_calendar_bucket_filter",
    Some("""
      SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      FROM orders
      WHERE year(o_orderdate) = 1997 AND week(o_orderdate) = 25
      GROUP BY 1
      ORDER BY order_date"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .filter(year($"o_orderdate") === 1997 && weekofyear($"o_orderdate") === 25)
        .groupBy(to_date($"o_orderdate").as("order_date"))
        .agg(count(lit(1)).as("n"), H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"))
        .orderBy($"order_date")
    })

  /** P6: dynamic OR-of-equalities ("locations") predicate built by folding
    * typed Columns. Ref: `filters_main` loop `earnings.py:51-66`. */
  private val p6 = QueryDef(
    "p6_dynamic_or_filter",
    Some("""
      SELECT n.n_name, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      FROM customer c
      INNER JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE (n.n_name = 'NATION_3' OR n.n_name = 'NATION_7' OR n.n_name = 'NATION_21')
      GROUP BY n.n_name
      ORDER BY n.n_name"""),
    (s, dir) => {
      import s.implicits._
      val wanted = Seq("NATION_3", "NATION_7", "NATION_21")
      // Fold the request's location list into one Column predicate — the
      // injection-safe replacement for the reference's f-string WHERE.
      val pred = wanted.map(l => $"n_name" === l).reduce(_ || _)
      T(s, dir, "customer")
        .join(broadcast(T(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .filter(pred)
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_cust"), H.dbl(sum(H.dec2($"c_acctbal"))).as("total_bal"))
        .orderBy($"n_name")
    })

  /** P7: single-key point filter (user filter).
    * Ref: `us._id = '{user}'` `earnings.py:62-64`. */
  private val p7 = QueryDef(
    "p7_point_lookup",
    Some("""
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date, o.o_totalprice
      FROM orders o
      WHERE o.o_custkey = 42
      ORDER BY o.o_orderkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .filter($"o_custkey" === 42)
        .select($"o_orderkey", to_date($"o_orderdate").as("order_date"), $"o_totalprice")
        .orderBy($"o_orderkey")
    })

  /** P8+U1+U2: platform dispatch — UNION ALL of two branch tables then
    * aggregate. Ref: `earnings.py:93-114` (both-platforms UNION shape). */
  private val p8 = QueryDef(
    "p8_union_dispatch",
    Some("""
      WITH combined AS (
        SELECT o_custkey, o_totalprice, 'FINISHED' AS platform
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey, o_totalprice, 'OPEN' AS platform
        FROM orders WHERE o_orderstatus = 'O')
      SELECT platform,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM combined
      GROUP BY platform
      ORDER BY platform"""),
    (s, dir) => {
      import s.implicits._
      val orders = T(s, dir, "orders")
      def branch(status: String, label: String) = orders
        .filter($"o_orderstatus" === status)
        .select($"o_custkey", $"o_totalprice", lit(label).as("platform"))
      branch("F", "FINISHED").unionByName(branch("O", "OPEN"))
        .groupBy($"platform")
        .agg(H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"), count(lit(1)).as("n"))
        .orderBy($"platform")
    })

  /** O2+F8: ORDER BY CASE — custom category sort order.
    * Ref: Spanish weekday order `earningsByDayOfWeek.py:153-162`. */
  private val o2 = QueryDef(
    "o2_order_by_case",
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY CASE o_orderpriority
        WHEN '5-LOW' THEN 1 WHEN '4-NOT SPECIFIED' THEN 2 WHEN '3-MEDIUM' THEN 3
        WHEN '2-HIGH' THEN 4 WHEN '1-URGENT' THEN 5 ELSE 6 END"""),
    (s, dir) => {
      import s.implicits._
      val rank = when($"o_orderpriority" === "5-LOW", 1)
        .when($"o_orderpriority" === "4-NOT SPECIFIED", 2)
        .when($"o_orderpriority" === "3-MEDIUM", 3)
        .when($"o_orderpriority" === "2-HIGH", 4)
        .when($"o_orderpriority" === "1-URGENT", 5)
        .otherwise(6)
      T(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(rank)
    })

  /** O3+O4: multi-key sort with dynamic direction (desc primary, asc tiebreak).
    * Ref: `ORDER BY total_sales DESC, artisticname ASC` `detailedRanking.py:138`. */
  private val o4 = QueryDef(
    "o4_multi_key_sort",
    Some("""
      SELECT p_partkey, p_brand, p_retailprice
      FROM part
      WHERE p_size >= 40
      ORDER BY p_retailprice DESC, p_partkey ASC"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "part")
        .filter($"p_size" >= 40)
        .select($"p_partkey", $"p_brand", $"p_retailprice")
        .orderBy($"p_retailprice".desc, $"p_partkey".asc)
    })

  /** O3: sort direction chosen by a RUNTIME string parameter — the
    * reference threads the request's "ASC"/"DESC" token into its SQL
    * (`detailedRanking.py` order param); here it maps to a Column sort
    * with a fixed asc tiebreak for determinism, rejecting anything
    * else (no string ever reaches a SQL text). */
  def dynamicSort(df: org.apache.spark.sql.DataFrame, key: String,
      dir: String, tieBreak: String): org.apache.spark.sql.DataFrame = {
    val primary = dir.trim.toLowerCase match {
      case "asc" => col(key).asc
      case "desc" => col(key).desc
      case other =>
        throw new IllegalArgumentException(s"sort dir must be asc|desc, got: $other")
    }
    df.orderBy(primary, col(tieBreak).asc)
  }

  private val o3 = QueryDef(
    "o3_dynamic_sort",
    Some("""
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      ORDER BY s_acctbal DESC, s_suppkey ASC
      LIMIT 20"""),
    (s, dir) => {
      import s.implicits._
      dynamicSort(
        T(s, dir, "supplier").select($"s_suppkey", $"s_name", $"s_acctbal"),
        key = "s_acctbal", dir = "desc", tieBreak = "s_suppkey")
        .limit(20)
    })

  /** O5: pagination — ORDER BY + OFFSET/LIMIT pushed into the engine
    * (the reference slices after collect, `detailedRanking.py:223-236`). */
  private val o5 = QueryDef(
    "o5_pagination",
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      ORDER BY c_acctbal DESC, c_custkey ASC
      LIMIT 10 OFFSET 20"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_acctbal".desc, $"c_custkey".asc)
        .offset(20)
        .limit(10)
    })

  /** O6: top-K via sort+limit.
    * Ref: top-5 cutoff `models_earning_distribution.py:119-122`. */
  private val o6 = QueryDef(
    "o6_top_k",
    Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 5"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(5)
    })

  /** O7 (beyond parity): KEYSET pagination — "page after cursor" via a
    * row-value seek predicate instead of OFFSET. Offset pagination
    * (o5, matching the reference) sorts-and-skips O(offset) rows per
    * page; the seek predicate prunes everything before the cursor AT THE
    * SCAN (PushedFilters carries the acctbal bound), so page 1000 costs
    * the same as page 1 — the only pagination that survives a 100 TB
    * table. Cursor = the (c_acctbal, c_custkey) of the previous page's
    * last row; the strict lexicographic `<` mirrors the DESC/ASC order. */
  def keysetPage(customers: org.apache.spark.sql.DataFrame,
      lastBal: Double, lastKey: Long, pageSize: Int): org.apache.spark.sql.DataFrame =
    customers
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .filter(col("c_acctbal") < lastBal ||
        (col("c_acctbal") === lastBal && col("c_custkey") > lastKey))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .limit(pageSize)

  private val o7 = QueryDef(
    "o7_keyset_pagination",
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE c_acctbal < 9000.0
         OR (c_acctbal = 9000.0 AND c_custkey > 42)
      ORDER BY c_acctbal DESC, c_custkey ASC
      LIMIT 10"""),
    (s, dir) => keysetPage(T(s, dir, "customer"),
      lastBal = 9000.0, lastKey = 42L, pageSize = 10))

  /** F8: CASE WHEN value-mapping into buckets, grouped.
    * Ref: DOW→Spanish names `earnings_by_day_of_week.sql:1-9`. */
  private val f8 = QueryDef(
    "f8_case_when_bucketing",
    Some("""
      SELECT CASE
          WHEN o_totalprice < 100000 THEN 'small'
          WHEN o_totalprice < 300000 THEN 'medium'
          ELSE 'large' END AS bucket,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY 1
      ORDER BY bucket"""),
    (s, dir) => {
      import s.implicits._
      val bucket = when($"o_totalprice" < 100000, "small")
        .when($"o_totalprice" < 300000, "medium")
        .otherwise("large")
        .as("bucket")
      T(s, dir, "orders")
        .groupBy(bucket)
        .agg(count(lit(1)).as("n"), H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"))
        .orderBy($"bucket")
    })

  /** F-family string functions (upper/substring/concat/split_part/
    * replace/lpad) — 1-based substring semantics in both engines. */
  private val f16 = QueryDef(
    "f16_string_funcs",
    Some("""
      SELECT c_custkey,
        upper(c_mktsegment) AS seg_upper,
        substring(c_name, 1, 9) AS name_prefix,
        split_part(c_name, '#', 2) AS name_num,
        concat(c_mktsegment, '|', c_name) AS tagged,
        replace(c_name, 'Customer', 'C') AS short_name,
        lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
        length(c_name) AS name_len
      FROM customer
      WHERE c_custkey <= 200
      ORDER BY c_custkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "customer")
        .filter($"c_custkey" <= 200)
        .select(
          $"c_custkey",
          upper($"c_mktsegment").as("seg_upper"),
          substring($"c_name", 1, 9).as("name_prefix"),
          split_part($"c_name", lit("#"), lit(2)).as("name_num"),
          concat($"c_mktsegment", lit("|"), $"c_name").as("tagged"),
          regexp_replace($"c_name", "Customer", "C").as("short_name"),
          lpad($"c_custkey".cast("string"), 8, "0").as("padded_key"),
          length($"c_name").cast("long").as("name_len"))
        .orderBy($"c_custkey")
    })

  override val defs: Seq[QueryDef] =
    Seq(p1, p3, p4, p5, p6, p7, p8, o2, o3, o4, o5, o6, o7, f8, f16)
}
