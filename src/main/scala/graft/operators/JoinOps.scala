package graft.operators

import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join operators — SURVEY.md §2.3 (J1–J8, plus semi/anti used implicitly
  * by the reference's upsert path).
  *
  * Scale notes (100 TB): dimension sides (nation/region/literal dims) are
  * broadcast explicitly so the fact side never shuffles for them; the
  * OR-disjunction join (J2) is decomposed into a UNION of two equi-joins
  * with dedup instead of a BroadcastNestedLoopJoin when the dim is large —
  * here the dim is 25 rows, so broadcast is correct and we keep it.
  */
object JoinOps extends QueryModule {

  import org.apache.spark.sql.DataFrame

  /** Scale-path rewrite of an OR-disjunction equi-join (J2): UNION of the
    * two equi-joins, deduplicated on the (left row, right row) PAIR — each
    * branch is a shuffled hash/sort-merge join, so it works when the dim
    * side is too big to broadcast (where BroadcastNestedLoopJoin would OOM
    * or go quadratic). Semantics match `l JOIN r ON l[k]=r[a] OR
    * l[k]=r[b]` exactly: a pair satisfying BOTH branches appears once; a
    * left row matching two DIFFERENT right rows keeps both matches
    * (the earlier dedup-on-left-id collapsed those into one
    * nondeterministic survivor). `leftId`/`rightId` must each identify
    * rows of their side. */
  def orJoinDecomposed(left: DataFrame, right: DataFrame, leftKey: String,
      rightKeyA: String, rightKeyB: String, leftId: Seq[String],
      rightId: Seq[String]): DataFrame = {
    val a = left.join(right, left(leftKey) === right(rightKeyA))
    val b = left.join(right, left(leftKey) === right(rightKeyB))
    a.unionByName(b).dropDuplicates(leftId ++ rightId)
  }

  /** J1: inner equi-join fact↔dim, dim broadcast.
    * Ref: `INNER JOIN ... ON ssmp._id = us._id` `earnings.py:75`. */
  private val j1 = QueryDef(
    "j1_inner_equi_join",
    Some("""
      SELECT c.c_mktsegment,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders o
      INNER JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .join(broadcast(T(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"c_mktsegment")
    })

  /** J2: OR-disjunction equi-join (row matches dim on either of two keys).
    * Ref: `ON (eap.emailaddress = us.streamateuser OR eap.emailaddress =
    * us.jasminuser)` `queries/earnings_by_day.sql:4-5`. Small dim ⇒
    * broadcast nested-loop is the right plan; the scale path (union of two
    * equi-joins + dedup) ships as [[graft.operators.JoinOps.orJoinDecomposed]]. */
  private val j2 = QueryDef(
    "j2_or_disjunction_join",
    Some("""
      SELECT n.n_name, COUNT(*) AS n_supp,
        CAST(SUM(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      FROM supplier s
      INNER JOIN nation n
        ON s.s_nationkey = n.n_nationkey OR (s.s_suppkey % 25) = n.n_nationkey
      GROUP BY n.n_name
      ORDER BY n.n_name"""),
    (s, dir) => {
      import s.implicits._
      val sup = T(s, dir, "supplier")
      val nat = broadcast(T(s, dir, "nation"))
      sup.join(nat, $"s_nationkey" === $"n_nationkey" || ($"s_suppkey" % 25) === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          count(lit(1)).as("n_supp"),
          H.dbl(sum(H.dec2($"s_acctbal"))).as("total_bal"))
        .orderBy($"n_name")
    })

  /** J2 at 100 TB: when the right side is too big to broadcast, the OR
    * join must NOT plan as a BroadcastNestedLoopJoin — this declares the
    * [[orJoinDecomposed]] rewrite (union of two SHUFFLED equi-joins,
    * pair-dedup'd) against a fact-sized right side, giving the scale
    * rewrite oracle coverage. The `shuffle_hash` hint pins the branch
    * strategy regardless of size estimates; JoinOpsSpec asserts the
    * executed plan is BNLJ-free. */
  private val j2Scale = QueryDef(
    "j2_scale_or_join",
    Some("""
      SELECT c.c_mktsegment, COUNT(*) AS n_pairs,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
      FROM customer c
      JOIN orders o
        ON c.c_custkey = o.o_custkey OR c.c_custkey = (o.o_orderkey % 1500)
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment"""),
    (s, dir) => {
      import s.implicits._
      val cust = T(s, dir, "customer")
      val ord = T(s, dir, "orders")
        .withColumn("o_alt_key", $"o_orderkey" % 1500)
      orJoinDecomposed(cust, ord.hint("shuffle_hash"),
        leftKey = "c_custkey", rightKeyA = "o_custkey", rightKeyB = "o_alt_key",
        leftId = Seq("c_custkey"), rightId = Seq("o_orderkey"))
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_pairs"),
          H.dbl(sum(H.dec2($"o_totalprice", 14))).as("total_price"))
        .orderBy($"c_mktsegment")
    })

  /** J3: left outer join (null-extending enrich).
    * Ref: `performer_df.join(user_df, ..., "left_outer")`
    * `silver_ingest_streamate_mock.py:89-90`. */
  private val j3 = QueryDef(
    "j3_left_outer_join",
    Some("""
      SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_orderstatus
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
      ORDER BY c.c_custkey, o.o_orderkey NULLS FIRST"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "customer")
        .join(
          T(s, dir, "orders"),
          $"c_custkey" === $"o_custkey" && $"o_orderstatus" === "F",
          "left")
        .select($"c_custkey", $"c_mktsegment", $"o_orderkey", $"o_orderstatus")
        .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
    })

  /** J4+U3: LEFT JOIN onto an inline literal dimension (VALUES), with
    * zero-fill. Ref: `BASE (3 literal rows) LEFT JOIN earnings`
    * `profitAvg.py:74-89`; literal rows `averageProfitability.py:72-78`. */
  private val j4 = QueryDef(
    "j4_left_join_literal_dim",
    Some("""
      WITH base(segment) AS (VALUES ('BUILDING'), ('MACHINERY'), ('NO_SUCH_SEGMENT')),
      agg AS (
        SELECT c_mktsegment AS segment,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
          COUNT(*) AS n
        FROM customer GROUP BY 1)
      SELECT b.segment, COALESCE(a.total_bal, 0) AS total_bal, COALESCE(a.n, 0) AS n
      FROM base b LEFT JOIN agg a ON b.segment = a.segment
      ORDER BY b.segment"""),
    (s, dir) => {
      import s.implicits._
      val base = Seq("BUILDING", "MACHINERY", "NO_SUCH_SEGMENT").toDF("segment")
      val agg = T(s, dir, "customer")
        .groupBy($"c_mktsegment".as("segment"))
        .agg(
          H.dbl(sum(H.dec2($"c_acctbal"))).as("total_bal"),
          count(lit(1)).as("n"))
      base.join(agg, Seq("segment"), "left")
        .select(
          $"segment",
          coalesce($"total_bal", lit(0).cast(DoubleType)).as("total_bal"),
          coalesce($"n", lit(0L)).as("n"))
        .orderBy($"segment")
    })

  /** J5: INNER join onto an inline literal dimension — the reference
    * maps status codes through a literal VALUES table and keeps only
    * mapped rows (`averageProfitability.py:72-78` inner flavor; J4 is
    * the left/zero-filled flavor). Literal dim ⇒ broadcast. */
  private val j5 = QueryDef(
    "j5_inner_join_literal_dim",
    Some("""
      WITH dim(code, label) AS (VALUES ('F', 'Fulfilled'), ('O', 'Open'))
      SELECT d.label,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders o
      INNER JOIN dim d ON o.o_orderstatus = d.code
      GROUP BY d.label
      ORDER BY d.label"""),
    (s, dir) => {
      import s.implicits._
      val dim = Seq(("F", "Fulfilled"), ("O", "Open")).toDF("code", "label")
      T(s, dir, "orders")
        .join(broadcast(dim), $"o_orderstatus" === $"code")
        .groupBy($"label")
        .agg(
          H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"label")
    })

  /** Skew-salted fact⟶dim equi-join as a declared query: identical
    * result to the plain join (the oracle), with the fact side salted
    * and the dim replicated 16× so one hot key spreads over 16 tasks
    * ([[Salting.saltedJoin]] — the rewrite for join skew past what AQE
    * splits). */
  private val j11 = QueryDef(
    "j11_salted_join",
    Some("""
      SELECT c.c_mktsegment,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment"""),
    (s, dir) => {
      import s.implicits._
      val fact = T(s, dir, "orders").withColumnRenamed("o_custkey", "custkey")
      val dim = T(s, dir, "customer").withColumnRenamed("c_custkey", "custkey")
      Salting.saltedJoin(fact, dim, key = "custkey", saltBy = "o_orderkey")
        .groupBy($"c_mktsegment")
        .agg(
          H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"c_mktsegment")
    })

  /** J6: FULL OUTER join of two per-key aggregates + COALESCE merge.
    * Ref: `jasmin_data jd FULL OUTER JOIN streamate_data sd ON jd._id =
    * sd._id` `detailedRanking.py:136-137` (+ coalesce `:123-135`). */
  private val j6 = QueryDef(
    "j6_full_outer_join",
    Some("""
      WITH f AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS f_rev
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
      o AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS o_rev
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
      SELECT COALESCE(f.o_custkey, o.o_custkey) AS custkey,
        COALESCE(f.f_rev, 0) AS f_rev,
        COALESCE(o.o_rev, 0) AS o_rev,
        COALESCE(f.f_rev, 0) + COALESCE(o.o_rev, 0) AS total_rev
      FROM f FULL OUTER JOIN o ON f.o_custkey = o.o_custkey
      ORDER BY custkey"""),
    (s, dir) => {
      import s.implicits._
      val orders = T(s, dir, "orders")
      def side(status: String, key: String, alias: String) = orders
        .filter($"o_orderstatus" === status)
        .groupBy($"o_custkey")
        .agg(H.dbl(sum(H.dec2($"o_totalprice", 14))).as(alias))
        .withColumnRenamed("o_custkey", key)
      val f = side("F", "f_key", "f_rev")
      val o = side("O", "o_key", "o_rev")
      f.join(o, $"f_key" === $"o_key", "full_outer")
        .select(
          coalesce($"f_key", $"o_key").as("custkey"),
          coalesce($"f_rev", lit(0).cast(DoubleType)).as("f_rev"),
          coalesce($"o_rev", lit(0).cast(DoubleType)).as("o_rev"),
          (coalesce($"f_rev", lit(0).cast(DoubleType)) +
            coalesce($"o_rev", lit(0).cast(DoubleType))).as("total_rev"))
        .orderBy($"custkey")
    })

  /** J7: left join whose WHERE on the right side degrades it to inner —
    * replicated literally. Ref: `needle.py:96-102`. */
  private val j7 = QueryDef(
    "j7_left_join_right_filtered",
    Some("""
      SELECT c.c_custkey,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      WHERE CAST(o.o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
      GROUP BY c.c_custkey
      ORDER BY c.c_custkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "customer")
        .join(T(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
        .filter(to_date($"o_orderdate").between("1996-01-01", "1997-12-31"))
        .groupBy($"c_custkey")
        .agg(H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"))
        .orderBy($"c_custkey")
    })

  /** J8: two left joins fanning out from one base (both "platforms" onto
    * the category spine). Ref: `totalProfitReport.py:162-181`. */
  private val j8 = QueryDef(
    "j8_chained_left_joins",
    Some("""
      WITH cust AS (
        SELECT c_nationkey, COUNT(*) AS n_cust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS cust_bal
        FROM customer GROUP BY c_nationkey),
      supp AS (
        SELECT s_nationkey, COUNT(*) AS n_supp,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS supp_bal
        FROM supplier GROUP BY s_nationkey)
      SELECT n.n_nationkey, n.n_name,
        COALESCE(c.n_cust, 0) AS n_cust, COALESCE(c.cust_bal, 0) AS cust_bal,
        COALESCE(s.n_supp, 0) AS n_supp, COALESCE(s.supp_bal, 0) AS supp_bal
      FROM nation n
      LEFT JOIN cust c ON n.n_nationkey = c.c_nationkey
      LEFT JOIN supp s ON n.n_nationkey = s.s_nationkey
      ORDER BY n.n_nationkey"""),
    (s, dir) => {
      import s.implicits._
      val cust = T(s, dir, "customer")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_cust"), H.dbl(sum(H.dec2($"c_acctbal"))).as("cust_bal"))
      val supp = T(s, dir, "supplier")
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_supp"), H.dbl(sum(H.dec2($"s_acctbal"))).as("supp_bal"))
      T(s, dir, "nation")
        .join(cust, $"n_nationkey" === $"c_nationkey", "left")
        .join(supp, $"n_nationkey" === $"s_nationkey", "left")
        .select(
          $"n_nationkey", $"n_name",
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"cust_bal", lit(0).cast(DoubleType)).as("cust_bal"),
          coalesce($"n_supp", lit(0L)).as("n_supp"),
          coalesce($"supp_bal", lit(0).cast(DoubleType)).as("supp_bal"))
        .orderBy($"n_nationkey")
    })

  /** Semi join (EXISTS) — the "record already present" probe of the
    * reference's upsert (`ingestStreamateModelPerformance.py:78-87`),
    * expressed relationally: customers having ≥1 'P' order. */
  private val jSemi = QueryDef(
    "j9_semi_join_exists",
    Some("""
      SELECT c.c_custkey, c.c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      ORDER BY c.c_custkey"""),
    (s, dir) => {
      import s.implicits._
      val p = T(s, dir, "orders").filter($"o_orderstatus" === "P")
      T(s, dir, "customer")
        .join(p, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    })

  /** Anti join (NOT EXISTS) — the upsert insert path ("no existing record",
    * `ingestStreamateModelPerformance.py:161-169`). */
  private val jAnti = QueryDef(
    "j10_anti_join_not_exists",
    Some("""
      SELECT c.c_custkey, c.c_name, c.c_mktsegment
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      ORDER BY c.c_custkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "customer")
        .join(
          T(s, dir, "orders").filter($"o_orderstatus" === "P"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    })

  override val defs: Seq[QueryDef] =
    Seq(j1, j2, j2Scale, j3, j4, j5, j6, j7, j8, j11, jSemi, jAnti)
}
