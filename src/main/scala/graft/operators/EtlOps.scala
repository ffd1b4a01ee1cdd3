package graft.operators

import graft.core._
import graft.etl.MergeService
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ETL / dataflow operators — SURVEY.md §2.9 (E1–E5) and the keyed upsert
  * A12 (via [[graft.etl.MergeService]]).
  *
  * The reference's silver flatten collects the whole feed to the driver
  * (`silver_ingest_streamate_mock.py:46-86`) — an anti-pattern we replace
  * with distributed explode pipelines (SURVEY §3.2).
  */
object EtlOps extends QueryModule {

  /** E1: nested build → explode round-trip. Builds an array<struct> feed
    * per customer (collect_list) then flattens it back with explode and
    * re-aggregates — proving sum/count preservation, the E1 flatten
    * invariant (FIXTURES.md §1). Oracle is the direct aggregation. */
  private val e1 = QueryDef(
    "e1_flatten_explode",
    Some("""
      SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY o_custkey
      ORDER BY o_custkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(collect_list(struct($"o_orderkey", $"o_totalprice")).as("orders_nested"))
        .select($"o_custkey", explode($"orders_nested").as("o"))
        .groupBy($"o_custkey")
        .agg(
          count(lit(1)).as("n_orders"),
          H.dbl(sum(H.dec2($"o.o_totalprice", 14))).as("revenue"))
        .orderBy($"o_custkey")
    })

  /** E2: processing-time stamping with an injectable clock (fixed here for
    * determinism). Ref: `withColumn("processing_date", lit(..))`
    * `bronze_ingest_streamate_mock.py:36`. */
  private val e2 = QueryDef(
    "e2_processing_stamp",
    Some("""
      SELECT o_orderkey, DATE '2024-01-15' AS processing_date,
        TIMESTAMP '2024-01-15 12:00:00' AS processed_at
      FROM orders
      WHERE o_orderkey <= 100
      ORDER BY o_orderkey"""),
    (s, dir) => {
      import s.implicits._
      val clock = java.time.LocalDate.of(2024, 1, 15)
      T(s, dir, "orders")
        .filter($"o_orderkey" <= 100)
        .select(
          $"o_orderkey",
          lit(java.sql.Date.valueOf(clock)).as("processing_date"),
          lit(java.sql.Timestamp.valueOf(clock.atTime(12, 0))).as("processed_at"))
        .orderBy($"o_orderkey")
    })

  /** E3: schema alignment of heterogeneous batches —
    * `unionByName(allowMissingColumns = true)` null-fills the gaps.
    * Ref: pandas `reindex(columns=existing.columns)` `BronzeIngestUsers.py:71`. */
  private val e3 = QueryDef(
    "e3_schema_align_union",
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey <= 50
      UNION ALL
      SELECT o_orderkey, o_custkey, NULL AS o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey > 50 AND o_orderkey <= 100
      ORDER BY o_orderkey"""),
    (s, dir) => {
      import s.implicits._
      val orders = T(s, dir, "orders")
      val oldBatch = orders.filter($"o_orderkey" <= 50)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val newBatch = orders.filter($"o_orderkey" > 50 && $"o_orderkey" <= 100)
        .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
      oldBatch.unionByName(newBatch, allowMissingColumns = true)
        .orderBy($"o_orderkey")
    })

  /** E5: duplicate diagnostic — count of keys occurring more than once.
    * Ref: `duplicated(subset=['_id']).sum()` `BronzeIngestUsers.py:90-95`. */
  private val e5 = QueryDef(
    "e5_dup_diagnostic",
    Some("""
      SELECT COUNT(*) AS n_dup_keys,
        COALESCE(CAST(SUM(n - 1) AS BIGINT), 0) AS n_excess_rows
      FROM (SELECT l_orderkey, COUNT(*) AS n FROM lineitem
            GROUP BY l_orderkey HAVING COUNT(*) > 1)"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n"))
        .filter($"n" > 1)
        .agg(
          count(lit(1)).as("n_dup_keys"),
          coalesce(sum($"n" - 1), lit(0L)).as("n_excess_rows"))
    })

  /** A12: keyed upsert (merge) — update matched keys, insert new ones,
    * tag each row with its merge action. Delta isn't on the classpath, so
    * [[graft.etl.MergeService]] implements MERGE as a full-outer join —
    * the same plan Delta's low-shuffle merge degenerates to. */
  private val a12 = QueryDef(
    "a12_merge_upsert",
    Some("""
      WITH updates AS (
        SELECT l_orderkey AS o_orderkey,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS o_totalprice
        FROM lineitem WHERE l_orderkey % 7 = 0 GROUP BY 1
        UNION ALL
        SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 1000 = 0)
      SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
        CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
             WHEN u.o_orderkey IS NULL THEN 'unchanged'
             ELSE 'updated' END AS merge_action
      FROM orders b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
      ORDER BY o_orderkey"""),
    (s, dir) => {
      import s.implicits._
      val orders = T(s, dir, "orders")
      val updates = T(s, dir, "lineitem")
        .filter($"l_orderkey" % 7 === 0)
        .groupBy($"l_orderkey".as("o_orderkey"))
        .agg(H.dbl(sum(H.dec2($"l_extendedprice"))).as("o_totalprice"))
        .unionByName(
          orders.filter($"o_orderkey" % 1000 === 0)
            .select(($"o_orderkey" + 10000000L).as("o_orderkey"), $"o_totalprice"))
      MergeService
        .upsert(
          base = orders.select($"o_orderkey", $"o_totalprice"),
          updates = updates,
          keys = Seq("o_orderkey"))
        .orderBy($"o_orderkey")
    })

  /** A12 traceability: audit rows where an update DECREASED the tracked
    * value. Ref: trace record on earnings decrease
    * `ingestStreamateModelPerformance.py:96-115` (implemented numerically,
    * not the reference's lexicographic string compare — SURVEY §7.4.5). */
  private val a12audit = QueryDef(
    "a12_merge_audit",
    Some("""
      WITH updates AS (
        SELECT l_orderkey AS o_orderkey,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS new_price
        FROM lineitem WHERE l_orderkey % 7 = 0 GROUP BY 1)
      SELECT b.o_orderkey, b.o_totalprice AS old_value, u.new_price AS new_value
      FROM orders b INNER JOIN updates u ON b.o_orderkey = u.o_orderkey
      WHERE u.new_price < b.o_totalprice
      ORDER BY b.o_orderkey"""),
    (s, dir) => {
      import s.implicits._
      val updates = T(s, dir, "lineitem")
        .filter($"l_orderkey" % 7 === 0)
        .groupBy($"l_orderkey".as("o_orderkey"))
        .agg(H.dbl(sum(H.dec2($"l_extendedprice"))).as("new_price"))
      MergeService
        .audit(
          base = T(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
          updates = updates,
          keys = Seq("o_orderkey"),
          oldValue = "o_totalprice",
          newValue = "new_price")
        .orderBy($"o_orderkey")
    })

  override val defs: Seq[QueryDef] = Seq(e1, e2, e3, e5, a12, a12audit)
}
