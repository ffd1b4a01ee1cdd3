package graft.operators

import graft.core._
import graft.etl.DataQuality
import graft.etl.DataQuality._

/** Declared data-quality validation: the [[graft.etl.DataQuality]] check
  * compiler run as an oracle-checked query — the batch-acceptance gate /
  * table health report of a lakehouse ingest, asserted value-exact
  * against DuckDB (the 0/1-indicator aggregates are integer-valued in
  * double, so the fractions are bit-portable across engines).
  *
  * The suite exercises every check type over `orders`/`lineitem`:
  * completeness, key uniqueness, accepted values, two range checks, a
  * non-negativity check, a row floor, and cross-table referential
  * containment — nine checks, THREE passes total (one scan per table's
  * row-level batch + one broadcast-left-join for the FK coverage). The
  * `l_tax ≤ 0.05` range check is deliberately tighter than the data so
  * the report's failure path is exercised, not just all-green rows.
  */
object QualityOps extends QueryModule {

  private val dqChecks = QueryDef(
    "dq_table_checks",
    Some("""
      WITH o AS (
        SELECT
          avg(CASE WHEN o_orderpriority IS NOT NULL THEN 1.0 ELSE 0.0 END) AS completeness,
          CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*) AS uniq,
          avg(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1.0 ELSE 0.0 END) AS accepted,
          CAST(count(*) AS DOUBLE) AS n_rows
        FROM orders),
      l AS (
        SELECT
          avg(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1.0 ELSE 0.0 END) AS r_disc,
          avg(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 1.0 ELSE 0.0 END) AS r_qty,
          avg(CASE WHEN l_tax BETWEEN 0.0 AND 0.05 THEN 1.0 ELSE 0.0 END) AS r_tax,
          avg(CASE WHEN l_extendedprice >= 0.0 THEN 1.0 ELSE 0.0 END) AS nonneg
        FROM lineitem),
      c AS (
        SELECT avg(CASE WHEN pk.o_orderkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS contained
        FROM lineitem li
        LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) pk
          ON li.l_orderkey = pk.o_orderkey),
      u AS (
        SELECT 'completeness(orders.o_orderpriority)' AS check_name,
          completeness AS metric_value, 1.0 AS threshold FROM o
        UNION ALL SELECT 'uniqueness(orders.o_orderkey)', uniq, 1.0 FROM o
        UNION ALL SELECT 'accepted_values(orders.o_orderstatus)', accepted, 1.0 FROM o
        UNION ALL SELECT 'min_rows(orders)', n_rows, 1.0 FROM o
        UNION ALL SELECT 'in_range(lineitem.l_discount)', r_disc, 1.0 FROM l
        UNION ALL SELECT 'in_range(lineitem.l_quantity)', r_qty, 1.0 FROM l
        UNION ALL SELECT 'in_range(lineitem.l_tax)', r_tax, 1.0 FROM l
        UNION ALL SELECT 'non_negative(lineitem.l_extendedprice)', nonneg, 1.0 FROM l
        UNION ALL SELECT 'containment(lineitem.l_orderkey)', contained, 1.0 FROM c)
      SELECT check_name, metric_value, threshold,
        CAST(CASE WHEN metric_value >= threshold THEN 1 ELSE 0 END AS BIGINT) AS passed
      FROM u
      ORDER BY check_name"""),
    (s, dir) => {
      val orders = T(s, dir, "orders")
      val lineitem = T(s, dir, "lineitem")
      DataQuality.report(Seq(
        DataQuality.rowChecks(orders, Seq(
          Completeness("o_orderpriority", "orders.o_orderpriority"),
          Uniqueness("o_orderkey", "orders.o_orderkey"),
          AcceptedValues("o_orderstatus", Seq("O", "F", "P"),
            "orders.o_orderstatus"),
          MinRows("orders", threshold = 1.0))),
        DataQuality.rowChecks(lineitem, Seq(
          InRange("l_discount", 0.0, 0.1, "lineitem.l_discount"),
          InRange("l_quantity", 1.0, 50.0, "lineitem.l_quantity"),
          InRange("l_tax", 0.0, 0.05, "lineitem.l_tax"),
          NonNegative("l_extendedprice", "lineitem.l_extendedprice"))),
        DataQuality.containment(lineitem, "l_orderkey", orders,
          "o_orderkey", "lineitem.l_orderkey")))
    })

  override val defs: Seq[QueryDef] = Seq(dqChecks)
}
