package graft.operators

import graft.core._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function operators — SURVEY.md §2.5 (W1, W2) plus the analytic
  * windows a training-data pipeline needs (lag/lead deltas, running sums)
  * that the reference lacks.
  *
  * Scale note: the reference's only window is a GLOBAL `ROW_NUMBER() OVER
  * (ORDER BY agg)` — a single-partition sort. That is fine at dashboard
  * cardinality (it sorts the *aggregated* rows, not the fact table), but
  * every window we add beyond it is partitioned (`PARTITION BY`) so state
  * stays distributed at 100 TB.
  */
object WindowOps extends QueryModule {

  /** W1: ranking over a global ordering of aggregates.
    * Ref: `ROW_NUMBER() OVER (ORDER BY SUM(CAST(amount AS DOUBLE)) DESC)`
    * `models_earning_distribution.py:100`. Deterministic tiebreak on key. */
  private val w1 = QueryDef(
    "w1_row_number_ranking",
    Some("""
      WITH agg AS (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_custkey)
      SELECT o_custkey, revenue,
        ROW_NUMBER() OVER (ORDER BY revenue DESC, o_custkey ASC) AS ranking
      FROM agg
      ORDER BY ranking"""),
    (s, dir) => {
      import s.implicits._
      val w = Window.orderBy($"revenue".desc, $"o_custkey".asc)
      T(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"))
        .withColumn("ranking", row_number().over(w))
        .orderBy($"ranking")
    })

  /** W2: top-N + "everything else" bucket, re-aggregated.
    * Ref: `CASE WHEN ranking <= 5 THEN artisticname ELSE 'General' END`
    * `models_earning_distribution.py:117-137`. */
  private val w2 = QueryDef(
    "w2_topn_general_bucket",
    Some("""
      WITH agg AS (
        SELECT c.c_name,
          CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_name),
      ranked AS (
        SELECT c_name, revenue,
          ROW_NUMBER() OVER (ORDER BY revenue DESC, c_name ASC) AS ranking
        FROM agg)
      SELECT CASE WHEN ranking <= 5 THEN c_name ELSE 'General' END AS label,
        CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM ranked
      GROUP BY 1
      ORDER BY revenue DESC, label ASC"""),
    (s, dir) => {
      import s.implicits._
      val w = Window.orderBy($"revenue".desc, $"c_name".asc)
      T(s, dir, "orders")
        .join(broadcast(T(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .groupBy($"c_name")
        .agg(H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"))
        .withColumn("ranking", row_number().over(w))
        .groupBy(when($"ranking" <= 5, $"c_name").otherwise("General").as("label"))
        // revenue values are exact 2-dp decimals rendered as doubles, so
        // re-casting to DECIMAL(18,2) is exact and keeps the second
        // aggregation order-independent for the oracle hash.
        .agg(H.dbl(sum($"revenue".cast(DecimalType(18, 2)))).as("revenue"))
        .orderBy($"revenue".desc, $"label".asc)
    })

  /** W3 (beyond reference): partitioned lag — per-user inter-event gap in
    * seconds and value delta. The bread-and-butter sessionization primitive. */
  private val w3 = QueryDef(
    "w3_lag_partitioned",
    Some("""
      SELECT user_id, event_id,
        epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        CAST(CAST(value AS DECIMAL(12,2))
          - lag(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS value_delta
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""),
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      EventOps.events(s, dir)
        .select(
          $"user_id", $"event_id",
          (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"),
          H.dbl(H.dec2($"value") - lag(H.dec2($"value"), 1).over(w)).as("value_delta"))
        .orderBy($"user_id", $"event_id")
    })

  /** W4 (beyond reference): running (cumulative) sum per partition. */
  private val w4 = QueryDef(
    "w4_running_sum",
    Some("""
      SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(12,2)))
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      FROM events
      ORDER BY user_id, event_id"""),
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      EventOps.events(s, dir)
        .select(
          $"user_id", $"event_id",
          H.dbl(sum(H.dec2($"value")).over(w)).as("running_value"))
        .orderBy($"user_id", $"event_id")
    })

  /** W5 (beyond parity): RANGE-framed moving aggregate — the
    * trailing-7-day average daily event count per user, the dashboard
    * smoothing primitive ROWS frames can't express (a row frame counts
    * ROWS back, not days back, so gaps in activity skew it). Reproducible
    * division policy: the frame's SUM and COUNT are exact integers;
    * avg = one double division. The range key is days-since-epoch so
    * both engines frame on integer day arithmetic. */
  private val w5 = QueryDef(
    "w5_range_moving_avg",
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      d AS (SELECT user_id, day,
              CAST(day - DATE '1970-01-01' AS BIGINT) AS dnum, n
            FROM daily)
      SELECT user_id, day, n,
        CAST(SUM(n) OVER w AS BIGINT) AS win_events,
        COUNT(*) OVER w AS win_days,
        CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg_active_day
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY dnum
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, day"""),
    (s, dir) => {
      import s.implicits._
      val daily = EventOps.events(s, dir)
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dnum", datediff($"day", lit("1970-01-01")).cast(LongType))
      val w = Window.partitionBy($"user_id").orderBy($"dnum")
        .rangeBetween(-6, Window.currentRow)
      daily
        .select($"user_id", $"day", $"n",
          sum($"n").over(w).as("win_events"),
          count(lit(1)).over(w).as("win_days"),
          (sum($"n").over(w).cast(DoubleType)
            / count(lit(1)).over(w)).as("avg_active_day"))
        .orderBy($"user_id", $"day")
    })

  /** W6 (beyond parity): W1's global ranking on the SCALE path —
    * [[GlobalRank.withRowNumber]]'s two-phase distributed rank instead of
    * the single-partition window. Same semantics, same oracle shape as
    * W1; the plan contains no `WindowExec` at all (GlobalRankSpec
    * plan-asserts), so the ranked frame may grow with the data without
    * one task ever holding it whole. */
  private val w6 = QueryDef(
    "w6_scalable_ranking",
    Some("""
      WITH agg AS (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_custkey)
      SELECT o_custkey, revenue,
        ROW_NUMBER() OVER (ORDER BY revenue DESC, o_custkey ASC) AS ranking
      FROM agg
      ORDER BY ranking"""),
    (s, dir) => {
      import s.implicits._
      val agg = T(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(H.dbl(sum(H.dec2($"o_totalprice", 14))).as("revenue"))
      GlobalRank
        .withRowNumber(agg, "ranking", Seq($"revenue".desc, $"o_custkey".asc))
        .withColumn("ranking", $"ranking".cast(IntegerType)) // match W1's window type
        .orderBy($"ranking")
    })

  /** O8 (beyond parity): grouped top-k via the map-side-truncating
    * [[graft.functions.TopKAggregate]] — shuffle carries ≤ k entries per
    * (map task, group) instead of every row of every group. The oracle
    * replays it as the window form it replaces; totality of the order
    * (price DESC, key ASC) makes the two selections identical. */
  private val o8 = QueryDef(
    "o8_grouped_topk",
    Some("""
      WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
      SELECT o_orderpriority, o_orderkey, o_totalprice
      FROM ranked WHERE rn <= 3
      ORDER BY o_orderpriority, o_orderkey"""),
    (s, dir) => {
      import s.implicits._
      T(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(graft.functions.TopKAggregate
          .topK(s, $"o_totalprice", $"o_orderkey", 3).as("top"))
        .select($"o_orderpriority", explode($"top").as("e"))
        .select($"o_orderpriority", $"e.id".as("o_orderkey"),
          $"e.score".as("o_totalprice"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    })

  override val defs: Seq[QueryDef] = Seq(w1, w2, w3, w4, w5, w6, o8)
}
