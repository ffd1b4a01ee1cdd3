package graft.operators

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time operators over the `events` table — tumbling/sliding window
  * aggregation and calendar bucketing (SURVEY.md §2.10: the reference has
  * no streaming, so these are the beyond-parity batch equivalents of the
  * Structured Streaming pipeline in `graft.streaming`; same `window()`
  * semantics both places).
  */
object EventOps extends QueryModule {

  /** events loader — schema-adaptive on the physical encoding of `ts`.
    * The testdata has shipped it two ways across generations: parquet
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects, so the
    * session's `spark.sql.legacy.parquet.nanosAsLong` surfaces it as a raw
    * nanos LONG that we rebuild — µs-granular values make `ns div 1000`
    * lossless) and parquet TIMESTAMP(MICROS) (read natively as
    * TIMESTAMP_NTZ or TIMESTAMP). Branching on the arrived type instead of
    * assuming one encoding means a testdata regeneration can't break every
    * downstream events query at analysis time. The session timezone is
    * pinned UTC, so the NTZ→TZ cast is value-preserving. No session conf
    * is mutated here. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = T(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType                           => timestamp_micros(expr("ts div 1000"))
      case TimestampType                      => col("ts")
      case TimestampNTZType                   => col("ts").cast(TimestampType)
      case DateType                           => col("ts").cast(TimestampType) // midnight UTC (session TZ pinned)
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as $other; expected LONG (raw nanos), TIMESTAMP, TIMESTAMP_NTZ, or DATE")
    }
    raw.withColumn("ts", ts)
  }

  /** F4: ISO day-of-week (Mon=1..Sun=7). Presto's `day_of_week` vs Spark's
    * Sun-first `dayofweek` — SURVEY §7.4 item 1. `weekday()+1` closes it. */
  private val f4 = QueryDef(
    "f4_iso_day_of_week",
    Some("""
      SELECT isodow(ts) AS iso_dow, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1
      ORDER BY iso_dow"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy((weekday($"ts") + 1).cast(LongType).as("iso_dow"))
        .agg(count(lit(1)).as("n"), H.dbl(sum(H.dec2($"value"))).as("total_value"))
        .orderBy($"iso_dow")
    })

  /** F5: prior-period comparison via date/interval shift from a fixed
    * anchor. Ref: `DATE_ADD(unit, -n, date)` `needle.py:113-118`. */
  private val f5 = QueryDef(
    "f5_period_shift",
    Some("""
      SELECT
        CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 7 DAY THEN 'current'
             ELSE 'previous' END AS period,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 14 DAY
        AND ts < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY 1
      ORDER BY period"""),
    (s, dir) => {
      import s.implicits._
      val anchor = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      events(s, dir)
        .filter($"ts" >= anchor - expr("INTERVAL 14 DAYS") && $"ts" < anchor)
        .groupBy(
          when($"ts" >= anchor - expr("INTERVAL 7 DAYS"), "current")
            .otherwise("previous").as("period"))
        .agg(count(lit(1)).as("n"), H.dbl(sum(H.dec2($"value"))).as("total_value"))
        .orderBy($"period")
    })

  /** Tumbling event-time window aggregation (`window(ts, 1 hour)`), the
    * batch twin of the streaming pipeline. Beyond-parity (SURVEY §2.10). */
  private val evTumble = QueryDef(
    "ev_tumbling_window",
    Some("""
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), H.dbl(sum(H.dec2($"value"))).as("total_value"))
        .select(
          $"window.start".as("window_start"), $"event_type", $"n", $"total_value")
        .orderBy($"window_start", $"event_type")
    })

  /** Sliding event-time window (1 h window, 30 min slide): each event lands
    * in 2 windows. Oracle models the slide as a UNION of two shifted
    * tumbling bucketings. */
  private val evSlide = QueryDef(
    "ev_sliding_window",
    Some("""
      WITH assigned AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS window_start, value
        FROM events)
      SELECT window_start, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM assigned
      GROUP BY 1
      ORDER BY window_start"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(window($"ts", "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), H.dbl(sum(H.dec2($"value"))).as("total_value"))
        .select($"window.start".as("window_start"), $"n", $"total_value")
        .orderBy($"window_start")
    })

  /** Sessionization with a 30-minute inactivity gap — gaps-and-islands.
    * Spark: `session_window`; oracle: lag + cumulative boundary count. */
  private val evSession = QueryDef(
    "ev_session_window",
    Some("""
      WITH marked AS (
        SELECT user_id, ts, value,
          CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    >= INTERVAL 30 MINUTE THEN 1
               WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
               ELSE 0 END AS is_start
        FROM events),
      sessions AS (
        SELECT user_id, ts, value,
          SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked)
      SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, session_start"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"), H.dbl(sum(H.dec2($"value"))).as("total_value"))
        .select(
          $"user_id", $"session_window.start".as("session_start"),
          $"n_events", $"total_value")
        .orderBy($"user_id", $"session_start")
    })

  /** F14: pivot (wide per-category columns from long rows).
    * Ref: per-platform date alignment `earnings.py:162-213`. Explicit pivot
    * value list keeps the plan single-pass (no distinct-scan job). */
  private val f14 = QueryDef(
    "f14_pivot_event_types",
    Some("""
      SELECT CAST(ts AS DATE) AS event_date,
        CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
        CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS signup,
        CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS "view"
      FROM events
      GROUP BY 1
      ORDER BY event_date"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(to_date($"ts").as("event_date"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(H.dbl(sum(H.dec2($"value"))))
        .orderBy($"event_date")
    })

  /** F15: JSON (de)serialization — extract a typed field from the `props`
    * JSON column (ref `json.loads`/`dumps` `ingestStreamateModelPerformance.py:119,127`).
    *
    * Schema'd `from_json` (single Jackson parse per row into a typed
    * struct) instead of `get_json_object` (a JsonPath evaluation per
    * extraction) — >6× faster on the bench, and the right shape when
    * several fields are pulled from the same payload. Null semantics are
    * NOT identical in every corner: a non-integral or quoted numeric
    * (`k:1.5`, `k:"12"`) coerced to a value by get_json_object+CAST under
    * ANSI-off becomes null under from_json's LongType — acceptable here
    * because props.k is always an unquoted integer in this corpus. */
  private val f15 = QueryDef(
    "f15_json_extract",
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1
      ORDER BY k"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(from_json($"props", StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"))
        .agg(count(lit(1)).as("n"), H.dbl(sum(H.dec2($"value"))).as("total_value"))
        .orderBy($"k")
    })

  /** F6: ROUND(x, n) on exact decimals (HALF_UP both engines; doubles are
    * never rounded at the comparison boundary — see H policy).
    * Ref: `ROUND(x, 2)` `earnings_by_day_of_week.sql:10,16`. */
  private val f6 = QueryDef(
    "f6_round_decimal",
    Some("""
      SELECT event_type,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 1) AS DOUBLE) AS rounded_total,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 0) AS DOUBLE) AS rounded_whole
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy($"event_type")
        .agg(
          H.dbl(round(sum(H.dec2($"value")), 1)).as("rounded_total"),
          H.dbl(round(sum(H.dec2($"value")), 0)).as("rounded_whole"))
        .orderBy($"event_type")
    })

  /** Funnel conversion (beyond reference): users whose first purchase
    * follows their first signup within 7 days — the event-sequence
    * pattern every product-analytics workload needs. */
  private val evFunnel = QueryDef(
    "ev_funnel_conversion",
    Some("""
      WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      p AS (
        SELECT e.user_id, MIN(e.ts) AS first_purchase
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts >= s.signup_ts AND e.ts <= s.signup_ts + INTERVAL 7 DAY
        GROUP BY e.user_id)
      SELECT COUNT(*) AS n_signup,
        COUNT(p.user_id) AS n_converted,
        CAST(COUNT(p.user_id) AS DOUBLE) * 100.0 / COUNT(*) AS conversion_pct
      FROM s LEFT JOIN p ON s.user_id = p.user_id"""),
    (s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      val signup = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
      val purchase = ev.filter($"event_type" === "purchase")
        .join(signup, Seq("user_id"))
        .filter($"ts" >= $"signup_ts" &&
          $"ts" <= $"signup_ts" + expr("INTERVAL 7 DAYS"))
        .groupBy($"user_id").agg(min($"ts").as("first_purchase"))
      signup.join(purchase.select($"user_id".as("p_user")),
          $"user_id" === $"p_user", "left")
        .agg(
          count(lit(1)).as("n_signup"),
          count($"p_user").as("n_converted"),
          (count($"p_user").cast(DoubleType) * lit(100.0) / count(lit(1)))
            .as("conversion_pct"))
    })

  /** F14 inverse: unpivot (wide per-type columns back to long rows) —
    * melt the pivoted event matrix. */
  private val f17 = QueryDef(
    "f17_unpivot",
    Some("""
      WITH wide AS (
        SELECT CAST(ts AS DATE) AS event_date,
          CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase
        FROM events GROUP BY 1)
      SELECT event_date, event_type, amount
      FROM wide
      UNPIVOT INCLUDE NULLS (amount FOR event_type IN (click, purchase))
      ORDER BY event_date, event_type"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(to_date($"ts").as("event_date"))
        .pivot("event_type", Seq("click", "purchase"))
        .agg(H.dbl(sum(H.dec2($"value"))))
        .unpivot(
          ids = Array($"event_date"),
          values = Array($"click", $"purchase"),
          variableColumnName = "event_type",
          valueColumnName = "amount")
        .orderBy($"event_date", $"event_type")
    })

  /** Weekly cohort retention: users grouped by first-seen week, then
    * "what fraction of each cohort was active k weeks later" — the
    * canonical product-analytics dashboard the reference's earnings
    * dashboards are one step away from. Shape at scale: two keyed
    * aggregations over (user, week) rows and a broadcast of the tiny
    * per-cohort sizes; nothing corpus-sized crosses an unpartitioned
    * boundary. */
  private val evCohorts = QueryDef(
    "ev_retention_cohorts",
    Some("""
      WITH fs AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id),
      act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
        FROM events),
      cs AS (
        SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
        FROM fs GROUP BY cohort_week),
      r AS (
        SELECT f.cohort_week,
          date_diff('day', f.cohort_week, a.activity_week) // 7 AS week_offset,
          count(DISTINCT a.user_id) AS retained
        FROM act a JOIN fs f USING (user_id)
        GROUP BY 1, 2)
      SELECT r.cohort_week, week_offset, retained, cohort_size,
        retained / cohort_size AS retention_rate
      FROM r JOIN cs USING (cohort_week)
      ORDER BY cohort_week, week_offset"""),
    (s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      val firstSeen = ev.groupBy($"user_id")
        .agg(to_date(date_trunc("week", min($"ts"))).as("cohort_week"))
      val activity = ev
        .select($"user_id", to_date(date_trunc("week", $"ts")).as("activity_week"))
        .distinct()
      val cohortSizes = firstSeen.groupBy($"cohort_week")
        .agg(countDistinct($"user_id").as("cohort_size"))
      activity
        .join(firstSeen, "user_id")
        .select($"cohort_week",
          expr("datediff(activity_week, cohort_week) div 7").as("week_offset"),
          $"user_id")
        .groupBy($"cohort_week", $"week_offset")
        .agg(countDistinct($"user_id").as("retained"))
        .join(broadcast(cohortSizes), "cohort_week")
        .select($"cohort_week", $"week_offset", $"retained", $"cohort_size",
          ($"retained" / $"cohort_size").as("retention_rate"))
        .orderBy($"cohort_week", $"week_offset")
    })

  /** Sessionized event SEQUENCES — each user session rendered as its
    * ordered event-type chain (`view>click>purchase`): the dataset a
    * behavioral/recommendation model trains on. Same session_window
    * state as ev_session_window; the sequence is a sorted struct
    * collect folded to a string — deterministic (event_id breaks ts
    * ties), and the collect is per-session (bounded by the gap), never
    * per-user-history. */
  private val evSequences = QueryDef(
    "ev_session_sequences",
    Some("""
      WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
          CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    >= INTERVAL 30 MINUTE THEN 1
               WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
               ELSE 0 END AS is_start
        FROM events),
      sessions AS (
        SELECT user_id, ts, event_id, event_type,
          SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked)
      SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
        string_agg(event_type, '>' ORDER BY ts, event_id) AS sequence
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, session_start"""),
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          sort_array(collect_list(struct($"ts", $"event_id", $"event_type")))
            .as("evs"))
        .select(
          $"user_id", $"session_window.start".as("session_start"), $"n_events",
          concat_ws(">", transform($"evs", e => e("event_type"))).as("sequence"))
        .orderBy($"user_id", $"session_start")
    })

  /** Per-user daily-volume anomaly detection — days whose event count
    * sits ≥ 2σ above that user's own mean, the standard ops/abuse screen
    * over behavioral data. Reproducibility: mean and variance derive
    * from EXACT integer sums (Σn, Σn² as bigints — no float
    * accumulation), each converted to double with a single division, so
    * the z-scores are bit-identical across engines without ordered
    * folds. Two keyed aggregations plus a stats join back — all
    * map-side combinable; users with under 5 active days or zero
    * variance are excluded (z undefined). Σn²·m stays within int64 for
    * any per-user history a real pipeline shards (overflow needs
    * ~10⁶ days at ~10⁵ events/day). */
  private val evAnomaly = QueryDef(
    "ev_anomaly_zscore",
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      stats AS (
        SELECT user_id, COUNT(*) AS m,
          CAST(SUM(n) AS BIGINT) AS s,
          CAST(SUM(n * n) AS BIGINT) AS ssq
        FROM daily GROUP BY 1),
      j AS (
        SELECT d.user_id, d.day, d.n,
          CAST(st.s AS DOUBLE) / st.m AS mean,
          CAST(st.ssq * st.m - st.s * st.s AS DOUBLE)
            / CAST(st.m * st.m AS DOUBLE) AS varr
        FROM daily d JOIN stats st USING (user_id)
        WHERE st.m >= 5)
      SELECT user_id, day, n, mean,
        (CAST(n AS DOUBLE) - mean) / sqrt(varr) AS z
      FROM j
      WHERE varr > 0 AND (CAST(n AS DOUBLE) - mean) / sqrt(varr) >= 2.0::DOUBLE
      ORDER BY user_id, day"""),
    (s, dir) => anomalousDays(events(s, dir)))

  /** See [[evAnomaly]]. `ev` needs (user_id, ts) columns. */
  def anomalousDays(ev: DataFrame, minDays: Int = 5,
      zThreshold: Double = 2.0): DataFrame = {
    val daily = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col("user_id"))
      .agg(count(lit(1)).as("m"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ssq"))
    daily.join(stats, "user_id")
      .filter(col("m") >= minDays)
      .select(col("user_id"), col("day"), col("n"),
        (col("s").cast(DoubleType) / col("m")).as("mean"),
        ((col("ssq") * col("m") - col("s") * col("s")).cast(DoubleType)
          / (col("m") * col("m")).cast(DoubleType)).as("varr"))
      .withColumn("z",
        (col("n").cast(DoubleType) - col("mean")) / sqrt(col("varr")))
      .filter(col("varr") > 0 && col("z") >= zThreshold)
      .select(col("user_id"), col("day"), col("n"), col("mean"), col("z"))
      .orderBy(col("user_id"), col("day"))
  }

  /** First-order Markov transition matrix over per-user event chains —
    * the behavioral-modeling summary next-event predictors and
    * anomaly-detection priors start from (P(next type | current type)).
    * Consecutive-pair extraction is a per-user window (the (ts,
    * event_id) total order makes it deterministic), the transition agg
    * is |types|²-sized, and the per-source denominators broadcast — no
    * corpus-sized shuffle beyond the one keyed window pass. */
  private val evMarkov = QueryDef(
    "ev_markov_transitions",
    Some("""
      WITH ordered AS (
        SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events),
      pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
          COUNT(*) AS n
        FROM ordered WHERE next_type IS NOT NULL
        GROUP BY 1, 2),
      tot AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        FROM pairs GROUP BY from_type)
      SELECT p.from_type, p.to_type, p.n, t.n_from,
        p.n / t.n_from AS p_transition
      FROM pairs p JOIN tot t USING (from_type)
      ORDER BY from_type, to_type"""),
    (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val pairs = events(s, dir)
        .select($"event_type".as("from_type"),
          lead($"event_type", 1).over(w).as("to_type"))
        .filter($"to_type".isNotNull)
        .groupBy($"from_type", $"to_type")
        .agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy($"from_type").agg(sum($"n").as("n_from"))
      pairs.join(broadcast(tot), "from_type")
        .select($"from_type", $"to_type", $"n", $"n_from",
          ($"n" / $"n_from").as("p_transition"))
        .orderBy($"from_type", $"to_type")
    })

  /** RESAMPLE + GAP-FILL — regularize an event stream onto a dense daily
    * grid: build the calendar spine (one `sequence` explode over the
    * table's [min, max] day), cross it with the type dimension, left-join
    * the real daily aggregates, then fill — counts become 0 (a silent day
    * IS zero events), carried metrics forward-fill from the last observed
    * day (`last(..., ignoreNulls)` over a per-type ordered window). The
    * time-series prep every downstream trainer/monitor wants before
    * lag/rolling features: without the fill, a day with no rows silently
    * vanishes from windows instead of contributing its true zero.
    *
    * Scale shape: ONE pass over events for the daily aggregate; the spine
    * is |types| × days (calendar-bounded, NOT data-sized — 10× the events
    * is the same spine); the spine-side joins are broadcasts and the fill
    * window is partitioned per type. Float-portable by the H policy: the
    * carried metric is a decimal-exact daily sum cast to double once. */
  private val evResample = QueryDef(
    "ev_resample_fill",
    Some("""
      WITH bounds AS (
        SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
        FROM events),
      days AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        FROM bounds),
      types AS (SELECT DISTINCT event_type FROM events),
      daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      spine AS (SELECT event_type, day FROM types CROSS JOIN days)
      SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n_events,
        last_value(d.v IGNORE NULLS) OVER (
          PARTITION BY s.event_type ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
      FROM spine s LEFT JOIN daily d
        ON s.event_type = d.event_type AND s.day = d.day
      ORDER BY s.event_type, s.day"""),
    (s, dir) => resampleDaily(events(s, dir))
      .orderBy(col("event_type"), col("day")))

  /** The resample+fill transformation behind `ev_resample_fill`, factored
    * for the gap-semantics spec (the sf0.01 grid happens to be dense, so
    * only a fixture with real holes can exercise the fill paths). */
  def resampleDaily(ev: DataFrame): DataFrame = {
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), H.dbl(sum(H.dec2(col("value")))).as("v"))
    val days = ev
      .agg(to_date(min(col("ts"))).as("lo"), to_date(max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val spine = ev.select(col("event_type")).distinct().crossJoin(broadcast(days))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("carried_value"))
  }

  /** PageRank over the event-type transition graph — the stationary
    * distribution of the [[evMarkov]] chain with damping (Page et al.
    * 1999): the long-run fraction of a user journey spent at each event
    * type, the prior behavioral models and session simulators start
    * from. Damping + uniform teleport make the chain ergodic even when
    * the observed graph isn't; dangling types (no observed successor)
    * redistribute their mass uniformly, the standard correction.
    *
    * Scale shape: the ONLY data-sized work is the per-user keyed window
    * extracting consecutive pairs and the \|types\|²-sized transition agg
    * — identical to [[evMarkov]], one corpus pass. The matrix is
    * \|types\|² = driver-sized by construction (the [[EmbeddingStatsOps]]
    * PCA precedent), so the power iteration is bounded driver double
    * math; 1000× the events changes the window pass, not the iteration.
    *
    * Oracle policy (PCA family): every float accumulation is an ordered
    * left-to-right fold — per-target contributions fold over ascending
    * source type, dangling mass over ascending type — mirrored verbatim
    * by DuckDB `list_reduce(list(... ORDER BY ...))` in the unrolled
    * iteration CTEs, so all `iters` rounds are bit-reproducible. */
  def typePagerank(ev: DataFrame, damping: Double = 0.85,
      iters: Int = 8): DataFrame = {
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    val s = ev.sparkSession
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = ev
      .select($"event_type".as("src"),
        lead($"event_type", 1).over(w).as("dst"))
      .filter($"dst".isNotNull)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
    val tot = pairs.groupBy($"src").agg(sum($"n").as("n_from"))
    // both collects are |types|- or |types|²-bounded by construction.
    // ONE action over the transition pairs, not two: a separate
    // tot.collect() re-executed the lead()-window corpus pass that
    // `pairs` costs (the join below already carries n_from on every
    // row, so the out-degree map folds from the same rows); the
    // division stays IN SPARK — the identical ($"n" / $"n_from")
    // expression as before — so the collected p values are
    // bit-identical to the two-action form.
    val nodes = ev.select($"event_type").distinct()
      .collect().map(_.getString(0)).sorted
    val probRows = pairs.join(tot, "src")
      .select($"src", $"dst", ($"n" / $"n_from").as("p"), $"n_from")
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val nOut = probRows.map(t => t._1 -> t._4).toMap
    val prob = probRows.map(t => (t._1, t._2) -> t._3).toMap
    val n = nodes.length
    val dangling = nodes.filter(t => !nOut.contains(t))
    // incoming edges per target, ascending src — the oracle's list order
    val in: Map[String, Seq[(String, Double)]] = prob.toSeq
      .map { case ((src, dst), p) => dst -> (src, p) }
      .groupBy(_._1).map { case (dst, es) => dst -> es.map(_._2).sortBy(_._1) }
    var r = nodes.map(t => t -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = dangling.map(r).reduceLeftOption(_ + _).getOrElse(0.0)
      r = nodes.map { t =>
        val contrib = in.getOrElse(t, Nil).map { case (src, p) => p * r(src) }
          .reduceLeftOption(_ + _).getOrElse(0.0)
        t -> ((1.0 - damping) / n + damping * (contrib + dang / n))
      }.toMap
    }
    nodes.map(t => (t, nOut.getOrElse(t, 0L), r(t)))
      .toSeq.toDF("event_type", "n_out", "p_stationary")
  }

  /** Generated unrolled-iteration oracle: r0 = uniform, then `iters`
    * rounds of dangling-fold + per-target ordered contribution folds —
    * the same CTE-generation approach as `DedupOps.minhashCtes`. */
  private def pagerankSql(damping: Double, iters: Int): String = {
    val d = s"${damping}::DOUBLE"
    val iterCtes = (0 until iters).map { k =>
      s"""dg$k AS (
        SELECT coalesce(list_reduce(list(r.r ORDER BY r.t), (a, b) -> a + b),
                        0.0::DOUBLE) AS dang
        FROM r$k r JOIN dangling dl ON dl.t = r.t),
      r${k + 1} AS (
        SELECT nd.t,
          (1.0::DOUBLE - $d) / nn.n
            + $d * (coalesce(c.contrib, 0.0::DOUBLE) + dg.dang / nn.n) AS r
        FROM nodes nd CROSS JOIN nn CROSS JOIN dg$k dg
        LEFT JOIN (
          SELECT p.dst AS t,
            list_reduce(list(p.p * r.r ORDER BY p.src), (a, b) -> a + b) AS contrib
          FROM p JOIN r$k r ON r.t = p.src GROUP BY p.dst) c ON c.t = nd.t)"""
    }.mkString(",\n      ")
    s"""
      WITH ordered AS (
        SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events),
      pairs AS (
        SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
        FROM ordered WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT src, SUM(n) AS n_from FROM pairs GROUP BY src),
      p AS (SELECT pairs.src, pairs.dst, pairs.n / tot.n_from AS p
            FROM pairs JOIN tot USING (src)),
      nodes AS (SELECT DISTINCT event_type AS t FROM events),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      dangling AS (SELECT t FROM nodes WHERE t NOT IN (SELECT src FROM p)),
      r0 AS (SELECT t, 1.0::DOUBLE / nn.n AS r FROM nodes CROSS JOIN nn),
      $iterCtes
      SELECT nd.t AS event_type, coalesce(o.n_out, 0) AS n_out,
        fin.r AS p_stationary
      FROM nodes nd
      LEFT JOIN (SELECT src, CAST(SUM(n) AS BIGINT) AS n_out
                 FROM pairs GROUP BY src) o ON o.src = nd.t
      JOIN r$iters fin ON fin.t = nd.t
      ORDER BY event_type"""
  }

  private val evPagerank = QueryDef(
    "ev_type_pagerank",
    Some(pagerankSql(damping = 0.85, iters = 8)),
    (s, dir) => typePagerank(events(s, dir)))

  override val defs: Seq[QueryDef] =
    Seq(f4, f5, f6, f15, f17, evTumble, evSlide, evSession, evFunnel, f14,
      evCohorts, evSequences, evAnomaly, evMarkov, evResample, evPagerank)
}
