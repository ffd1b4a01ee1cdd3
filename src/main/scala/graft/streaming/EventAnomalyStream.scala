package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.EventOps.anomalousDays]] — the
  * continuous form of the per-user daily-volume screen.
  *
  * Semantics differ from batch BY DESIGN: batch scores every day against
  * the user's WHOLE history (retrospective); the stream scores each day
  * as it closes against the history seen SO FAR (prequential), which is
  * what an online abuse/ops monitor wants — a spike is flagged the day
  * it happens, not at the next backfill. Both use the same exact-integer
  * moments (m, Σn, Σn² — no float accumulation), so a day that both
  * paths score over the same history gets the bit-identical z.
  *
  * Deployment shape is the lake's bronze→silver split, not one chained
  * job: [[dailyCounts]] closes day windows under a watermark (bounded
  * state) and lands them in silver; [[anomalyStream]] reads the closed
  * counts and keeps one tiny Moments record per user — state the size of
  * the user population, independent of event volume. This also sidesteps
  * Structured Streaming's restrictions on stateful-operator chaining.
  */
object EventAnomalyStream {

  case class DayCount(user_id: Long, day: java.sql.Date, n: Long)
  case class Moments(m: Long, s: Long, ssq: Long)
  case class Anomaly(user_id: Long, day: java.sql.Date, n: Long,
      mean: Double, z: Double)

  /** Stage 1: close (user, day) counts under the watermark. Append mode —
    * a day emits exactly once, when the watermark passes its end. */
  def dailyCounts(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("window.start").cast("date").as("day"),
        col("n"))

  /** Stage 2: prequential z-scoring over CLOSED day counts. Each
    * incoming day is scored against the user's pre-update moments (same
    * formula as batch: one division per statistic over exact integer
    * sums), then folded in; days inside a micro-batch are processed in
    * day order. */
  def anomalyStream(daily: Dataset[DayCount], minDays: Int = 5,
      zThreshold: Double = 2.0): Dataset[Anomaly] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Moments, Anomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[DayCount], state: GroupState[Moments]) =>
          var st = state.getOption.getOrElse(Moments(0L, 0L, 0L))
          val out = Seq.newBuilder[Anomaly]
          rows.toSeq.sortBy(_.day.getTime).foreach { r =>
            if (st.m >= minDays) {
              val mean = st.s.toDouble / st.m
              val varr = (st.ssq * st.m - st.s * st.s).toDouble /
                (st.m * st.m).toDouble
              if (varr > 0) {
                val z = (r.n.toDouble - mean) / math.sqrt(varr)
                if (z >= zThreshold) out += Anomaly(user, r.day, r.n, mean, z)
              }
            }
            st = Moments(st.m + 1, st.s + r.n, st.ssq + r.n * r.n)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
