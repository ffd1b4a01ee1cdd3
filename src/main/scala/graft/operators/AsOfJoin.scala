package graft.operators

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.time <= left.time` per key. Spark has no native ASOF JOIN
  * (DuckDB does — which makes it oracle-checkable); the distributed
  * formulation here is the union + last-non-null window trick:
  *
  *   union both sides tagged, sort within key by (time, side) with right
  *   rows first at equal times, carry the right payload forward with
  *   `last(_, ignoreNulls)` over an unbounded-preceding frame, keep left
  *   rows.
  *
  * One shuffle on the key (the window partition) — same cost as a
  * sort-merge join, no range explosion, no custom SparkPlan needed
  * (composition preferred per the operator ladder: built-ins before
  * custom nodes).
  */
object AsOfJoin {

  /** left(keyCol, timeCol, ...) ⟕asof right(keyCol, timeCol, payload) —
    * adds right's payload columns; right must be unique per (key, time).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String): DataFrame = {
    val payloadCols = right.columns.filterNot(Seq(keyCol, timeCol).contains).toSeq
    val clash = payloadCols.intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"right payload column(s) ${clash.mkString(", ")} collide with left " +
        "columns; rename before joining (the output would carry two " +
        "same-named columns)")
    val leftCols = left.columns.toSeq
    val taggedLeft = payloadCols
      .foldLeft(left.withColumn("__is_left", lit(1)))(
        (df, c) => df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val taggedRight = leftCols.filterNot(Seq(keyCol, timeCol).contains)
      .foldLeft(
        payloadCols.foldLeft(right.withColumn("__is_left", lit(0)))(
          (df, c) => df.withColumnRenamed(c, s"__r_$c")))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = taggedLeft.unionByName(taggedRight)
    // right rows order BEFORE left rows at equal time → `>=` semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    carried
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__c_$c").as(c)): _*)
  }

  /** Oracle-checked query: each purchase event picks up the user's most
    * recent signup value at-or-before the purchase (DuckDB native
    * `ASOF LEFT JOIN` as the oracle). */
  val evAsOf = QueryDef(
    "ev_asof_join",
    Some("""
      WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      signups AS (
        SELECT user_id, ts, MAX(value) AS signup_value FROM events
        WHERE event_type = 'signup' GROUP BY user_id, ts)
      SELECT p.event_id, p.user_id, s.signup_value
      FROM purchases p
      ASOF LEFT JOIN signups s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id"""),
    (s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val signups = ev.filter($"event_type" === "signup")
        .groupBy($"user_id", $"ts")
        .agg(max($"value").as("signup_value"))
      joinAsOf(purchases, signups, keyCol = "user_id", timeCol = "ts")
        .select($"event_id", $"user_id", $"signup_value")
        .orderBy($"event_id")
    })
}
