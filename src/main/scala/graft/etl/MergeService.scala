package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) + traceability — SURVEY.md §2.4 A12.
  *
  * Reference behavior (`ingestStreamateModelPerformance.py:72-169`):
  * point-lookup by (_id, date); if present, rewrite the record (and append
  * a trace row when the tracked value decreased); else insert. Delta jars
  * are not on this classpath, so MERGE is implemented as a full-outer join
  * — base-side unmatched rows pass through, matched rows take update
  * values, update-side unmatched rows insert. Single records and
  * micro-batches use the same code path (the reference's per-record Lambda
  * becomes a 1-row `updates` frame).
  *
  * Scale: both sides shuffle on the merge keys (sort-merge join); with the
  * base stored bucketed by key the shuffle disappears entirely. The
  * reference's decrease check compares Athena VarCharValue strings
  * lexicographically (`:97`) — we compare numerically (documented
  * deviation, SURVEY §7.4.5).
  */
object MergeService {

  /** MERGE: WHEN MATCHED UPDATE all non-key columns, WHEN NOT MATCHED
    * INSERT. Adds `merge_action` ∈ {updated, inserted, unchanged}.
    * `base` and `updates` must share a schema.
    *
    * `stamp = Some((col, clock))` stamps the MATCHED-update rows' `col`
    * with `clock` — the reference rewrites records with a fresh
    * `updated_at` on the update path only
    * (`ingestStreamateModelPerformance.py:121-123`); inserted rows keep
    * the incoming value, untouched rows keep the stored one. The clock is
    * a Column so callers inject a deterministic literal in tests
    * (`current_timestamp()` in production).
    *
    * `carryBase` names columns whose MATCHED rows keep the BASE value
    * instead of the update's — how [[ManifestTable]]'s schema evolution
    * treats columns the batch never carried (the Delta `updateAll`
    * semantics: a source without the column leaves the target's values
    * alone, rather than nulling them). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      stamp: Option[(String, Column)] = None,
      carryBase: Set[String] = Set.empty): DataFrame = {
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    stamp.foreach { case (c, _) =>
      require(base.columns.contains(c), s"stamp column $c not in schema")
    }
    val b = base.alias("b")
    val u = updates.alias("u")
    val cond = keys.map(k => col(s"b.$k") <=> col(s"u.$k")).reduce(_ && _)
    val uKey = col(s"u.${keys.head}")
    val bKey = col(s"b.${keys.head}")
    val merged = b.join(u, cond, "full_outer")
    val outCols =
      keys.map(k => coalesce(col(s"b.$k"), col(s"u.$k")).as(k)) ++
        base.columns.filterNot(keys.contains).toSeq.map { c =>
          val carried =
            if (carryBase(c))
              when(bKey.isNotNull, col(s"b.$c")).otherwise(col(s"u.$c"))
            else when(uKey.isNotNull, col(s"u.$c")).otherwise(col(s"b.$c"))
          stamp match {
            case Some((sc, clock)) if sc == c =>
              when(bKey.isNotNull && uKey.isNotNull, clock).otherwise(carried).as(c)
            case _ => carried.as(c)
          }
        }
    merged.select(
      outCols :+
        when(bKey.isNull, "inserted")
          .when(uKey.isNull, "unchanged")
          .otherwise("updated").as("merge_action"): _*)
  }

  /** Trace rows for value regressions: matched keys where the incoming
    * value is strictly below the stored one. */
  def audit(base: DataFrame, updates: DataFrame, keys: Seq[String],
      oldValue: String, newValue: String): DataFrame = {
    val b = base.alias("b")
    val u = updates.alias("u")
    val cond = keys.map(k => col(s"b.$k") <=> col(s"u.$k")).reduce(_ && _)
    b.join(u, cond, "inner")
      .filter(col(s"u.$newValue") < col(s"b.$oldValue"))
      .select(
        keys.map(k => col(s"b.$k").as(k)) ++ Seq(
          col(s"b.$oldValue").as("old_value"),
          col(s"u.$newValue").as("new_value")): _*)
  }
}
