package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-located-join strategy for fact↔fact
  * joins at 100 TB.
  *
  * Broadcasting covers fact↔dim; when BOTH sides are large (orders ⋈
  * lineitem, corpus ⋈ index), every query pays two full shuffles unless
  * the tables are pre-partitioned on the join key. Writing both sides
  * `bucketBy(n, key)` persists that partitioning in the catalog: each
  * side's scan reports hash-clustered distribution, the planner's
  * EnsureRequirements sees both children already satisfy the join's
  * required distribution, and the sort-merge join runs with ZERO
  * Exchange — the shuffle is paid once at write time, amortized over
  * every subsequent join, aggregation, or MERGE keyed on the bucket
  * column (spec-proved on the executed plan).
  *
  * Constraints that matter in production: bucket counts must match (or
  * divide) across the joined tables, the join key must be the bucket
  * key, and `spark.sql.sources.bucketing.enabled` must stay on. Bucketed
  * tables are catalog tables — pair with [[LakeCatalog.persistentBuilder]]
  * so the layout is visible to every session.
  */
object Bucketing {

  /** Persist `df` as a managed parquet table bucketed AND sorted by
    * `key` — sorted buckets additionally let the SMJ skip its sort. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the property bucketing buys. Exposed for specs and plan audits. */
  def isExchangeFree(df: DataFrame): Boolean = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = {
      val i = plan.indexOf("== Initial Plan ==")
      if (i >= 0) plan.substring(0, i) else plan
    }
    !finalPlan.contains("Exchange hashpartitioning")
  }
}
