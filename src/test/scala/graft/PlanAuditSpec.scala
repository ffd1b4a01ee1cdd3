package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape audits: the scale claims — pushdown, column pruning,
  * broadcast dims — as regression tests over executed plans. AQE is
  * disabled per test so the tree is flat (query-stage wrappers hide
  * their subplans from TreeNode.collect); the audited shapes — scan
  * pushdown, broadcast selection — are decided before AQE anyway. */
class PlanAuditSpec extends SparkSpec {

  private def executed(name: String) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("date filter is pushed to the parquet scan and columns are pruned (P4)") {
    val scans = executed("p4_date_between")
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_ != "[]")),
      "expected non-empty PushedFilters on the scan")
    assert(scans.forall(f => f.requiredSchema.size < f.relation.dataSchema.size),
      "scan must read a strict subset of the table's columns")
  }

  test("fact-dim join broadcasts the dim side (J1)") {
    val plan = executed("j1_inner_equi_join")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected BroadcastHashJoin in:\n$plan")
  }

  test("decomposed OR-join runs as shuffled equi-joins, never a nested loop (J2 scale)") {
    val plan = executed("j2_scale_or_join")
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"BNLJ found in:\n$plan")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.size == 2, s"expected both OR branches as shuffled hash joins in:\n$plan")
  }
}
