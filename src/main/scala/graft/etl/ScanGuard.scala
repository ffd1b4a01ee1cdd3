package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bytes-scanned guardrail — the engine-side equivalent of the reference's
  * Athena workgroup cap (`BytesScannedCutoffPerQuery: 1000000000`,
  * `data-lake-stack.yml:285-286`, BASELINE.md).
  *
  * Computes the PLANNED scan size (after partition pruning) from the
  * file listings, so an unpruned full-table query against a 100 TB fact
  * is rejected before it runs rather than billed after.
  */
object ScanGuard {

  final case class ScanBudgetExceeded(planned: Long, budget: Long)
    extends RuntimeException(
      s"query plans to scan $planned bytes, over the $budget-byte budget")

  val AthenaDefaultBudget: Long = 1000000000L

  /** Planned bytes across all file scans (post partition-pruning). */
  def plannedScanBytes(df: DataFrame): Long = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case f: FileSourceScanExec => f.selectedPartitions.totalFileSize
    }.sum
  }

  /** Throws [[ScanBudgetExceeded]] when the planned scan is over budget;
    * returns the DataFrame untouched otherwise. */
  def enforce(df: DataFrame, budget: Long = AthenaDefaultBudget): DataFrame = {
    val planned = plannedScanBytes(df)
    if (planned > budget) throw ScanBudgetExceeded(planned, budget)
    df
  }
}
