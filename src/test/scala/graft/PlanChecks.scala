package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Shared executed-plan assertions for the persisted-index specs. */
object PlanChecks {

  /** Walk the executed plan (run with AQE off so joins take their true
    * distributed form): every scan of a table whose path contains
    * `marker` must reach its FIRST join without crossing a
    * ShuffleExchange — the corpus/index side is read in place (bucketed
    * on its join keys); only probe-derived, candidate-sized frames
    * shuffle. */
  def assertCorpusInPlace(p: DataFrame, marker: String,
      expectedScans: Int): Unit = {
    val plan = p.queryExecution.executedPlan
    def isIdx(f: FileSourceScanExec): Boolean =
      f.relation.location.rootPaths.exists(_.toString.contains(marker))
    val allIdxScans = plan.collect {
      case f: FileSourceScanExec if isIdx(f) =>
        f.relation.location.rootPaths.mkString
    }
    assert(allIdxScans.size == expectedScans,
      s"expected $expectedScans index-table scans, got: $allIdxScans")
    var violations = List.empty[String]
    def raw(n: SparkPlan): Seq[String] = n match {
      case f: FileSourceScanExec if isIdx(f) =>
        Seq(f.relation.location.rootPaths.mkString)
      case _: BaseJoinExec =>
        n.children.foreach(raw); Seq.empty
      case sh: ShuffleExchangeExec =>
        violations ++= sh.children.flatMap(raw); Seq.empty
      case other => other.children.flatMap(raw)
    }
    raw(plan)
    assert(violations.isEmpty,
      s"index scans shuffled BEFORE their first join: $violations")
    assert(plan.collect { case sh: ShuffleExchangeExec => sh }.nonEmpty,
      "expected probe-side exchanges — plan walker is seeing nothing")
  }
}
