package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: force-broadcast registered dimension tables in joins.
  *
  * Catalyst's own broadcast decision is size-threshold based
  * (`spark.sql.autoBroadcastJoinThreshold`, 10 MB default). At 100 TB
  * the dimension side of a star join (users, nation, region, calendar)
  * can exceed the threshold while still being far cheaper to broadcast
  * than to shuffle the fact side — exactly the case where engines carry
  * a dimension registry. This rule injects a BROADCAST hint for any scan
  * whose file path matches a registered dimension name, so the planner's
  * JoinSelection picks broadcast-hash regardless of the threshold.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`); the dim registry is a process-wide set,
  * defaulting to the star-schema dimension tables of the lake.
  */
object DimBroadcastRule extends Rule[LogicalPlan] {

  @volatile private var dims: Set[String] =
    Set("nation", "region", "bronze_users")

  def registerDim(name: String): Unit = synchronized { dims = dims + name }
  def clearDims(): Unit = synchronized { dims = Set.empty }
  def registeredDims: Set[String] = dims

  /** A relation is a dim only when the scan's root LEAF matches a
    * registered name (`.../nation` or `.../nation.parquet`). Matching
    * anywhere in the path (`contains("/nation/")`) would force-broadcast
    * a FACT that merely lives under a dim-named parent directory. */
  private def isDimRelation(r: LogicalRelation): Boolean = r.relation match {
    case fs: HadoopFsRelation =>
      val leaves = fs.location.rootPaths.map(_.getName.toLowerCase)
      dims.exists(d => leaves.exists(l => l == d || l == s"$d.parquet"))
    case _ => false
  }

  /** A join side "is a dimension" when its subtree holds exactly one
    * relation, that relation is registered, and no further join sits in
    * between (so we never broadcast a join result by accident). */
  private def sideIsDim(plan: LogicalPlan): Boolean = {
    val rels = plan.collect { case r: LogicalRelation => r }
    rels.length == 1 && isDimRelation(rels.head) &&
      plan.collect { case j: Join => j }.isEmpty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: Join =>
      // ResolvedHint nodes are already eliminated into Join.hint by this
      // stage of the optimizer, so the hint is set directly on the node;
      // existing user hints take precedence.
      val lh = j.hint.leftHint.orElse(
        if (sideIsDim(j.left)) Some(HintInfo(strategy = Some(BROADCAST))) else None)
      val rh = j.hint.rightHint.orElse(
        if (sideIsDim(j.right)) Some(HintInfo(strategy = Some(BROADCAST))) else None)
      if (lh == j.hint.leftHint && rh == j.hint.rightHint) j
      else j.copy(hint = j.hint.copy(leftHint = lh, rightHint = rh))
  }
}
