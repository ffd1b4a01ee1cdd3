package graft

import graft.core.T
import graft.plans.DimBroadcastRule
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The custom optimizer rule must force-broadcast registered dims even
  * when the size threshold forbids any size-based broadcast. Injected
  * here via `experimental.extraOptimizations` (the per-session hook);
  * fresh sessions get it through GraftExtensions (`injectOptimizerRule`),
  * which every main registers. */
class DimBroadcastRuleSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DimBroadcastRule
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq DimBroadcastRule)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("registered dim (nation) broadcasts despite threshold = -1") {
    withRule {
      val joined = T(spark, sf0001, "customer")
        .join(T(spark, sf0001, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      val plan = finalPlan(joined)
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"expected BroadcastHashJoin, got:\n$plan")
    }
  }

  test("non-dim join stays sort-merge under the same threshold") {
    withRule {
      val joined = T(spark, sf0001, "lineitem")
        .join(T(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = finalPlan(joined)
      assert(plan.collect { case s: SortMergeJoinExec => s }.nonEmpty,
        s"expected SortMergeJoin, got:\n$plan")
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty)
    }
  }

  test("fact under a dim-named parent directory is NOT broadcast") {
    withRule {
      // a big fact stored at .../nation/facts — the old contains("/nation/")
      // path match would have force-broadcast it
      val dir = java.nio.file.Files.createTempDirectory("dimname").toString +
        "/nation/facts"
      T(spark, sf0001, "lineitem").write.mode("overwrite").parquet(dir)
      val joined = spark.read.parquet(dir)
        .join(T(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = finalPlan(joined)
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"fact under /nation/ parent must not be broadcast:\n$plan")
      assert(plan.collect { case s: SortMergeJoinExec => s }.nonEmpty)
    }
  }

  test("dim registry is extensible") {
    withRule {
      DimBroadcastRule.registerDim("part")
      try {
        val joined = T(spark, sf0001, "lineitem")
          .join(T(spark, sf0001, "part"),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
        assert(finalPlan(joined)
          .collect { case b: BroadcastHashJoinExec => b }.nonEmpty)
      } finally {
        DimBroadcastRule.clearDims()
        Seq("nation", "region", "bronze_users").foreach(DimBroadcastRule.registerDim)
      }
    }
  }
}
