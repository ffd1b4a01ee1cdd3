package graft

import graft.core.T
import graft.etl.LakeCatalog
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** ANALYZE + cost-based optimization: with column statistics in the
  * catalog, Catalyst estimates a selective filter's output and flips a
  * sort-merge join to a broadcast join on its own — no hint. */
class CatalogStatsSpec extends SparkSpec {
  import spark.implicits._

  private def joinNodes(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val executed = df.queryExecution.executedPlan
    val plan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    plan.collect {
      case _: BroadcastHashJoinExec => "broadcast"
      case _: SortMergeJoinExec     => "sortmerge"
    }
  }

  test("column stats flip a selective-filter join from sort-merge to broadcast") {
    LakeCatalog.registerExternalTable(spark, "statsdb", "li",
      s"$sf0001/lineitem.parquet")
    LakeCatalog.registerExternalTable(spark, "statsdb", "ord",
      s"$sf0001/orders.parquet")
    def query = spark.table("statsdb.li")
      .filter($"l_partkey" < 3) // selective: a few rows of 6k
      .join(spark.table("statsdb.ord"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    try {
      // threshold below the raw table sizes so nothing broadcasts on
      // file-size estimation alone; AQE off so the STATIC planner's
      // choice (what CBO informs) is the one we read
      withConf(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "8KB") {
        assert(joinNodes(query) == Seq("sortmerge"),
          "without stats the filtered side must look full-size")
        LakeCatalog.analyze(spark, "statsdb.li")
        LakeCatalog.analyze(spark, "statsdb.ord")
        assert(joinNodes(query) == Seq("broadcast"),
          "with column stats CBO must see the filter selectivity and broadcast")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS statsdb.li")
      spark.sql("DROP TABLE IF EXISTS statsdb.ord")
      spark.sql("DROP DATABASE IF EXISTS statsdb")
    }
  }

  test("runtime bloom filter prunes the probe side of a filtered fact-fact join") {
    // The 100 TB shape: fact ⋈ fact where one side carries a selective
    // filter — Catalyst's InjectRuntimeFilter builds a bloom filter of
    // the filtered side's join keys and applies might_contain on the big
    // side BEFORE its shuffle, so non-matching rows never shuffle at
    // all. Local thresholds are sized for 10 GB+ scans, so the spec
    // lowers them to make the rule fire on test data; results must be
    // identical either way.
    val li = T(spark, sf0001, "lineitem")
    val ord = T(spark, sf0001, "orders").filter($"o_orderpriority" === "1-URGENT")
    def query = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    val expected = query.collect().toSeq
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = query
      assert(q.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "InjectRuntimeFilter must install a bloom probe on the application side")
      assert(q.collect().toSeq == expected,
        "bloom pruning must be result-invisible")
    }
  }
}
