package graft

import graft.domain.{Fixtures, SqlSurface}
import graft.etl.LakeCatalog
import java.nio.file.Files

/** S3 full parity: catalog tables (CREATE TABLE ... USING parquet
  * LOCATION) are catalog-scoped, not session-scoped — a FRESH session
  * runs the SQL surface against them with zero re-registration, which
  * temp views could never do. Cross-JVM persistence of the same
  * definitions (Hive/derby metastore) is exercised by the
  * [[graft.CatalogRoundTrip]] main in the verify skill. */
class LakeCatalogSpec extends SparkSpec {

  test("fresh session queries catalog tables with no view registration") {
    val root = Files.createTempDirectory("lakecat").toString
    val t = Fixtures.tables(spark)
    val locs = Map(
      "bronze_users" -> s"$root/bronze/users",
      "silver_jasmin_model_performance" -> s"$root/silver/jasmin",
      "silver_streamate_model_performance" -> s"$root/silver/streamate",
      "silver_earnings_by_performer" -> s"$root/silver/earnings")
    t.users.write.parquet(locs("bronze_users"))
    t.jasminPerf.write.parquet(locs("silver_jasmin_model_performance"))
    t.streamatePerf.write.parquet(locs("silver_streamate_model_performance"))
    t.earningsByPerformer.write.parquet(locs("silver_earnings_by_performer"))
    try {
      LakeCatalog.registerLakeTables(spark, "lake_s3", locs)

      val fresh = spark.newSession()
      // catalog visible; temp views of the parent session are NOT
      assert(fresh.catalog.tableExists("lake_s3.bronze_users"))
      t.users.createOrReplaceTempView("only_in_parent")
      assert(!fresh.catalog.tableExists("only_in_parent"))

      fresh.catalog.setCurrentDatabase("lake_s3")
      val viaCatalog = SqlSurface.earningsByDay(fresh,
        "2024-09-01", "2024-09-30", "Medellín", "L1", "Zoe Do Santos")
        .collect().toSeq
      // cross-check against the temp-view path in the parent session
      SqlSurface.registerViews(spark, t)
      val viaViews = SqlSurface.earningsByDay(spark,
        "2024-09-01", "2024-09-30", "Medellín", "L1", "Zoe Do Santos")
        .collect().toSeq
      assert(viaCatalog.nonEmpty && viaCatalog == viaViews)

      // registration is idempotent
      LakeCatalog.registerLakeTables(spark, "lake_s3", locs)

      // re-registration at a NEW location re-points the table — a silent
      // keep-the-stale-path no-op would serve old data with no error
      val moved = s"$root/bronze/users_v2"
      t.users.limit(1).write.parquet(moved)
      LakeCatalog.registerExternalTable(spark, "lake_s3", "bronze_users", moved)
      assert(spark.table("lake_s3.bronze_users").count() == 1,
        "catalog must follow the location change")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS lake_s3 CASCADE")
      spark.catalog.setCurrentDatabase("default")
    }
  }
}
