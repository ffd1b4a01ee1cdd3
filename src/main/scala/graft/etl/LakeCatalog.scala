package graft.etl

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession

/** S3 full parity — persistent catalog tables over the lake zones.
  *
  * The reference's Glue database + crawler-registered tables
  * (`data-lake-stack.yml:16-22,218-276`) are a metastore any session can
  * query by name. The Spark-native analog is `CREATE TABLE ... USING
  * parquet LOCATION` (external — registration never moves data):
  *
  *  - within one deployment, the definitions live in the metastore
  *    ([[persistentBuilder]] wires the bundled Hive/derby one), so a
  *    brand-new session runs `spark.table("lake.bronze_users")` — no
  *    per-session view re-registration, exactly the Glue behavior;
  *  - the table names double as the SQL surface's relation names:
  *    `setCurrentDatabase(db)` and every [[graft.domain.SqlSurface]]
  *    query runs unchanged against the catalog.
  *
  * At 100 TB the catalog is the contract that makes partition pruning
  * and bucketed layouts ([[LakeLayout]]) reusable across jobs — the
  * scan metadata lives with the table, not in each query's code.
  */
object LakeCatalog {

  val defaultDb = "lake"

  /** The reference's four lake relations (SURVEY §2.1) keyed by the name
    * the SQL surface queries them under. */
  val lakeTableNames: Seq[String] = Seq(
    "bronze_users",
    "silver_jasmin_model_performance",
    "silver_streamate_model_performance",
    "silver_earnings_by_performer")

  /** Session builder whose catalog SURVIVES the session: Hive metastore
    * on embedded derby at `metastoreDir` (the jars ship with Spark).
    * Two sequential sessions on the same dirs see the same tables. */
  def persistentBuilder(master: String, shufflePartitions: Int,
      warehouseDir: String, metastoreDir: String): SparkSession.Builder =
    GraftSession.builder(master, shufflePartitions)
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastoreDir;create=true")
      .enableHiveSupport()

  /** Register one external parquet table; idempotent, no data movement.
    *
    * Idempotent is not the same as first-writer-wins: if the table is
    * already registered at a DIFFERENT location, a bare `IF NOT EXISTS`
    * would silently keep the stale path and every reader would get old
    * data with no error. Registration is metadata-only for external
    * tables, so a location change drops and re-creates the entry. */
  def registerExternalTable(spark: SparkSession, db: String, table: String,
      location: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${q(db)}")
    if (spark.catalog.tableExists(s"$db.$table")) {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
      val hconf = spark.sparkContext.hadoopConfiguration
      def qualified(p: String) = {
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(hconf).makeQualified(path)
      }
      if (qualified(meta.location.toString) == qualified(location))
        return // same table, same data — true no-op
      spark.sql(s"DROP TABLE ${q(db)}.${q(table)}")
    }
    spark.sql(
      s"""CREATE TABLE ${q(db)}.${q(table)}
          USING parquet LOCATION '${location.replace("'", "''")}'""")
  }

  /** Register the four lake zones under `db` and make it current, so the
    * SQL surface's bare relation names resolve through the catalog. */
  def registerLakeTables(spark: SparkSession, db: String,
      locations: Map[String, String]): Unit = {
    lakeTableNames.foreach { t =>
      registerExternalTable(spark, db, t,
        locations.getOrElse(t,
          sys.error(s"no location for lake table $t")))
    }
    spark.catalog.setCurrentDatabase(db)
  }

  /** Collect table + column statistics into the catalog — what turns
    * Catalyst's cost-based optimizer on for REGISTERED tables. Without
    * column stats a filter's output is estimated at input size, so a
    * selective dim-side predicate still plans a sort-merge join; with
    * them CBO estimates the filtered cardinality and picks a broadcast
    * join on its own, no hint (CatalogStatsSpec proves the flip on the
    * executed plan). At 100 TB this is the Glue-crawler/ANALYZE step of
    * any warehouse deployment: run it per table refresh, and join
    * strategy stops depending on hand-placed hints. */
  def analyze(spark: SparkSession, table: String,
      columns: Seq[String] = Nil): Unit = {
    // quote each dotted part, same convention as registerExternalTable —
    // a hyphenated/keyword table name must survive the refresh loop too
    val qt = table.split('.').map(q).mkString(".")
    spark.sql(s"ANALYZE TABLE $qt COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $qt COMPUTE STATISTICS FOR COLUMNS " +
        columns.map(q).mkString(", "))
    else
      spark.sql(s"ANALYZE TABLE $qt COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  private def q(id: String) = "`" + id.replace("`", "``") + "`"
}
