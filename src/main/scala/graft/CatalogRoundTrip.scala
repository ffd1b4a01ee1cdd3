package graft

import graft.etl.LakeCatalog
import org.apache.spark.sql.SparkSession

/** Proof of S3 catalog persistence ACROSS sessions: session 1 registers
  * the lake tables in a Hive/derby metastore and stops; session 2 boots
  * on the same metastore and queries them by name WITHOUT any
  * registration — the Glue-database behavior the temp-view surface
  * couldn't give. Run via the verify skill. */
object CatalogRoundTrip {
  def main(args: Array[String]): Unit = {
    val work =
      if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft_catalog").toString
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val wh = s"$work/warehouse"
    val ms = s"$work/metastore_db"

    val s1 = LakeCatalog.persistentBuilder("local[2]", 4, wh, ms).getOrCreate()
    s1.sparkContext.setLogLevel("ERROR")
    LakeCatalog.registerExternalTable(s1, "lake", "nation", s"$sfDir/nation.parquet")
    LakeCatalog.registerExternalTable(s1, "lake", "region", s"$sfDir/region.parquet")
    val n1 = s1.table("lake.nation").count()
    println(s"[catalog] session1 registered, nation rows=$n1")
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val s2 = LakeCatalog.persistentBuilder("local[2]", 4, wh, ms).getOrCreate()
    s2.sparkContext.setLogLevel("ERROR")
    // NO registration here — the definitions must come from the metastore
    require(s2.catalog.tableExists("lake.nation"),
      "session 2 must see the table registered by session 1")
    s2.catalog.setCurrentDatabase("lake")
    val joined = s2.sql(
      """SELECT r.r_name, COUNT(*) AS n
         FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY r.r_name""").count()
    val n2 = s2.table("lake.nation").count()
    println(s"[catalog] session2 sees persisted tables with no registration: " +
      s"nation rows=$n2, regions joined=$joined")
    require(n1 == n2 && joined > 0)
    s2.stop()
  }
}
