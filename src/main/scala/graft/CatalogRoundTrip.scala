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
    // the corpus-side MinHash index is built ONCE here; its bucketing
    // must travel with the table through the metastore
    val newBatch = org.apache.spark.sql.functions.col("doc_id") % 10 === 0
    graft.etl.MinhashIndex.build(s1,
      s1.read.parquet(s"$sfDir/documents.parquet").filter(!newBatch), "mh_rt")
    println(s"[catalog] session1 registered, nation rows=$n1")
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val s2 = LakeCatalog.persistentBuilder("local[2]", 4, wh, ms).getOrCreate()
    s2.sparkContext.setLogLevel("ERROR")
    // NO registration here — the definitions must come from the metastore
    require(s2.catalog.tableExists("lake.nation"),
      "session 2 must see the table registered by session 1")
    // the index built by session 1 answers probes here — with its
    // BUCKETING intact (no corpus-side shuffle before the first join),
    // which is the whole point of registering it in a real metastore:
    // on a cluster the build job and every probe job are different JVMs
    require(s2.catalog.tableExists("mh_rt_banded"),
      "session 2 must see the index tables built by session 1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val newBatch2 = org.apache.spark.sql.functions.col("doc_id") % 10 === 0
    val batch2 = s2.read.parquet(s"$sfDir/documents.parquet").filter(newBatch2)
    val probe = graft.etl.MinhashIndex.incrementalPairs(s2, batch2, "mh_rt")
    val pairs = probe.collect()
    require(pairs.nonEmpty, "probe must find the planted near-dups")
    locally {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      var violations = List.empty[String]
      def raw(n: SparkPlan): Seq[String] = n match {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("mh_rt")) =>
          Seq(f.relation.location.rootPaths.mkString)
        case _: BaseJoinExec => n.children.foreach(raw); Seq.empty
        case sh: ShuffleExchangeExec =>
          violations ++= sh.children.flatMap(raw); Seq.empty
        case other => other.children.flatMap(raw)
      }
      raw(probe.queryExecution.executedPlan)
      require(violations.isEmpty,
        s"cross-session probe shuffled the corpus side: $violations")
    }
    s2.conf.unset("spark.sql.adaptive.enabled")
    s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    println(s"[catalog] session2 probed session1's bucketed minhash index " +
      s"exchange-free: pairs=${pairs.length}")
    // the hyperparameter table travels with the index — session 2's
    // probe above already READ it (incrementalPairs takes no banding
    // params); assert it explicitly, and that a mismatched hash id is
    // an error here too
    require(s2.catalog.tableExists("mh_rt_meta"),
      "session 2 must see the _meta table written by session 1's build")
    require(graft.etl.IndexMeta.read(s2, "mh_rt")("bands") == "8")
    val metaErr =
      try { graft.etl.MinhashIndex.incrementalPairs(s2, batch2, "mh_rt",
        hashFnId = "md5-portable"); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("hash_fn") }
    require(metaErr, "cross-session param mismatch must be an error")
    // exactly-once survives the session boundary too: session 2 appends
    // a batch, and a blind replay (new JVM tomorrow, same batch id) is a
    // no-op because the committed batch log lives in the warehouse
    val sizesBefore = s2.table("mh_rt_sizes").count()
    val appendBatch = batch2.limit(3)
    graft.etl.MinhashIndex.append(s2, appendBatch, "mh_rt", "rt-b1")
    val sizesAfter = s2.table("mh_rt_sizes").count()
    require(sizesAfter > sizesBefore, "append must add the batch's rows")
    graft.etl.MinhashIndex.append(s2, appendBatch, "mh_rt", "rt-b1")
    require(s2.table("mh_rt_sizes").count() == sizesAfter,
      "a replayed append in a later session must be a no-op")
    println(s"[catalog] session2 appended batch rt-b1 exactly once " +
      s"(sizes $sizesBefore -> $sizesAfter, replay no-op), meta intact")
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
