package graft.etl

import org.apache.spark.sql.SparkSession

/** Persisted index hyperparameters — written once at build time,
  * READ (not re-supplied) by every append/probe. Banding and plane
  * parameters used to be caller-supplied defaults on every call; a
  * probe or append run with parameters differing from the build
  * silently yielded empty or wrong candidate sets. Now the build is
  * the only place the parameters enter: maintenance and serving read
  * them from the `_meta` table, and the one parameter that cannot be
  * persisted (a custom hash FUNCTION) is pinned by a persisted
  * identifier that [[validate]] checks — a mismatch is an error, not
  * an empty result.
  *
  * One tiny key/value table per index family (`<name>_meta`), written
  * with the index and registered in the same catalog, so the
  * parameters survive the cross-session metastore round trip with the
  * tables they describe (`graft.CatalogRoundTrip`).
  */
object IndexMeta {

  def table(name: String): String = s"${BatchLog.sanitize(name)}_meta"

  private def stageTable(name: String): String = s"${table(name)}__new"

  /** Replace the meta table via stage-then-swap (the [[ManifestTable]]
    * commit discipline on catalog tables): the replacement is durable
    * under `_meta__new` BEFORE the old table drops, so no crash point
    * loses both copies — the drop→rename window leaves `_meta` absent
    * but `_meta__new` complete, and [[read]] heals it by finishing the
    * rename. */
  def write(s: SparkSession, name: String,
      params: Map[String, String]): Unit = {
    import s.implicits._
    val tgt = table(name)
    val stage = stageTable(name)
    MinhashIndex.dropTable(s, stage)
    params.toSeq.sorted.toDF("key", "value")
      .coalesce(1) // a handful of rows; one file
      .write.format("parquet").saveAsTable(stage)
    MinhashIndex.dropTable(s, tgt)
    s.sql(s"ALTER TABLE $stage RENAME TO $tgt") // data follows the name
  }

  /** Heal-then-answer existence: finish a pending stage-swap rename
    * first ([[write]]'s drop→rename window leaves only `_meta__new`,
    * complete by construction), so a crash window never reads as "no
    * index" — the answer callers like
    * [[graft.streaming.ContinuousIngest]] use to decide build-vs-append,
    * where a false negative triggers a from-scratch rebuild that drops
    * the accumulated index. */
  def exists(s: SparkSession, name: String): Boolean = {
    val tgt = table(name)
    if (!s.catalog.tableExists(tgt) && s.catalog.tableExists(stageTable(name)))
      s.sql(s"ALTER TABLE ${stageTable(name)} RENAME TO $tgt")
    s.catalog.tableExists(tgt)
  }

  def read(s: SparkSession, name: String): Map[String, String] = {
    val tgt = table(name)
    // a crash between write()'s drop and rename leaves only the staged
    // copy — complete by construction, so finish the swap here
    if (!s.catalog.tableExists(tgt) && s.catalog.tableExists(stageTable(name)))
      s.sql(s"ALTER TABLE ${stageTable(name)} RENAME TO $tgt")
    require(s.catalog.tableExists(tgt),
      s"index '$name' has no $tgt table — built by an older " +
        "build, or the build crashed before its meta write; rebuild it")
    s.table(tgt).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Require caller-supplied values to match the build's. Used for the
    * non-persistable parameters (hash-function identity); everything
    * persistable is read from [[read]] instead of validated. */
  def validate(s: SparkSession, name: String,
      expected: (String, String)*): Unit =
    validateIn(read(s, name), name, expected: _*)

  /** [[validate]] against an already-read meta map — the per-probe paths
    * read the map once and both check and consume it, instead of paying
    * two driver collect jobs per probe (each read is a small Spark job;
    * the double read was ~0.3 s of the measured sf0.1 probe cost). */
  def validateIn(stored: Map[String, String], name: String,
      expected: (String, String)*): Unit =
    expected.foreach { case (k, v) =>
      require(stored.get(k).contains(v),
        s"index '$name' was built with $k=${stored.getOrElse(k, "<absent>")} " +
          s"but the caller passed $k=$v — probing with mismatched " +
          "parameters yields wrong candidates, refusing")
    }
}
