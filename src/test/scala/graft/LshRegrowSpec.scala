package graft

import graft.etl.{IndexMeta, LshIndex, MinhashIndex}
import org.apache.spark.sql.functions._

/** Geometry regrowth for the persisted LSH ANN index: the plane count
  * follows the accumulated corpus, the serving flip is atomic through
  * IndexMeta, and every crash window either keeps the OLD geometry
  * serving or leaves only a sweepable stale table — never a probe
  * bucketing differently from its index.
  */
class LshRegrowSpec extends SparkSpec {
  import spark.implicits._

  private val emb = graft.core.T(spark, sf0001, "embeddings")

  private def drop(names: String*): Unit = names.foreach(LshIndex.dropAll(spark, _))

  private def results(name: String) =
    LshIndex.search(spark, emb.filter($"vec_id" < 10), name)
      .collect().map(_.toSeq).toSet

  test("regrow no-ops while the recorded geometry still holds occupancy") {
    try {
      LshIndex.build(spark, emb, "rgspec_noop")
      val before = results("rgspec_noop")
      val meta = IndexMeta.read(spark, "rgspec_noop")
      assert(!LshIndex.regrow(spark, "rgspec_noop", targetOccupancy = 256),
        "default occupancy admits this corpus at the build planes")
      assert(IndexMeta.read(spark, "rgspec_noop") == meta, "meta untouched")
      assert(results("rgspec_noop") == before)
    } finally drop("rgspec_noop")
  }

  test("regrow widens the planes and answers exactly like a fresh build at the derived geometry") {
    try {
      LshIndex.build(spark, emb, "rgspec_grow")
      val n = emb.count()
      val want = LshIndex.autoPlanes(n, targetOccupancy = 16)
      assert(want > 4, s"fixture must force growth, derived $want")
      assert(LshIndex.regrow(spark, "rgspec_grow", targetOccupancy = 16))
      val meta = IndexMeta.read(spark, "rgspec_grow")
      assert(meta("planes_per_table").toInt == want)
      assert(meta("generation") == "1")
      assert(meta("buckets_table") == "rgspec_grow_buckets_g1")
      assert(!meta.contains("stale_buckets_table"), "clean finish sweeps")
      assert(!spark.catalog.tableExists("rgspec_grow_buckets"),
        "generation-0 table dropped after the flip")
      // exactness: a regrown index IS a fresh build at the derived params
      LshIndex.build(spark, emb, "rgspec_ref", planesPerTable = want)
      assert(results("rgspec_grow") == results("rgspec_ref"))
      assert(results("rgspec_grow").nonEmpty)
      // probes stay corpus-exchange-free against the generation table
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val p = LshIndex.search(spark, emb.filter($"vec_id" < 10), "rgspec_grow")
        PlanChecks.assertCorpusInPlace(p, "rgspec_grow", expectedScans = 2)
      }
      // a second regrow at the same occupancy is a no-op (converged)
      assert(!LshIndex.regrow(spark, "rgspec_grow", targetOccupancy = 16))
    } finally drop("rgspec_grow", "rgspec_ref")
  }

  test("appends after a regrow follow the new geometry; exists() survives the generation flip") {
    try {
      LshIndex.build(spark, emb.filter($"vec_id" % 3 =!= 0), "rgspec_app")
      assert(LshIndex.regrow(spark, "rgspec_app", targetOccupancy = 16))
      assert(LshIndex.exists(spark, "rgspec_app"),
        "existence must resolve the serving generation, not the fixed name")
      LshIndex.append(spark, emb.filter($"vec_id" % 3 === 0), "rgspec_app", "b1")
      val want = IndexMeta.read(spark, "rgspec_app")("planes_per_table").toInt
      LshIndex.build(spark, emb, "rgspec_app_ref", planesPerTable = want)
      assert(results("rgspec_app") == results("rgspec_app_ref"),
        "append after regrow must land under the regrown planes")
    } finally drop("rgspec_app", "rgspec_app_ref")
  }

  test("crash while building the new generation: old geometry serves; retry converges") {
    try {
      LshIndex.build(spark, emb, "rgspec_crash")
      val before = results("rgspec_crash")
      // plant the partial table a crashed regrow leaves: some rows under
      // the next generation's name, meta NEVER flipped
      MinhashIndex.writeBucketed(
        Seq((1L, 0, 99L)).toDF("vec_id", "tbl", "bucket"),
        "rgspec_crash_buckets_g1", 32, append = false, "00000-regrow-dead",
        "tbl", "bucket")
      assert(results("rgspec_crash") == before,
        "probes must keep serving the old generation")
      assert(LshIndex.regrow(spark, "rgspec_crash", targetOccupancy = 16),
        "retry must drop the partial table and rebuild")
      val want = LshIndex.autoPlanes(emb.count(), 16)
      LshIndex.build(spark, emb, "rgspec_crash_ref", planesPerTable = want)
      assert(results("rgspec_crash") == results("rgspec_crash_ref"))
    } finally drop("rgspec_crash", "rgspec_crash_ref")
  }

  test("exists() heals a pending meta stage-swap instead of reporting absent") {
    try {
      LshIndex.build(spark, emb, "rgspec_heal")
      val before = results("rgspec_heal")
      // plant IndexMeta.write's crash window: target dropped, the
      // complete replacement still under the stage name. A plain
      // tableExists probe here says "no index" — and a build-vs-append
      // caller would rebuild from one batch, truncating the index.
      spark.sql("ALTER TABLE rgspec_heal_meta RENAME TO rgspec_heal_meta__new")
      assert(LshIndex.exists(spark, "rgspec_heal"),
        "exists must finish the pending meta rename, not report absent")
      assert(spark.catalog.tableExists("rgspec_heal_meta"), "swap finished")
      assert(results("rgspec_heal") == before, "probes unchanged after heal")
    } finally drop("rgspec_heal")
  }

  test("exists() heals a pending compaction-fold swap on the serving tables") {
    try {
      LshIndex.build(spark, emb, "rgspec_fold")
      val before = results("rgspec_fold")
      // plant IndexCompaction's crash window: the serving buckets table
      // dropped, its complete replacement still staged under __compact
      spark.sql(
        "ALTER TABLE rgspec_fold_buckets RENAME TO rgspec_fold_buckets__compact")
      assert(LshIndex.exists(spark, "rgspec_fold"),
        "exists must finish the pending fold rename, not report absent")
      assert(spark.catalog.tableExists("rgspec_fold_buckets"))
      assert(results("rgspec_fold") == before, "probes unchanged after heal")
    } finally drop("rgspec_fold")
  }

  test("exists() refuses to report absent when committed batches would be lost") {
    try {
      LshIndex.build(spark, emb, "rgspec_loud")
      // destroy a serving table in a way NO crash window produces (no
      // stage left behind) — with a committed build on record, 'absent'
      // would route the caller into a truncating rebuild
      spark.sql("DROP TABLE rgspec_loud_vectors")
      val e = intercept[IllegalArgumentException](
        LshIndex.exists(spark, "rgspec_loud"))
      assert(e.getMessage.contains("committed"), s"loud, explanatory: ${e.getMessage}")
    } finally drop("rgspec_loud")
  }

  test("dropAll and build sweep an unflipped next-generation orphan") {
    try {
      LshIndex.build(spark, emb, "rgspec_orphan")
      // plant the regrow crash window AFTER staging generation 1 but
      // BEFORE the meta flip: the g1 table is referenced by nothing
      MinhashIndex.writeBucketed(
        Seq((1L, 0, 5L)).toDF("vec_id", "tbl", "bucket"),
        "rgspec_orphan_buckets_g1", 32, append = false, "00000-regrow-dead",
        "tbl", "bucket")
      LshIndex.build(spark, emb, "rgspec_orphan") // rebuild sweeps it
      assert(!spark.catalog.tableExists("rgspec_orphan_buckets_g1"),
        "rebuild must sweep the orphaned next-generation table")
      MinhashIndex.writeBucketed(
        Seq((1L, 0, 5L)).toDF("vec_id", "tbl", "bucket"),
        "rgspec_orphan_buckets_g1", 32, append = false, "00000-regrow-dead",
        "tbl", "bucket")
      LshIndex.dropAll(spark, "rgspec_orphan")
      assert(!spark.catalog.tableExists("rgspec_orphan_buckets_g1"),
        "dropAll must sweep the orphaned next-generation table")
    } finally drop("rgspec_orphan")
  }

  test("crash between flip and drop: stale generation swept on the next regrow entry") {
    try {
      LshIndex.build(spark, emb, "rgspec_stale")
      assert(LshIndex.regrow(spark, "rgspec_stale", targetOccupancy = 16))
      // plant the state a crash right after the meta flip leaves: the
      // old table still on disk and recorded as stale
      MinhashIndex.writeBucketed(
        Seq((1L, 0, 7L)).toDF("vec_id", "tbl", "bucket"),
        "rgspec_stale_dead", 32, append = false, "00000-regrow-dead",
        "tbl", "bucket")
      IndexMeta.write(spark, "rgspec_stale",
        IndexMeta.read(spark, "rgspec_stale") +
          ("stale_buckets_table" -> "rgspec_stale_dead"))
      val before = results("rgspec_stale")
      assert(!LshIndex.regrow(spark, "rgspec_stale", targetOccupancy = 16),
        "geometry already converged — entry only sweeps")
      assert(!spark.catalog.tableExists("rgspec_stale_dead"), "stale swept")
      assert(!IndexMeta.read(spark, "rgspec_stale").contains("stale_buckets_table"))
      assert(results("rgspec_stale") == before)
    } finally drop("rgspec_stale")
  }
}
