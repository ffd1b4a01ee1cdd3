package graft

import graft.etl.{FileBlooms, ManifestTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnExpr

/** [[FileBlooms]] — equality data skipping on manifest tables: sidecar
  * lifecycle (built on merge, carried forward, rebuilt by compaction,
  * removed by vacuum with its dir), file-level elimination a point lookup
  * can measure via `inputFiles`, and the conservative fallbacks that keep
  * every unprunable shape correct. */
class FileBloomsSpec extends SparkSpec {
  import org.scalatest.matchers.should.Matchers._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-blooms").toString

  /** Rows over two years with a unique string key; written through a
    * repartition so each partition unit holds several files. */
  private def fixture(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val y = if (i % 2 == 0) 2023 else 2024
      (s"k-$i", i.toLong, java.sql.Date.valueOf(s"$y-03-0${i % 9 + 1}"))
    }.toDF("sid", "v", "d").repartition(8)
  }

  test("readWhere with a bloom column equals read().filter — hit, miss, and IN") {
    val base = tmp()
    ManifestTable.mergeInto(spark, fixture(400), base,
      keys = Seq("sid", "d"), dateCol = "d", bloomCols = Seq("sid"))
    val all = ManifestTable.read(spark, base)
    for (pred <- Seq(col("sid") === "k-37", col("sid") === "nope",
        col("sid").isin("k-4", "k-7", "ghost"))) {
      val got = ManifestTable.readWhere(spark, base, pred)
        .orderBy("v").collect().map(_.getString(0)).toSeq
      val want = all.filter(pred).orderBy("v").collect().map(_.getString(0)).toSeq
      got shouldBe want
    }
  }

  test("a point lookup opens strictly fewer files than the table holds") {
    val base = tmp()
    withConf("spark.sql.files.maxRecordsPerFile" -> "50") {
      ManifestTable.mergeInto(spark, fixture(400), base,
        keys = Seq("sid", "d"), dateCol = "d", bloomCols = Seq("sid"))
    }
    val totalFiles = ManifestTable.read(spark, base).inputFiles.length
    assert(totalFiles > 4, s"fixture must span several files, got $totalFiles")
    val hit = ManifestTable.readWhere(spark, base, col("sid") === "k-37")
    hit.count() shouldBe 1L
    assert(hit.inputFiles.length < totalFiles,
      s"bloom pruning opened all $totalFiles files")
    // a value the table never held prunes every file (1% fp caveat: with
    // this few files a false positive would keep at most one)
    val miss = ManifestTable.readWhere(spark, base, col("sid") === "absent-key")
    assert(miss.inputFiles.length <= 1,
      s"miss lookup should eliminate ~all files, opened ${miss.inputFiles.length}")
    miss.count() shouldBe 0L
  }

  test("sidecars carry forward with untouched partitions and survive compaction") {
    import spark.implicits._
    val base = tmp()
    withConf("spark.sql.files.maxRecordsPerFile" -> "50") {
      ManifestTable.mergeInto(spark, fixture(200), base,
        keys = Seq("sid", "d"), dateCol = "d", bloomCols = Seq("sid"))
    }
    // second merge touches ONLY 2024 (odd i): 2023's unit + sidecar carry
    val batch = Seq(("k-9001", 9001L, java.sql.Date.valueOf("2024-05-05")))
      .toDF("sid", "v", "d")
    ManifestTable.mergeInto(spark, batch, base, keys = Seq("sid", "d"), dateCol = "d")
    val snap = ManifestTable.currentSnapshot(spark, base).get
    snap.bloomCols shouldBe Seq("sid") // table property persisted
    val lookupOld = ManifestTable.readWhere(spark, base, col("sid") === "k-38") // 2023 row
    lookupOld.count() shouldBe 1L
    val totalFiles = ManifestTable.read(spark, base).inputFiles.length
    assert(lookupOld.inputFiles.length < totalFiles)
    // the new batch's unit got its own sidecar: the fresh key prunes too
    val lookupNew = ManifestTable.readWhere(spark, base, col("sid") === "k-9001")
    lookupNew.count() shouldBe 1L
    assert(lookupNew.inputFiles.length < totalFiles)
    // clustered compaction restages EVERY unit -> sidecars rebuilt for
    // the new dirs (also the documented late-bloom backfill path)
    ManifestTable.compact(spark, base, targetFileBytes = 2048,
      clusterBy = Seq(col("v")))
    val afterCompact = ManifestTable.readWhere(spark, base, col("sid") === "k-38")
    afterCompact.count() shouldBe 1L
    val filesAfter = ManifestTable.read(spark, base).inputFiles.length
    assert(afterCompact.inputFiles.length < filesAfter ||
      filesAfter <= snap.parts.size, // fully compacted: one file per unit
      "compacted table lost its bloom pruning")
  }

  test("tables without bloom columns and pre-bloom units stay correct and unpruned") {
    val base = tmp()
    ManifestTable.mergeInto(spark, fixture(100), base,
      keys = Seq("sid", "d"), dateCol = "d") // no bloomCols
    ManifestTable.currentSnapshot(spark, base).get.bloomCols shouldBe Nil
    val got = ManifestTable.readWhere(spark, base, col("sid") === "k-5")
    got.count() shouldBe 1L
    // declaring the column later applies to units staged AFTER the declaration
    import spark.implicits._
    val batch = Seq(("k-late", 7777L, java.sql.Date.valueOf("2023-06-06")))
      .toDF("sid", "v", "d")
    ManifestTable.mergeInto(spark, batch, base, keys = Seq("sid", "d"),
      dateCol = "d", bloomCols = Seq("sid"))
    ManifestTable.currentSnapshot(spark, base).get.bloomCols shouldBe Seq("sid")
    ManifestTable.readWhere(spark, base, col("sid") === "k-late")
      .count() shouldBe 1L
  }

  test("a probe of the wrong kind never prunes — coercion shapes stay correct") {
    import spark.implicits._
    val base = tmp()
    // blooms on BOTH the string key and the long value column
    ManifestTable.mergeInto(spark, fixture(100), base,
      keys = Seq("sid", "d"), dateCol = "d", bloomCols = Seq("sid", "v"))
    val all = ManifestTable.read(spark, base)
    // string literal on the LONG column: the filter was fed putLong, so
    // mightContainString proves nothing — constraint must drop and the
    // matching row must survive (Spark casts "37" to 37L)
    val got = ManifestTable.readWhere(spark, base, $"v" === "37")
      .collect().map(_.getString(0)).toSeq
    got shouldBe Seq("k-37")
    // int literal on the STRING column: same in reverse (coerces to a
    // numeric compare; no bloom elimination may fire)
    val got2 = ManifestTable.readWhere(spark, base, $"sid" === 7)
      .collect().map(_.getString(0)).toSeq
    got2 shouldBe all.filter($"sid" === 7).collect().map(_.getString(0)).toSeq
    // and the kind-matched probes still prune as before
    assert(ManifestTable.readWhere(spark, base, $"v" === 37L).count() == 1L)
    assert(FileBlooms.soundProbes(org.apache.spark.sql.types.LongType,
      Seq(FileBlooms.Probe(Seq(java.lang.Long.valueOf(3L))))))
    assert(!FileBlooms.soundProbes(org.apache.spark.sql.types.LongType,
      Seq(FileBlooms.Probe(Seq("3")))))
    assert(!FileBlooms.soundProbes(org.apache.spark.sql.types.StringType,
      Seq(FileBlooms.Probe(Seq(java.lang.Long.valueOf(3L))))))
  }

  test("equalitiesOf extracts conjunctive = and IN, ignores everything else") {
    import spark.implicits._
    val eqs = FileBlooms.equalitiesOf(ColumnExpr.expr(
      $"a" === "x" && $"b".isin(1, 2, 3) && $"c" > 5 && ($"d" === 1 || $"e" === 2)))
    eqs.keySet shouldBe Set("a", "b")
    eqs("a").flatMap(_.values) shouldBe Seq("x")
    eqs("b").flatMap(_.values) shouldBe Seq(1L, 2L, 3L)
    // double literals are outside the canonical domain -> no constraint
    FileBlooms.equalitiesOf(ColumnExpr.expr($"f" === 1.5)) shouldBe Map.empty
    // repeated conjuncts on one column all apply
    val both = FileBlooms.equalitiesOf(ColumnExpr.expr(
      $"a" === "x" && $"a".isin("x", "y")))
    both("a").size shouldBe 2
  }

  test("the sidecar is invisible to plain reads and removed by vacuum with its dir") {
    val base = tmp()
    ManifestTable.mergeInto(spark, fixture(100), base,
      keys = Seq("sid", "d"), dateCol = "d", bloomCols = Seq("sid"))
    ManifestTable.read(spark, base).count() shouldBe 100L
    val fsys = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap1 = ManifestTable.currentSnapshot(spark, base).get
    val oldUnit = new Path(s"$base/data/${snap1.parts(2023)}/part_year=2023")
    assert(fsys.exists(FileBlooms.sidecarPath(oldUnit)), "sidecar missing after merge")
    // rewrite everything, vacuum history: the old unit dir (and its
    // sidecar) must be gone
    ManifestTable.compact(spark, base, clusterBy = Seq(col("v")))
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    assert(!fsys.exists(oldUnit), "vacuum left the superseded unit")
    ManifestTable.readWhere(spark, base, col("sid") === "k-5").count() shouldBe 1L
  }
}
