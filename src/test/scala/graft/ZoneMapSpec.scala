package graft

import graft.etl.{ManifestTable, ZoneMaps}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Zone-map file skipping on manifest tables: [[ManifestTable.readWhere]]
  * must ALWAYS return exactly `read(...).filter(p)` (pruning is an
  * elimination proof, never a semantics change), and after clustered
  * compaction a selective predicate must open strictly fewer files than
  * the full scan. */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, String, Double)]) =
    rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))

  private def mkTable(prefix: String, rows: Seq[(String, String, Double)]): String = {
    val base = Files.createTempDirectory(prefix).toString + "/fact"
    ManifestTable.mergeInto(spark, frame(rows), base, Seq("id", "date"), "date")
    base
  }

  private def sameRows(base: String, pred: org.apache.spark.sql.Column): Unit = {
    val got = ManifestTable.readWhere(spark, base, pred)
      .select($"id", $"date".cast("string"), $"v").collect().toSet
    val want = ManifestTable.read(spark, base).filter(pred)
      .select($"id", $"date".cast("string"), $"v").collect().toSet
    assert(got == want, s"readWhere diverged from read+filter for $pred")
  }

  // 2000 rows, v = 0..1999, all in 2023 so clustering (not partitioning)
  // is what separates the files
  private def clusteredBase(): String = {
    val rows = (0 until 2000).map(i => (s"k$i", f"2023-${i % 12 + 1}%02d-15", i.toDouble))
    val base = mkTable("zm", rows)
    // small target => several files, range-clustered on v
    ManifestTable.compact(spark, base, targetFileBytes = 2048,
      clusterBy = Seq(col("v")))
    base
  }

  test("pruned read equals full read + filter, and opens fewer files") {
    val base = clusteredBase()
    val pred = $"v" >= 200.0 && $"v" < 400.0
    sameRows(base, pred)
    val all = ManifestTable.read(spark, base).inputFiles.length
    val pruned = ManifestTable.readWhere(spark, base, pred).inputFiles.length
    assert(all >= 3, s"compaction should have produced several files, got $all")
    assert(pruned < all,
      s"selective range over clustered files must skip some: $pruned vs $all")
    // stats got recorded for every unit of the compacted snapshot
    val snap = ManifestTable.currentSnapshot(spark, base).get
    assert(snap.statsUnits.nonEmpty && snap.fileStats.nonEmpty)
    assert(snap.fileStats.values.forall(_.contains("v")))
  }

  test("date-typed bounds prune in the epoch-day domain") {
    val rows = (0 until 1200).map { i =>
      (s"k$i", f"2023-${i / 100 + 1}%02d-${i % 28 + 1}%02d", i.toDouble)
    }
    val base = mkTable("zmdate", rows)
    ManifestTable.compact(spark, base, targetFileBytes = 2048,
      clusterBy = Seq(col("date")))
    val pred = $"date" >= lit(java.sql.Date.valueOf("2023-09-01"))
    sameRows(base, pred)
    val all = ManifestTable.read(spark, base).inputFiles.length
    val pruned = ManifestTable.readWhere(spark, base, pred).inputFiles.length
    assert(all >= 3 && pruned < all,
      s"date range over date-clustered files must skip: $pruned vs $all")
  }

  test("part_year constraints eliminate whole partitions at plan time") {
    val base = mkTable("zmyear", Seq(
      ("a", "2022-03-01", 1.0), ("b", "2023-03-01", 2.0), ("c", "2024-03-01", 3.0)))
    sameRows(base, $"part_year" === 2023)
    val files = ManifestTable.readWhere(spark, base, $"part_year" === 2023).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("part_year=2023")))
  }

  test("an all-null column file is provably skippable") {
    // 2022 has only null v; a v-range predicate must not open it
    val withNull = Seq(("a", "2022-03-01", 1.0), ("b", "2023-03-01", 7.0))
      .toDF("id", "date", "v").withColumn("date", to_date($"date"))
      .withColumn("v", when($"id" === "a", lit(null).cast("double")).otherwise($"v"))
    val base = Files.createTempDirectory("zmnull").toString + "/fact"
    ManifestTable.mergeInto(spark, withNull, base, Seq("id", "date"), "date")
    val pred = $"v" > 0.0
    sameRows(base, pred)
    val files = ManifestTable.readWhere(spark, base, pred).inputFiles
    assert(files.forall(!_.contains("part_year=2022")),
      "comparisons never match NULL — the all-null partition's file must be skipped")
  }

  test("a pre-stats manifest prunes nothing but stays correct, then heals") {
    val base = clusteredBase()
    // simulate a legacy manifest: strip every stats line in place
    val snap = ManifestTable.currentSnapshot(spark, base).get
    val mf = new java.io.File(s"$base/_manifests/v${"%05d".format(snap.version)}.txt")
    val kept = scala.io.Source.fromFile(mf).getLines()
      .filterNot(l => l.startsWith("#filestats") || l.startsWith("#statsunit"))
      .mkString("\n")
    val w = new java.io.PrintWriter(mf); w.write(kept); w.close()

    // hadoop's LocalFileSystem keeps a .crc sidecar for the manifest;
    // the in-place rewrite above invalidates it
    new java.io.File(mf.getParent, s".${mf.getName}.crc").delete()

    val legacy = ManifestTable.currentSnapshot(spark, base).get
    assert(legacy.fileStats.isEmpty && legacy.statsUnits.isEmpty)
    val pred = $"v" >= 200.0 && $"v" < 400.0
    sameRows(base, pred) // zero pruning, same answer
    assert(ManifestTable.readWhere(spark, base, pred).inputFiles.length ==
      ManifestTable.read(spark, base).inputFiles.length)

    // any next commit footer-scans the uncovered units: the table heals
    ManifestTable.mergeInto(spark,
      frame(Seq(("new", "2023-06-06", 500.0))), base, Seq("id", "date"), "date")
    val healed = ManifestTable.currentSnapshot(spark, base).get
    assert(healed.statsUnits.nonEmpty && healed.fileStats.nonEmpty)
    sameRows(base, pred)
  }

  test("stats survive merge + deleteWhere and pruning stays exact") {
    val base = clusteredBase()
    assert(ManifestTable.deleteWhere(spark, base, $"v" >= 1900.0) == 100L)
    val pred = $"v" >= 200.0 && $"v" < 400.0
    sameRows(base, pred)
    sameRows(base, $"v" >= 1500.0) // range overlapping the deleted tail
    val snap = ManifestTable.currentSnapshot(spark, base).get
    // every referenced unit is covered after the delete's commit
    val units = snap.parts.toSeq.map { case (y, d) => s"$d/part_year=$y" }
    assert(units.forall(snap.statsUnits.contains))
  }

  test("constraint extraction honors strictness and IN-lists") {
    def ranges(c: org.apache.spark.sql.Column) = ZoneMaps.constraintsOf(
      org.apache.spark.sql.graft.ColumnExpr.expr(c))
    val st = Map("v" -> ZoneMaps.ColStats(Some((BigDecimal(10), BigDecimal(20))), 0, 5))

    assert(!ZoneMaps.mayMatch(st, ranges($"v" > 20.0)), "strict > max must skip")
    assert(ZoneMaps.mayMatch(st, ranges($"v" >= 20.0)), ">= max may match")
    assert(!ZoneMaps.mayMatch(st, ranges($"v" < 10.0)), "strict < min must skip")
    assert(ZoneMaps.mayMatch(st, ranges($"v" <= 10.0)), "<= min may match")
    assert(!ZoneMaps.mayMatch(st, ranges($"v" === 25.0)))
    assert(ZoneMaps.mayMatch(st, ranges($"v" === 15.0)))
    assert(!ZoneMaps.mayMatch(st, ranges($"v".isin(1.0, 2.0, 5.0))),
      "IN-list entirely below min must skip")
    assert(ZoneMaps.mayMatch(st, ranges($"v".isin(1.0, 15.0))))
    // mirrored literal-first comparison
    assert(!ZoneMaps.mayMatch(st, ranges(lit(25.0) < $"v")))
    // an OR tree contributes nothing: conservative keep
    assert(ZoneMaps.mayMatch(st, ranges($"v" > 30.0 || $"v" < 5.0)))
    // unknown conjuncts are dropped, known ones still prune
    assert(!ZoneMaps.mayMatch(st, ranges($"v" > 20.0 && length($"id") > 2)))
  }

  test("string-column bounds prune in the unsigned-byte domain (schema-on-read dates)") {
    // the reference's silver layer keeps dates as STRINGS (SURVEY §1.3):
    // a range predicate on a string-typed date column must prune files
    // once they are clustered by it — the round-10 review's one named
    // zone-map gap
    val rows = (0 until 1200).map { i =>
      (s"k$i", f"2023-${i / 100 + 1}%02d-${i % 28 + 1}%02d", i.toDouble)
    }
    val base = Files.createTempDirectory("zmstr").toString + "/fact"
    val df = rows.toDF("id", "ds", "v").withColumn("date", to_date($"ds"))
    ManifestTable.mergeInto(spark, df, base, Seq("id", "date"), "date")
    ManifestTable.compact(spark, base, targetFileBytes = 4096,
      clusterBy = Seq(col("ds")))
    val pred = $"ds" >= "2023-09-01" && $"ds" < "2023-11-01"
    val got = ManifestTable.readWhere(spark, base, pred)
      .select($"id", $"ds", $"v").collect().toSet
    val want = ManifestTable.read(spark, base).filter(pred)
      .select($"id", $"ds", $"v").collect().toSet
    assert(got == want, "string pruning must never change results")
    val all = ManifestTable.read(spark, base).inputFiles.length
    val pruned = ManifestTable.readWhere(spark, base, pred).inputFiles.length
    assert(all >= 3 && pruned < all,
      s"string range over ds-clustered files must skip: $pruned vs $all")
    // the manifest actually carries string bounds for ds
    val snap = ManifestTable.currentSnapshot(spark, base).get
    assert(snap.fileStats.values.exists(_.get("ds").exists(_.strBounds.isDefined)))
  }

  test("truncated string stats stay loose-but-valid: conservative keep, sound prune") {
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "parquet.statistics.truncate.length"
    val prev = Option(hc.get(key))
    hc.setInt(key, 8)
    try {
      // two value families sharing >8-byte prefixes, so truncation bites:
      // real values are invisible to the stats, only loose bounds remain
      val rows = (0 until 400).map { i =>
        val fam = if (i < 200) "aaaaaaaa" else "bbbbbbbb"
        (s"k$i", "2023-05-15", f"${fam}_$i%04d", i.toDouble)
      }
      val base = Files.createTempDirectory("zmtrunc").toString + "/fact"
      ManifestTable.mergeInto(spark,
        rows.toDF("id", "date", "s", "v").withColumn("date", to_date($"date")),
        base, Seq("id", "date"), "date")
      ManifestTable.compact(spark, base, targetFileBytes = 2048,
        clusterBy = Seq(col("s")))
      val snap = ManifestTable.currentSnapshot(spark, base).get
      val sBounds = snap.fileStats.values.flatMap(_.get("s")).flatMap(_.strBounds)
      assert(sBounds.nonEmpty && sBounds.forall { case (mn, mx) =>
        mn.length <= 8 && mx.length <= 8
      }, s"fixture must produce truncated bounds, got $sBounds")
      // sound prune: the whole b-family sits above this range even
      // through loose bounds — those files skip, results stay exact
      val below = $"s" >= "aaaaaaaa_0050" && $"s" < "aaaaaaaa_0150"
      val gotB = ManifestTable.readWhere(spark, base, below)
        .select($"s").collect().toSet
      val wantB = ManifestTable.read(spark, base).filter(below)
        .select($"s").collect().toSet
      assert(gotB == wantB && gotB.nonEmpty)
      val all = ManifestTable.read(spark, base).inputFiles.length
      assert(all >= 3, s"fixture needs several files, got $all")
      assert(ManifestTable.readWhere(spark, base, below).inputFiles.length < all,
        "truncated bounds must still prune provably-out files")
      // conservative keep: no a-family row is >= _9999, but the a-files'
      // TRUNCATED max ('aaaaaaab') cannot prove that — they are kept,
      // and the re-applied filter returns the exact (empty) answer
      val gap = $"s" >= "aaaaaaaa_9999" && $"s" < "aaaaaaab"
      assert(ManifestTable.readWhere(spark, base, gap).count() == 0)
      val keptGap = ManifestTable.readWhere(spark, base, gap).inputFiles.length
      assert(keptGap > 0,
        "a file whose truncated bounds admit the range must be KEPT — " +
          "pruning on loose bounds may only ever eliminate provable misses")
    } finally {
      prev match { case Some(v) => hc.set(key, v); case None => hc.unset(key) }
    }
  }

  test("string constraint extraction honors strictness, IN-lists, and domain gates") {
    def cons(c: org.apache.spark.sql.Column) = ZoneMaps.allConstraintsOf(
      org.apache.spark.sql.graft.ColumnExpr.expr(c))
    val st = Map("s" -> ZoneMaps.ColStats(None, 0, 5,
      strBounds = Some(("bbb", "ddd"))))
    assert(!ZoneMaps.mayMatchStr(st, cons($"s" > "ddd").str), "strict > max must skip")
    assert(ZoneMaps.mayMatchStr(st, cons($"s" >= "ddd").str))
    assert(!ZoneMaps.mayMatchStr(st, cons($"s" < "bbb").str), "strict < min must skip")
    assert(ZoneMaps.mayMatchStr(st, cons($"s" <= "bbb").str))
    assert(!ZoneMaps.mayMatchStr(st, cons($"s" === "zzz").str))
    assert(ZoneMaps.mayMatchStr(st, cons($"s" === "ccc").str))
    assert(!ZoneMaps.mayMatchStr(st, cons($"s".isin("aa", "ba")).str),
      "IN-list entirely below min must skip")
    assert(ZoneMaps.mayMatchStr(st, cons($"s".isin("aa", "ccc")).str))
    // mirrored literal-first form
    assert(!ZoneMaps.mayMatchStr(st, cons(lit("zzz") < $"s").str))
    // cross-domain: a numeric range cannot eliminate a string-stats
    // column, and a string range cannot eliminate a numeric-stats one
    assert(ZoneMaps.mayMatch(st, cons($"s" > 100).num))
    val numSt = Map("v" -> ZoneMaps.ColStats(Some((BigDecimal(1), BigDecimal(2))), 0, 5))
    assert(ZoneMaps.mayMatchStr(numSt, cons($"v" > "zzz").str))
    // an all-null column is skippable in the string domain too
    val nullSt = Map("s" -> ZoneMaps.ColStats(None, 5, 5))
    assert(!ZoneMaps.mayMatchStr(nullSt, cons($"s" >= "a").str))
    // a mixed-domain IN list contributes nothing (conservative)
    assert(cons($"s".isin("aa", 5)).isEmpty)
    // schema gate: a string literal constrains only STRING columns
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.DateType)))
    val pred = org.apache.spark.sql.graft.ColumnExpr.expr($"d" >= "2024-01-01")
    assert(ZoneMaps.allConstraintsOf(pred, Some(sch)).isEmpty)
  }

  test("statsAgg answers min/max/count from the manifest alone and tracks deletes") {
    val base = clusteredBase()
    val got = ManifestTable.statsAgg(spark, base, "v").get
    val row = ManifestTable.read(spark, base)
      .agg(min($"v"), max($"v"), count(lit(1)), count($"v")).head
    assert(got.bounds.map(_._1.toDouble).contains(row.getDouble(0)))
    assert(got.bounds.map(_._2.toDouble).contains(row.getDouble(1)))
    assert(got.rows == row.getLong(2) && got.nonNull == row.getLong(3))
    // a delete restages its partitions; the commit's stats refresh with it
    ManifestTable.deleteWhere(spark, base, $"v" < 100.0)
    val after = ManifestTable.statsAgg(spark, base, "v").get
    assert(after.bounds.map(_._1.toDouble).contains(100.0))
    assert(after.rows == 1900L && after.nonNull == 1900L)
    // unprovable: string bounds may be truncation-loose, so they never
    // prove exact MIN/MAX; absent columns likewise — the caller's
    // contract is to fall back to a real scan
    assert(ManifestTable.statsAgg(spark, base, "id").isEmpty)
    assert(ManifestTable.statsAgg(spark, base, "nope").isEmpty)
  }

  test("cross-type-family predicates never prune — Spark's coercion decides them") {
    // stats domains differ per type (dates in DAYS, timestamps in
    // MICROS): a literal from another family must contribute NO
    // constraint, or files that match after Spark's own cast would be
    // eliminated and readWhere would silently drop rows
    val rows = (0 until 100).map(i => (s"k$i", f"2023-${i % 12 + 1}%02d-15", i.toDouble))
    val base = mkTable("zmx", rows)
    // timestamp literal on the DATE column: row 2023-03-15 matches after
    // coercion; a days-vs-micros comparison would prune every file
    sameRows(base, $"date" === lit(java.sql.Timestamp.valueOf("2023-03-15 00:00:00")))
    // (a NUMERIC literal on a date column needs no guard: Spark itself
    // rejects `DATE = INT` at analysis, so pruning is never reached)
    // numeric-vs-numeric across widths still prunes soundly
    sameRows(base, $"v" >= 20 && $"v" < 40.5)
    // and the extractor itself drops the unsound conjunct when given a
    // schema, keeps it when not
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.DateType)))
    val pred = org.apache.spark.sql.graft.ColumnExpr.expr(
      $"d" === lit(java.sql.Timestamp.valueOf("2023-03-15 00:00:00")))
    assert(ZoneMaps.constraintsOf(pred, Some(sch)).isEmpty)
    assert(ZoneMaps.constraintsOf(pred, None).nonEmpty)
  }

  test("forFiles distributes past the file-count threshold and matches the driver path") {
    val dir = Files.createTempDirectory("zmff").toString + "/t"
    withConf("spark.sql.files.maxRecordsPerFile" -> "2") {
      (1 to 200).map(i => (i, i.toDouble)).toDF("a", "b")
        .repartition(4).write.parquet(dir)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fsx = p.getFileSystem(conf)
    val files = fsx.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    assert(files.size > 64, s"fixture needs >64 files, got ${files.size}")
    val dist = ZoneMaps.forFiles(spark, conf, files) // job path
    val solo = files.map(f => f.toString -> ZoneMaps.forFile(conf, f)).toMap
    assert(dist == solo, "distributed footer scan diverged from the driver loop")
  }

  test("statsAgg: an everywhere-null column keeps exact counts with no bounds") {
    val rows = (0 until 50).map(i => (s"k$i", "2023-01-15", i.toDouble))
    val base = Files.createTempDirectory("zmnull").toString + "/fact"
    ManifestTable.mergeInto(spark,
      frame(rows).withColumn("w", lit(null).cast("double")),
      base, Seq("id", "date"), "date")
    val got = ManifestTable.statsAgg(spark, base, "w").get
    assert(got.bounds.isEmpty && got.rows == 50L && got.nonNull == 0L)
  }
}
