package graft

import graft.etl.ManifestTable
import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The manifest-committed table's one promise: readers see every
  * partition at the same version — a crash anywhere before the manifest
  * rename leaves the previous snapshot fully intact, no mixed state. */
class ManifestTableSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, String, Double)]) =
    rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
    df.select($"id", $"date".cast("string"), $"v").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

  test("merge commits atomically; a crash between stage and commit leaves all-old") {
    val base = Files.createTempDirectory("manifest").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2024-05-02", 20.0))),
      base, keys, "date")
    val v1 = asMap(ManifestTable.read(spark, base))
    assert(v1 == Map(("k1", "2023-03-01") -> 10.0, ("k2", "2024-05-02") -> 20.0))

    // CRASH INJECTION: a multi-partition update (touches 2023 AND 2024)
    // is fully staged — all its data files exist on disk — but the writer
    // dies before the manifest rename. Readers must see ALL-OLD.
    val update = frame(Seq(("k1", "2023-03-01", 11.0), ("k3", "2024-07-04", 30.0)))
    val staged = ManifestTable.stage(spark, update, base, keys, "date")
    assert(asMap(ManifestTable.read(spark, base)) == v1,
      "uncommitted stage must be invisible — mixed state observed")

    // The writer restarts and re-runs the same merge end to end (the
    // crashed stage's dirs are dead weight for vacuum, never read):
    ManifestTable.mergeInto(spark, update, base, keys, "date")
    val v2 = asMap(ManifestTable.read(spark, base))
    assert(v2 == Map(
      ("k1", "2023-03-01") -> 11.0, // updated
      ("k2", "2024-05-02") -> 20.0, // untouched partition carried forward
      ("k3", "2024-07-04") -> 30.0), // inserted
      "committed merge must flip every touched partition at once")

    // the crashed stage staged version 2; the successful rerun also
    // staged version 2 and committed it — count data dirs before vacuum
    val dd = new org.apache.hadoop.fs.Path(base, "data")
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(staged.snapshot.version == 2)
    val removed = ManifestTable.vacuum(spark, base)
    assert(removed >= 0)
    assert(asMap(ManifestTable.read(spark, base)) == v2,
      "vacuum must never change what readers see")
    // everything left under data/ is referenced by the live manifest
    val live = ManifestTable.currentSnapshot(spark, base).get.parts.values.toSet
    assert(fs.listStatus(dd).map(_.getPath.getName).forall(live.contains))
  }

  test("untouched partitions carry forward without data movement") {
    val base = Files.createTempDirectory("manifest2").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("a", "2022-01-01", 1.0), ("b", "2024-01-01", 2.0))),
      base, keys, "date")
    val snap1 = ManifestTable.currentSnapshot(spark, base).get
    ManifestTable.mergeInto(spark,
      frame(Seq(("c", "2024-02-02", 3.0))), base, keys, "date")
    val snap2 = ManifestTable.currentSnapshot(spark, base).get
    assert(snap2.version == snap1.version + 1)
    assert(snap2.parts(2022) == snap1.parts(2022),
      "untouched 2022 must keep its old data dir (no rewrite)")
    assert(snap2.parts(2024) != snap1.parts(2024),
      "touched 2024 must point at the new version dir")
    assert(asMap(ManifestTable.read(spark, base)).keySet ==
      Set(("a", "2022-01-01"), ("b", "2024-01-01"), ("c", "2024-02-02")))
  }

  test("part_year filter prunes non-matching partition branches at plan time") {
    val base = Files.createTempDirectory("manifest3").toString + "/fact"
    ManifestTable.mergeInto(spark,
      frame(Seq(("a", "2022-01-01", 1.0), ("b", "2023-01-01", 2.0),
        ("c", "2024-01-01", 3.0))),
      base, Seq("id", "date"), "date")
    val pruned = ManifestTable.read(spark, base).filter($"part_year" === 2023)
    assert(pruned.count() == 1)
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1,
      s"expected the 2022/2024 branches constant-folded away, got ${scans.size} scans")
  }

  test("tags pin versions by name: readable, vacuum-proof, droppable") {
    val base = Files.createTempDirectory("manifest_tags").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")
    val v1 = ManifestTable.tag(spark, base, "model-v3-train")
    assert(v1 == 1 && ManifestTable.tagVersion(spark, base, "model-v3-train")
      .contains(1))
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 11.0), ("k2", "2024-05-02", 20.0))),
      base, keys, "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k3", "2024-07-04", 30.0))), base, keys, "date")
    // the tag reads the exact pinned state, not the head
    assert(asMap(ManifestTable.readTag(spark, base, "model-v3-train")) ==
      Map(("k1", "2023-03-01") -> 10.0))
    // vacuum with retention 1 spares the tagged version AND leaves no
    // dangling manifest in between (v2's manifest must go with its dirs)
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    assert(asMap(ManifestTable.readTag(spark, base, "model-v3-train")) ==
      Map(("k1", "2023-03-01") -> 10.0),
      "tag must survive vacuum")
    assert(ManifestTable.versions(spark, base) == Seq(1, 3),
      "untagged out-of-window version must fully vacuum, no dangling manifest")
    assert(ManifestTable.tags(spark, base) == Map("model-v3-train" -> 1))
    // re-tagging moves the pointer; dropping releases the pin
    ManifestTable.tag(spark, base, "model-v3-train")
    assert(ManifestTable.tagVersion(spark, base, "model-v3-train").contains(3))
    assert(ManifestTable.dropTag(spark, base, "model-v3-train"))
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    assert(ManifestTable.versions(spark, base) == Seq(3),
      "dropped tag's version must become vacuumable")
    // guards: tagging a missing/vacuumed version or bad name fails loudly
    intercept[IllegalArgumentException] {
      ManifestTable.tag(spark, base, "ghost", Some(99))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.tag(spark, base, "bad/name")
    }
    intercept[IllegalStateException] {
      ManifestTable.readTag(spark, base, "never-created")
    }
  }

  test("time travel: readAt sees each version's rows; vacuum retention bounds history") {
    val base = Files.createTempDirectory("manifest4").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 11.0), ("k2", "2024-05-02", 20.0))),
      base, keys, "date")
    assert(ManifestTable.versions(spark, base) == Seq(1, 2))
    assert(asMap(ManifestTable.readAt(spark, base, 1)) ==
      Map(("k1", "2023-03-01") -> 10.0),
      "version 1 must replay the pre-update state")
    assert(asMap(ManifestTable.readAt(spark, base, 2)) ==
      asMap(ManifestTable.read(spark, base)))

    // retain both versions: readAt(1) survives vacuum
    ManifestTable.vacuum(spark, base, retainVersions = 2)
    assert(asMap(ManifestTable.readAt(spark, base, 1)) ==
      Map(("k1", "2023-03-01") -> 10.0))

    // retain only current: version 1 is gone, current unchanged
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    assert(ManifestTable.snapshotAt(spark, base, 1).isEmpty)
    intercept[IllegalStateException](ManifestTable.readAt(spark, base, 1))
    assert(asMap(ManifestTable.read(spark, base)) == Map(
      ("k1", "2023-03-01") -> 11.0, ("k2", "2024-05-02") -> 20.0))
  }

  test("changes(): version diff reads only moved partitions and classifies rows") {
    val base = Files.createTempDirectory("manifest_cdc").toString + "/fact"
    val keys = Seq("id", "date")
    // v1: two partitions (2023, 2024)
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2024-05-02", 20.0))),
      base, keys, "date")
    // v2: touches ONLY 2023 — one update, one insert
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 11.0), ("k9", "2023-09-09", 90.0))),
      base, keys, "date")

    // since the beginning: everything is an insert
    val fromZero = ManifestTable.changes(spark, base, 0, 1, keys)
    assert(fromZero.select($"change").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    assert(fromZero.count() == 2)

    val d12 = ManifestTable.changes(spark, base, 1, 2, keys)
    val rows = d12.select($"change", $"id", $"v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set(("update", "k1", 11.0), ("insert", "k9", 90.0)),
      s"diff must be exactly the touched rows, got $rows")

    // O(changed partitions): the diff's scans must never open the
    // untouched 2024 partition's files
    val scanned = d12.inputFiles.toSeq
    assert(scanned.nonEmpty && scanned.forall(!_.contains("part_year=2024")),
      s"untouched partition was read: ${scanned.filter(_.contains("2024"))}")

    // a re-merge of identical content commits v3 but changes nothing:
    // the diff across it is empty (same for compaction's pointer moves)
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 11.0))), base, keys, "date")
    assert(ManifestTable.changes(spark, base, 2, 3, keys).isEmpty,
      "identical-content merge must diff to zero rows")
    ManifestTable.compact(spark, base)
    val v4 = ManifestTable.versions(spark, base).max
    if (v4 > 3)
      assert(ManifestTable.changes(spark, base, 3, v4, keys).isEmpty,
        "compaction moves pointers but must diff to zero rows")

    // schema evolution across the diff window: the added column's first
    // real value reports as an update against the old side's null
    ManifestTable.mergeInto(spark,
      frame(Seq(("k2", "2024-05-02", 20.0)))
        .withColumn("note", lit("fresh")),
      base, keys, "date")
    val v5 = ManifestTable.versions(spark, base).max
    val evo = ManifestTable.changes(spark, base, v4, v5, keys)
    val evoRows = evo.select($"change", $"id", $"note").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(evoRows == Set(("update", "k2", "fresh")),
      s"evolved column's first value must report as update, got $evoRows")
  }

  test("compaction shrinks file counts atomically and never changes rows") {
    val base = Files.createTempDirectory("manifest5").toString + "/fact"
    val keys = Seq("id", "date")
    // simulate the many-small-files state a streaming writer leaves: AQE
    // coalescing off so the merge's 32 shuffle partitions write one small
    // file each non-empty task
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val rows = (1 to 12).map(i => (s"k$i", f"2023-01-$i%02d", i.toDouble))
    try rows.grouped(3).foreach(g =>
      ManifestTable.mergeInto(spark, frame(g), base, keys, "date"))
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val before = asMap(ManifestTable.read(spark, base))
    val vBefore = ManifestTable.currentSnapshot(spark, base).get.version

    val dd = new org.apache.hadoop.fs.Path(base, "data")
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nFiles(): Int = {
      val dir = ManifestTable.currentSnapshot(spark, base).get.parts(2023)
      fs.listStatus(new org.apache.hadoop.fs.Path(dd, s"$dir/part_year=2023"))
        .count(_.getPath.getName.endsWith(".parquet"))
    }
    assert(nFiles() > 1, "merge batches should have left multiple files")

    val rewritten = ManifestTable.compact(spark, base, targetFileBytes = 1L << 30)
    assert(rewritten == 1, "exactly the 2023 partition needed compaction")
    assert(nFiles() == 1, "compaction must bin-pack to the target file count")
    assert(ManifestTable.currentSnapshot(spark, base).get.version == vBefore + 1,
      "compaction is a normal manifest commit")
    assert(asMap(ManifestTable.read(spark, base)) == before,
      "compaction must be row-invisible")
    // pre-compaction version stays time-travel-readable until vacuumed
    assert(asMap(ManifestTable.readAt(spark, base, vBefore)) == before)
    // second pass is a no-op: already compact, no new commit
    assert(ManifestTable.compact(spark, base, targetFileBytes = 1L << 30) == 0)
    assert(ManifestTable.currentSnapshot(spark, base).get.version == vBefore + 1)
  }

  test("clustered compaction installs range-disjoint file layout atomically") {
    val base = Files.createTempDirectory("manifest6").toString + "/fact"
    val rows = (1 to 12).map(i => (s"k$i", f"2023-01-$i%02d", i.toDouble))
    ManifestTable.mergeInto(spark, frame(rows), base, Seq("id", "date"), "date")
    val before = asMap(ManifestTable.read(spark, base))

    // target a third of the current bytes => 3 clustered files even
    // though 1 file is "compact enough": a clustering request always
    // rewrites (sizing reads listStatus metadata, never rows)
    val dir0 = ManifestTable.currentSnapshot(spark, base).get.parts(2023)
    val pdir0 = new org.apache.hadoop.fs.Path(s"$base/data/$dir0/part_year=2023")
    val fs0 = pdir0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs0.listStatus(pdir0)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val n = ManifestTable.compact(spark, base,
      targetFileBytes = totalBytes / 3 + 1, clusterBy = Seq($"v"))
    assert(n == 1)
    assert(asMap(ManifestTable.read(spark, base)) == before)

    val dir = ManifestTable.currentSnapshot(spark, base).get.parts(2023)
    val pdir = s"$base/data/$dir/part_year=2023"
    val stats = graft.etl.ZOrderLayout.fileStats(spark, pdir, "v")
      .collect().map(r => (r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .sortBy(_._1)
    assert(stats.length == 3, s"expected 3 clustered files, got ${stats.length}")
    assert(stats.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo },
      s"file v-ranges must be disjoint after clustering: ${stats.toSeq}")
  }

  test("schema evolution: added columns widen, old partitions read null, time travel keeps old schema") {
    val base = Files.createTempDirectory("manifest7").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2022-05-02", 20.0))),
      base, keys, "date")
    // v2's batch GAINS a column (the crawler-inferred drifting schema
    // case) and touches only 2023 — 2022 carries forward untouched
    val widened = Seq(("k3", "2023-04-01", 30.0, "src9"))
      .toDF("id", "date", "v", "origin").withColumn("date", to_date($"date"))
    ManifestTable.mergeInto(spark, widened, base, keys, "date")
    val now = ManifestTable.read(spark, base)
    assert(now.columns.toSeq == Seq("id", "date", "v", "origin", "part_year"),
      s"widened schema must span every partition, got ${now.columns.toSeq}")
    val byId = now.select($"id", $"origin").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byId == Map("k1" -> None, "k2" -> None, "k3" -> Some("src9")),
      "pre-evolution rows surface the new column as null — including the carried-forward 2022 dir")
    // time travel: v1 returns the schema IT recorded
    assert(ManifestTable.readAt(spark, base, 1).columns.toSeq ==
      Seq("id", "date", "v", "part_year"))
    // v3's batch is MISSING columns: matched rows KEEP their base values
    // there (Delta updateAll semantics), inserted rows get nulls, and the
    // columns survive in the table schema
    val narrow = Seq(("k1", "2023-03-01"), ("k4", "2023-09-09"))
      .toDF("id", "date").withColumn("date", to_date($"date"))
    ManifestTable.mergeInto(spark, narrow, base, keys, "date")
    val v3 = ManifestTable.read(spark, base)
    assert(v3.columns.toSeq == Seq("id", "date", "v", "origin", "part_year"))
    val k1 = v3.filter($"id" === "k1").collect().head
    assert(k1.getDouble(k1.fieldIndex("v")) == 10.0,
      "an update missing a column must preserve the base value, not null it")
    val k4 = v3.filter($"id" === "k4").collect().head
    assert(k4.isNullAt(k4.fieldIndex("v")),
      "an insert missing a column lands as null")
    // a cross-family retype is refused, never coerced
    val retyped = Seq(("k9", "2023-06-01", "not-a-double"))
      .toDF("id", "date", "v").withColumn("date", to_date($"date"))
    val e = intercept[IllegalArgumentException](
      ManifestTable.mergeInto(spark, retyped, base, keys, "date"))
    assert(e.getMessage.contains("never narrows or"))
  }

  test("type widening: an int column widens to long; old int32 files read widened; narrowing refuses") {
    val base = Files.createTempDirectory("manifestW").toString + "/fact"
    val keys = Seq("id", "date")
    val v1 = Seq(("k1", "2023-03-01", 7), ("k2", "2023-09-09", 9))
      .toDF("id", "date", "n").withColumn("date", to_date($"date"))
    ManifestTable.mergeInto(spark, v1, base, keys, "date")
    // a LONG batch widens the column for the whole table
    val v2 = Seq(("k3", "2023-03-02", 5000000000L))
      .toDF("id", "date", "n").withColumn("date", to_date($"date"))
    ManifestTable.mergeInto(spark, v2, base, keys, "date")
    val read = ManifestTable.read(spark, base)
    assert(read.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    // 2023-09-09's partition was NOT touched by the long merge: its file
    // still holds int32 pages and must read back widened
    val got = read.select($"id", $"n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("k1" -> 7L, "k2" -> 9L, "k3" -> 5000000000L))
    // zone maps survive the mixed generations: bounds fold numerically
    val agg = ManifestTable.statsAgg(spark, base, "n")
    assert(agg.exists(a => a.bounds.contains(
      (BigDecimal(7), BigDecimal(5000000000L)))))
    // a narrower int batch into the widened column is cast UP, not refused
    val v3 = Seq(("k4", "2023-03-03", 11))
      .toDF("id", "date", "n").withColumn("date", to_date($"date"))
    ManifestTable.mergeInto(spark, v3, base, keys, "date")
    assert(ManifestTable.read(spark, base).filter($"id" === "k4")
      .select($"n").head.getLong(0) == 11L)
    // cross-family (long -> string) refuses loudly
    val bad = Seq(("k5", "2023-03-04", "oops")).toDF("id", "date", "n")
      .withColumn("date", to_date($"date"))
    val e = intercept[IllegalArgumentException](
      ManifestTable.mergeInto(spark, bad, base, keys, "date"))
    assert(e.getMessage.contains("never narrows or"))
  }

  test("write-audit-publish: rejection consumes no version and leaves no bytes; approval equals a plain merge") {
    import graft.etl.DataQuality
    val base = Files.createTempDirectory("manifestWap").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2024-05-02", 20.0))),
      base, keys, "date")
    def audit(merged: org.apache.spark.sql.DataFrame): Boolean =
      DataQuality.allPassed(DataQuality.report(Seq(DataQuality.rowChecks(
        merged, Seq(DataQuality.NonNegative("v", "fact.v"))))))
    // a batch whose MERGED state violates the invariant is rejected
    val bad = frame(Seq(("k1", "2023-03-01", -5.0)))
    assert(ManifestTable.writeAuditPublish(spark, bad, base, keys, "date")(audit).isEmpty)
    assert(ManifestTable.versions(spark, base) == Seq(1),
      "a rejected publish must not consume a version")
    assert(asMap(ManifestTable.read(spark, base)) ==
      Map(("k1", "2023-03-01") -> 10.0, ("k2", "2024-05-02") -> 20.0),
      "readers never see rejected bytes")
    val dd = new org.apache.hadoop.fs.Path(base, "data")
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(dd).map(_.getPath.getName).exists(_.startsWith("v00002")),
      "the abandoned stage dir must be deleted")
    // an approved publish lands exactly like a plain merge — and the
    // auditor saw the POST-merge state (the updated row, not the batch)
    var audited: Map[(String, String), Double] = Map.empty
    val v = ManifestTable.writeAuditPublish(spark,
      frame(Seq(("k1", "2023-03-01", 11.0))), base, keys, "date") { merged =>
      audited = asMap(merged)
      audit(merged)
    }
    assert(v.contains(2))
    assert(audited == Map(("k1", "2023-03-01") -> 11.0,
      ("k2", "2024-05-02") -> 20.0),
      "the audit frame must be the merged state, not the batch")
    assert(asMap(ManifestTable.read(spark, base)) == audited)
  }

  test("re-tag never passes through a no-tag state: generations resolve newest, legacy pointers read") {
    val base = Files.createTempDirectory("manifest_taggen").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 11.0))), base, keys, "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 12.0))), base, keys, "date")
    val rd = new org.apache.hadoop.fs.Path(base, "_refs")
    val fs = rd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def refFiles(): Set[String] =
      fs.listStatus(rd).map(_.getPath.getName).filterNot(_.startsWith(".")).toSet

    ManifestTable.tag(spark, base, "pin", Some(1))
    assert(refFiles() == Set("pin@1.txt"))
    // a re-tag lands a NEW generation then GC's the old one — at no
    // instant is the name pointer-less, and steady state is one file
    ManifestTable.tag(spark, base, "pin", Some(2))
    assert(refFiles() == Set("pin@2.txt"),
      "re-tag must replace the pointer via a fresh generation, then GC")
    assert(ManifestTable.tagVersion(spark, base, "pin").contains(2))

    // crash-mid-re-tag: the new generation landed but the old was never
    // GC'd — resolve-newest reads the re-tag, the orphan is inert, and
    // the NEXT re-tag cleans both up
    val out = fs.create(new org.apache.hadoop.fs.Path(rd, "pin@7.txt"), true)
    try out.write("3".getBytes("UTF-8")) finally out.close()
    assert(ManifestTable.tagVersion(spark, base, "pin").contains(3),
      "highest generation must win")
    assert(ManifestTable.tags(spark, base) == Map("pin" -> 3))
    ManifestTable.tag(spark, base, "pin", Some(1))
    assert(refFiles() == Set("pin@8.txt"),
      "a tag() after a crashed re-tag must GC every stale generation")

    // legacy bare-name pointer (generation 0) reads, re-tags, and drops
    val leg = fs.create(new org.apache.hadoop.fs.Path(rd, "legacy.txt"), true)
    try leg.write("2".getBytes("UTF-8")) finally leg.close()
    assert(ManifestTable.tagVersion(spark, base, "legacy").contains(2))
    ManifestTable.tag(spark, base, "legacy", Some(3))
    assert(ManifestTable.tagVersion(spark, base, "legacy").contains(3))
    assert(!refFiles().contains("legacy.txt"),
      "re-tagging a legacy pointer must migrate it to a generation file")
    assert(ManifestTable.dropTag(spark, base, "pin"))
    assert(ManifestTable.dropTag(spark, base, "legacy"))
    assert(ManifestTable.tags(spark, base).isEmpty)
  }

  test("writeAuditPublishRetrying: a lost race abandons, re-stages, RE-AUDITS, and publishes") {
    val base = Files.createTempDirectory("manifest_wapocc").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")

    // the audit window is exactly where a competing writer can land: the
    // first audit triggers a winner commit, so attempt 1's commit loses;
    // attempt 2 must re-audit against the WINNER's state (kA visible)
    var auditsSeen = List.empty[Map[(String, String), Double]]
    val v = ManifestTable.writeAuditPublishRetrying(spark,
      frame(Seq(("kB", "2023-07-01", 3.0))), base, keys, "date") { merged =>
      if (auditsSeen.isEmpty)
        ManifestTable.mergeInto(spark,
          frame(Seq(("kA", "2023-06-01", 2.0))), base, keys, "date")
      auditsSeen ::= asMap(merged)
      true
    }
    assert(auditsSeen.size == 2, "the retry must replay the audit")
    assert(!auditsSeen.last.contains(("kA", "2023-06-01")) &&
      auditsSeen.head.contains(("kA", "2023-06-01")),
      "the second audit must see the winner's committed row; the first must not")
    assert(v.contains(3))
    assert(asMap(ManifestTable.read(spark, base)) == Map(
      ("k1", "2023-03-01") -> 10.0, ("kA", "2023-06-01") -> 2.0,
      ("kB", "2023-07-01") -> 3.0), "no lost update in either direction")

    // the lost attempt's staged dirs were abandoned AT the conflict, not
    // left for vacuum: everything on disk is referenced by a manifest
    val dd = new org.apache.hadoop.fs.Path(base, "data")
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = ManifestTable.versions(spark, base)
      .flatMap(ManifestTable.snapshotAt(spark, base, _))
      .flatMap(s => s.parts.values ++ s.deletes).toSet
    assert(fs.listStatus(dd).map(_.getPath.getName).forall(live.contains),
      "a lost WAP attempt must abandon its staged dirs immediately")

    // a rejection is a data verdict, not a race: no retry, no version
    var audits = 0
    assert(ManifestTable.writeAuditPublishRetrying(spark,
      frame(Seq(("kC", "2023-08-01", 4.0))), base, keys, "date") { _ =>
      audits += 1; false
    }.isEmpty)
    assert(audits == 1, "a rejected audit must not be retried")
    assert(ManifestTable.versions(spark, base).last == 3)
  }

  test("vacuum never touches a staged-but-uncommitted version; its commit then succeeds") {
    val base = Files.createTempDirectory("manifest8").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 11.0))), base, keys, "date")
    // a concurrent merge has STAGED version 3 but not yet committed
    val staged = ManifestTable.stage(spark,
      frame(Seq(("k2", "2024-01-01", 30.0))), base, keys, "date")
    assert(staged.snapshot.version == 3)
    val dd = new org.apache.hadoop.fs.Path(base, "data")
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedDir = staged.snapshot.parts(2024)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dd, stagedDir)))
    // vacuum with minimum retention: v1's dir goes, the staged v3 dir
    // (above the latest committed manifest) MUST survive
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    assert(fs.listStatus(dd).map(_.getPath.getName)
        .forall(!_.startsWith("v00001")),
      "superseded version dir should be vacuumed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(dd, stagedDir)),
      "vacuum must not delete an in-flight staged version")
    // the in-flight merge commits fine after the vacuum
    ManifestTable.commit(spark, base, staged)
    assert(asMap(ManifestTable.read(spark, base)) == Map(
      ("k1", "2023-03-01") -> 11.0, ("k2", "2024-01-01") -> 30.0))
  }

  test("two interleaved writers: the first commit wins, the loser fails loudly, retry succeeds") {
    val base = Files.createTempDirectory("manifest9").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")

    // Writers A and B both stage against v1 → both target version 2,
    // but in DISJOINT per-attempt data dirs (neither can clobber the
    // other's staged files — the hazard a shared v00002 dir would have).
    val stagedA = ManifestTable.stage(spark,
      frame(Seq(("kA", "2023-06-01", 2.0))), base, keys, "date")
    val stagedB = ManifestTable.stage(spark,
      frame(Seq(("kB", "2023-07-01", 3.0))), base, keys, "date")
    assert(stagedA.snapshot.version == 2 && stagedB.snapshot.version == 2)
    assert(stagedA.snapshot.parts(2023) != stagedB.snapshot.parts(2023),
      "concurrent stagers must write disjoint data dirs")

    // A commits first and wins. B's commit must abort with a NAMED
    // conflict — not silently overwrite A's manifest (lost update).
    ManifestTable.commit(spark, base, stagedA)
    val e = intercept[ManifestTable.ConcurrentCommitException](
      ManifestTable.commit(spark, base, stagedB))
    assert(e.getMessage.contains("re-stage"))
    assert(asMap(ManifestTable.read(spark, base)) == Map(
      ("k1", "2023-03-01") -> 10.0, ("kA", "2023-06-01") -> 2.0),
      "the winner's update must be intact after the loser's abort")

    // B retries the standard way — re-stage against the new snapshot —
    // and lands as version 3 with BOTH updates present: no lost update.
    ManifestTable.mergeInto(spark,
      frame(Seq(("kB", "2023-07-01", 3.0))), base, keys, "date")
    assert(asMap(ManifestTable.read(spark, base)) == Map(
      ("k1", "2023-03-01") -> 10.0, ("kA", "2023-06-01") -> 2.0,
      ("kB", "2023-07-01") -> 3.0))

    // B's abandoned stage dir is below the committed ceiling now —
    // vacuum clears it; readers unaffected
    ManifestTable.vacuum(spark, base, retainVersions = 1)
    val dd = new org.apache.hadoop.fs.Path(base, "data")
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = ManifestTable.currentSnapshot(spark, base).get.parts.values.toSet
    assert(fs.listStatus(dd).map(_.getPath.getName).forall(live.contains),
      "race-loser stage dirs must be vacuumable garbage")
    assert(asMap(ManifestTable.read(spark, base)).size == 3)
  }

  test("mergeIntoRetrying: the OCC loop re-stages over the winner and converges; exhaustion is loud") {
    val base = Files.createTempDirectory("manifest10").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0))), base, keys, "date")

    // a competing writer lands BETWEEN our stage and commit (the hook is
    // exactly that window): attempt 1 must conflict, attempt 2 re-stages
    // against the winner's snapshot and lands with BOTH updates intact —
    // including on the contended key, where the re-staged upsert must
    // read the winner's committed row before overwriting it
    val attempts = ManifestTable.mergeIntoRetryingHook(spark,
      frame(Seq(("kB", "2023-07-01", 3.0), ("k1", "2023-03-01", 11.0))),
      base, keys, "date")(attempt =>
        if (attempt == 1) ManifestTable.mergeInto(spark,
          frame(Seq(("kA", "2023-06-01", 2.0))), base, keys, "date"))
    assert(attempts == 2, s"one conflict -> two attempts, got $attempts")
    assert(asMap(ManifestTable.read(spark, base)) == Map(
      ("k1", "2023-03-01") -> 11.0, ("kA", "2023-06-01") -> 2.0,
      ("kB", "2023-07-01") -> 3.0),
      "no lost update in either direction after the automated retry")

    // conflict-free path: one attempt, no retry overhead
    assert(ManifestTable.mergeIntoRetrying(spark,
      frame(Seq(("kC", "2023-08-01", 4.0))), base, keys, "date") == 1)

    // livelock bound: a winner on EVERY attempt exhausts maxAttempts and
    // the final conflict propagates loudly — never silent last-write-wins
    var v = 20.0
    intercept[ManifestTable.ConcurrentCommitException] {
      ManifestTable.mergeIntoRetryingHook(spark,
        frame(Seq(("kD", "2023-09-01", 5.0))), base, keys, "date",
        maxAttempts = 2) { _ =>
        v += 1
        ManifestTable.mergeInto(spark,
          frame(Seq(("kE", "2023-10-01", v))), base, keys, "date")
      }
    }
    val rows = asMap(ManifestTable.read(spark, base))
    assert(!rows.keySet.exists(_._1 == "kD"),
      "an exhausted retry must leave NONE of its rows visible")
    assert(rows(("kE", "2023-10-01")) == 22.0,
      "every competing commit must survive the loser's attempts")
  }

  test("deleteWhere removes matching rows atomically; CDC reports deletes; untouched partitions carry") {
    val base = Files.createTempDirectory("manifest_del").toString + "/fact"
    val keys = Seq("id", "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2023-06-01", 20.0),
        ("k3", "2024-05-02", 30.0))),
      base, keys, "date")
    val snap1 = ManifestTable.currentSnapshot(spark, base).get

    // no-match delete: zero rows, NO version burned
    assert(ManifestTable.deleteWhere(spark, base, $"v" > 99.0) == 0L)
    assert(ManifestTable.currentSnapshot(spark, base).get.version ==
      snap1.version, "a no-op delete must not commit a version")

    // delete one 2023 row: only 2023 rewrites, 2024 carries forward
    assert(ManifestTable.deleteWhere(spark, base, $"id" === "k1") == 1L)
    val snap2 = ManifestTable.currentSnapshot(spark, base).get
    assert(snap2.version == snap1.version + 1)
    assert(snap2.parts(2024) == snap1.parts(2024),
      "partition with no matching rows must keep its old data dir")
    assert(snap2.parts(2023) != snap1.parts(2023))
    assert(asMap(ManifestTable.read(spark, base)) == Map(
      ("k2", "2023-06-01") -> 20.0, ("k3", "2024-05-02") -> 30.0))

    // the CDC feed reports exactly the deleted row, with its old values
    val cdc = ManifestTable.changes(spark, base, snap1.version, snap2.version, keys)
      .select($"change", $"id", $"v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(cdc == Set(("delete", "k1", 10.0)),
      s"delete must surface in changes() with the old row's values, got $cdc")

    // time travel still sees the pre-delete rows
    assert(asMap(ManifestTable.readAt(spark, base, snap1.version)).size == 3)

    // deleting a partition to EMPTY keeps it readable (schema pinned)
    assert(ManifestTable.deleteWhere(spark, base, year($"date") === 2024) == 1L)
    assert(asMap(ManifestTable.read(spark, base)) ==
      Map(("k2", "2023-06-01") -> 20.0))
    val snap3 = ManifestTable.currentSnapshot(spark, base).get
    val cdc2 = ManifestTable.changes(spark, base, snap2.version, snap3.version, keys)
      .select($"change", $"id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(cdc2 == Set(("delete", "k3")))

    // idempotent re-issue: nothing left to match
    assert(ManifestTable.deleteWhere(spark, base, $"id" === "k1") == 0L)
  }

  test("vacuum reclaims orphaned commit tmp files at or below the ceiling") {
    val base = Files.createTempDirectory("manifest_tmp").toString + "/fact"
    ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-01-01", 1.0))), base, Seq("id", "date"), "date")
    ManifestTable.mergeInto(spark,
      frame(Seq(("k2", "2023-02-02", 2.0))), base, Seq("id", "date"), "date")
    val md = new org.apache.hadoop.fs.Path(s"$base/_manifests")
    val fsx = md.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate crashes between tmp-create and rename: per-attempt tokens
    // mean no retry ever overwrites these
    val deadBelow = new org.apache.hadoop.fs.Path(md, ".tmp-v00002-deadbeef.txt")
    val liveAbove = new org.apache.hadoop.fs.Path(md, ".tmp-v00009-deadbeef.txt")
    Seq(deadBelow, liveAbove).foreach { p =>
      val o = fsx.create(p, true); o.write("orphan".getBytes("UTF-8")); o.close()
    }
    ManifestTable.vacuum(spark, base, retainVersions = 2)
    assert(!fsx.exists(deadBelow),
      "an attempt at or below the committed ceiling can never complete — garbage")
    assert(fsx.exists(liveAbove),
      "an attempt above the ceiling may be in flight — untouchable")
    // table unaffected
    assert(ManifestTable.read(spark, base).count() == 2L)
  }
}
