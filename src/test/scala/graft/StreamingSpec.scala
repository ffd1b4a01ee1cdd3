package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsBatch(n: Int, startHour: Int) =
    (0 until n).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${startHour + i / 60}%02d:${i % 60}%02d:00"),
        if (i % 2 == 0) "click" else "view", i.toDouble)
    }.toDF("ts", "event_type", "value")

  test("windowed agg over a memory-sink stream matches batch semantics") {
    val dir = Files.createTempDirectory("stream_src").toString + "/data"
    eventsBatch(120, 10).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingIngest.windowedAgg(stream, "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("win_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // append mode emits only watermark-closed windows; re-run a complete
    // query for value assertions via batch on same frame:
    val batch = StreamingIngest.windowedAgg(
      eventsBatch(120, 10).withColumn("ts", $"ts"))
    val b = batch.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(b.map(_._3).sum == 120)
    assert(b.forall(_._3 == 30), "120 events over 2 hours × 2 types = 30 each")
  }

  test("AvailableNow file ingest is incremental across restarts (bookmark)") {
    val src = Files.createTempDirectory("ingest_src").toString
    val out = Files.createTempDirectory("ingest_out").toString
    val cp = Files.createTempDirectory("ingest_cp").toString
    eventsBatch(10, 8).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q1 = StreamingIngest.ingestAvailableNow(spark, src, schema, out, cp)
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() == 10)
    // second run: only NEW files processed (no duplicates of the first 10)
    eventsBatch(5, 9).write.mode("append").parquet(src)
    val q2 = StreamingIngest.ingestAvailableNow(spark, src, schema, out, cp)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 15)
  }

  test("flatMapGroupsWithState dedup emits first record per key across batches") {
    val src = Files.createTempDirectory("dedup_src").toString + "/data"
    val cp = Files.createTempDirectory("dedup_cp").toString
    val out = Files.createTempDirectory("dedup_out").toString + "/data"
    Seq(("k1", 1), ("k1", 2), ("k2", 10)).toDF("id", "v").write.parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
        .as[(String, Int)]
      val q = StreamingIngest.dedupStream(stream.groupByKey(_._1))
        .toDF("id", "rec")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val first = spark.read.parquet(out).collect()
    assert(first.map(_.getString(0)).sorted.toSeq == Seq("k1", "k2"),
      "one record per key in batch 1")
    // batch 2: replay k1 (must stay suppressed by state), add k3
    Seq(("k1", 99), ("k3", 30)).toDF("id", "v").write.mode("append").parquet(src)
    run()
    val all = spark.read.parquet(out).collect()
    assert(all.map(_.getString(0)).sorted.toSeq == Seq("k1", "k2", "k3"),
      "k1 deduped across micro-batches via the state store")
  }


  test("mergeIntoParquet swap is rename-aside: survives stale leftovers, leaves none") {
    val root = Files.createTempDirectory("swap").toString
    val base = root + "/tbl"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingIngest.mergeIntoParquet(spark,
      Seq(("k1", 1.0)).toDF("id", "v"), base, Seq("id"))
    // simulate a crash between the two renames: an _old dir left on disk
    fs.mkdirs(new org.apache.hadoop.fs.Path(base + "_old"))
    StreamingIngest.mergeIntoParquet(spark,
      Seq(("k1", 2.0), ("k2", 3.0)).toDF("id", "v"), base, Seq("id"))
    val out = spark.read.parquet(base).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out == Map("k1" -> 2.0, "k2" -> 3.0))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base + "_tmp")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(base + "_old")),
      "swap must clean up its working dirs")
  }

  test("mergeIntoParquet recovers the table when a crash left only the aside copy") {
    val base = Files.createTempDirectory("recover").toString + "/tbl"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingIngest.mergeIntoParquet(spark,
      Seq(("k1", 1.0)).toDF("id", "v"), base, Seq("id"))
    // simulate a crash between rename(base, old) and rename(tmp, base):
    // only the aside copy remains
    assert(fs.rename(new org.apache.hadoop.fs.Path(base),
      new org.apache.hadoop.fs.Path(base + "_old")))
    StreamingIngest.mergeIntoParquet(spark,
      Seq(("k2", 2.0)).toDF("id", "v"), base, Seq("id"))
    val out = spark.read.parquet(base).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out == Map("k1" -> 1.0, "k2" -> 2.0),
      "pre-crash rows must survive recovery — the aside copy IS the table")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base + "_old")))
  }

  test("mergeIntoDatePartitioned: a 1-record upsert rewrites exactly one partition dir") {
    val base = Files.createTempDirectory("pmerge").toString + "/fact"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def frame(rows: Seq[(String, String, Double)]) =
      rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))
    StreamingIngest.mergeIntoDatePartitioned(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2024-05-02", 20.0),
        ("k3", "2024-06-03", 30.0))),
      base, Seq("id", "date"), "date")
    def listing(year: Int) =
      fs.listStatus(new org.apache.hadoop.fs.Path(base + s"/part_year=$year"))
        .map(st => (st.getPath.getName, st.getModificationTime, st.getLen))
        .toSeq.sortBy(_._1)
    val before2023 = listing(2023)
    StreamingIngest.mergeIntoDatePartitioned(spark,
      frame(Seq(("k2", "2024-05-02", 25.0))), base, Seq("id", "date"), "date")
    assert(listing(2023) == before2023,
      "a 2024 upsert must not rewrite the 2023 partition (file names, mtimes, sizes)")
    val out = spark.read.parquet(base).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out == Map("k1" -> 10.0, "k2" -> 25.0, "k3" -> 30.0))
    // an unseen year inserts a NEW partition dir, still without touching 2023
    StreamingIngest.mergeIntoDatePartitioned(spark,
      frame(Seq(("k4", "2025-01-01", 40.0))), base, Seq("id", "date"), "date")
    assert(listing(2023) == before2023)
    assert(fs.exists(new org.apache.hadoop.fs.Path(base + "/part_year=2025")))
    assert(spark.read.parquet(base).count() == 4)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base + "__tmp")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(base + "__old")),
      "swap must clean up its working roots")
  }

  test("mergeIntoDatePartitioned recovers an orphaned aside partition before merging") {
    val base = Files.createTempDirectory("precover").toString + "/fact"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def frame(rows: Seq[(String, String, Double)]) =
      rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))
    StreamingIngest.mergeIntoDatePartitioned(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2024-05-02", 20.0))),
      base, Seq("id", "date"), "date")
    // crash between the two renames: the 2024 partition exists only aside
    fs.mkdirs(new org.apache.hadoop.fs.Path(base + "__old"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(base + "/part_year=2024"),
      new org.apache.hadoop.fs.Path(base + "__old/part_year=2024")))
    StreamingIngest.mergeIntoDatePartitioned(spark,
      frame(Seq(("k3", "2023-07-01", 30.0))), base, Seq("id", "date"), "date")
    val out = spark.read.parquet(base).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out == Map("k1" -> 10.0, "k2" -> 20.0, "k3" -> 30.0),
      "the aside 2024 partition must be restored, not discarded")
  }

  test("partitioned merge stream rewrites only the touched partition per batch") {
    val base = Files.createTempDirectory("pstream").toString + "/fact"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def frame(rows: Seq[(String, String, Double)]) =
      rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))
    StreamingIngest.mergeIntoDatePartitioned(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2024-05-02", 20.0))),
      base, Seq("id", "date"), "date")
    def listing(year: Int) =
      fs.listStatus(new org.apache.hadoop.fs.Path(base + s"/part_year=$year"))
        .map(st => (st.getPath.getName, st.getModificationTime, st.getLen))
        .toSeq.sortBy(_._1)
    val before2023 = listing(2023)
    val src = Files.createTempDirectory("pstream_src").toString + "/data"
    val cp = Files.createTempDirectory("pstream_cp").toString
    frame(Seq(("k2", "2024-05-02", 25.0), ("k3", "2024-07-01", 30.0)))
      .write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = StreamingIngest.mergePartitionedStream(spark,
      spark.readStream.schema(schema).parquet(src),
      base, Seq("id", "date"), "date", cp)
    q.awaitTermination()
    assert(listing(2023) == before2023,
      "a 2024-only micro-batch must not rewrite the 2023 partition")
    val out = spark.read.parquet(base).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out == Map("k1" -> 10.0, "k2" -> 25.0, "k3" -> 30.0))
  }

  test("manifest merge stream commits each micro-batch atomically") {
    val base = Files.createTempDirectory("mstream").toString + "/fact"
    def frame(rows: Seq[(String, String, Double)]) =
      rows.toDF("id", "date", "v").withColumn("date", to_date($"date"))
    graft.etl.ManifestTable.mergeInto(spark,
      frame(Seq(("k1", "2023-03-01", 10.0), ("k2", "2024-05-02", 20.0))),
      base, Seq("id", "date"), "date")
    val src = Files.createTempDirectory("mstream_src").toString + "/data"
    val cp = Files.createTempDirectory("mstream_cp").toString
    frame(Seq(("k2", "2024-05-02", 25.0), ("k3", "2025-07-01", 30.0)))
      .write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = StreamingIngest.mergeManifestStream(spark,
      spark.readStream.schema(schema).parquet(src),
      base, Seq("id", "date"), "date", cp)
    q.awaitTermination()
    val out = graft.etl.ManifestTable.read(spark, base).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out == Map("k1" -> 10.0, "k2" -> 25.0, "k3" -> 30.0))
    // the batch flipped 2024 + 2025 with ONE commit
    assert(graft.etl.ManifestTable.currentSnapshot(spark, base).get.version == 2)
  }

  test("foreachBatch merge stream upserts into the keyed silver table") {
    val base = Files.createTempDirectory("merge").toString + "/silver"
    // seed: two records
    StreamingIngest.mergeIntoParquet(spark,
      Seq(("u1", "2024-01-01", 10.0), ("u2", "2024-01-01", 20.0))
        .toDF("_id", "date", "total_earnings"),
      base, Seq("_id", "date"))
    // stream one micro-batch of updates: revise u1, insert u3
    val src = Files.createTempDirectory("merge_src").toString + "/data"
    val cp = Files.createTempDirectory("merge_cp").toString
    Seq(("u1", "2024-01-01", 15.0), ("u3", "2024-01-02", 30.0))
      .toDF("_id", "date", "total_earnings").write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = StreamingIngest.mergeStream(spark,
      spark.readStream.schema(schema).parquet(src), base,
      Seq("_id", "date"), cp)
    q.awaitTermination()
    val out = spark.read.parquet(base).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out == Map("u1" -> 15.0, "u2" -> 20.0, "u3" -> 30.0))
  }

  test("stream-stream attribution join matches clicks inside the window only") {
    import graft.streaming.StreamingJoins
    val impSrc = Files.createTempDirectory("ss_imp").toString + "/data"
    val clkSrc = Files.createTempDirectory("ss_clk").toString + "/data"
    val cp = Files.createTempDirectory("ss_cp").toString
    val out = Files.createTempDirectory("ss_out").toString + "/data"
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $m:00")
    // impressions: user 1 at 10:00, user 2 at 10:00
    Seq((1L, t("10:00"), 100L), (2L, t("10:00"), 101L))
      .toDF("user_id", "ts", "event_id").write.parquet(impSrc)
    // clicks: user 1 at 10:20 (inside 30min), user 2 at 11:30 (outside),
    // user 3 at 10:05 (no impression)
    Seq((1L, t("10:20"), 200L), (2L, t("11:30"), 201L), (3L, t("10:05"), 202L))
      .toDF("user_id", "ts", "event_id").write.parquet(clkSrc)
    val schema = spark.read.parquet(impSrc).schema
    val joined = StreamingJoins.attributionJoin(
      spark.readStream.schema(schema).parquet(impSrc),
      spark.readStream.schema(schema).parquet(clkSrc))
    val q = joined.writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("imp_id"),
        r.getAs[Long]("click_id")))
    assert(got.toSet == Set((1L, 100L, 200L)),
      s"only the in-window click attributes, got ${got.mkString(",")}")
    // batch twin: the same semantics as a plain interval join
    val impB = spark.read.parquet(impSrc)
    val clkB = spark.read.parquet(clkSrc)
    val batch = impB.alias("i").join(clkB.alias("c"),
      col("i.user_id") === col("c.user_id") &&
        col("c.ts").between(col("i.ts"),
          col("i.ts") + expr("INTERVAL 30 minutes")))
      .select(col("i.event_id"), col("c.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(batch.toSet == Set((100L, 200L)))
  }

  test("anomaly stream flags the spike the day it closes, state surviving batches") {
    import graft.streaming.EventAnomalyStream
    import graft.streaming.EventAnomalyStream.DayCount
    val src = Files.createTempDirectory("anom_src").toString + "/data"
    val cp = Files.createTempDirectory("anom_cp").toString
    val out = Files.createTempDirectory("anom_out").toString + "/data"
    def dc(u: Long, d: Int, n: Long) =
      DayCount(u, java.sql.Date.valueOf(f"2024-03-$d%02d"), n)
    // batch 1: 7 uniform-ish days for user 1, flat user 2
    val b1 = (1 to 7).map(d => dc(1L, d, if (d % 2 == 0) 2L else 3L)) ++
      (1 to 7).map(d => dc(2L, d, 4L))
    b1.toDF().write.parquet(src)
    def run(): Unit = {
      val schema = spark.read.parquet(src).schema
      val daily = spark.readStream.schema(schema).parquet(src).as[DayCount]
      val q = EventAnomalyStream.anomalyStream(daily)
        .toDF().writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).isEmpty, "no spike yet -> no anomalies")
    // batch 2: the spike (and another flat day for user 2) — the moments
    // from batch 1 must still be in the state store
    Seq(dc(1L, 8, 20L), dc(2L, 8, 4L)).toDF().write.mode("append").parquet(src)
    run()
    val got = spark.read.parquet(out).as[EventAnomalyStream.Anomaly].collect()
    assert(got.length == 1 && got.head.user_id == 1L && got.head.n == 20L)
    // prequential z over the same 7-day history == batch z on those days + spike
    val batchEv = (b1.filter(_.user_id == 1L) :+ dc(1L, 8, 20L))
      .flatMap(d => (1 to d.n.toInt).map(_ =>
        (d.user_id, java.sql.Timestamp.valueOf(d.day.toString + " 09:00:00"))))
      .toDF("user_id", "ts")
    val batchZ = graft.operators.EventOps.anomalousDays(batchEv, minDays = 5)
      .collect().filter(_.getAs[java.sql.Date]("day").toString == "2024-03-08")
    // batch includes the spike day itself in the stats, so values differ;
    // both must agree the spike is the unique >=2 sigma day
    assert(batchZ.length == 1)
  }

  test("streaming session windows emit once and match the batch sessionization") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = StreamingIngest.sessionAgg(
        mem.toDF.toDF("ts", "user_id", "value"),
        gap = "30 minutes", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val real = Seq(
      (t("2024-01-01 10:00:00"), 1L, 1.5),
      (t("2024-01-01 10:10:00"), 1L, 2.5),  // same session (gap < 30m)
      (t("2024-01-01 11:30:00"), 1L, 3.0),  // new session
      (t("2024-01-01 10:05:00"), 2L, 5.0))
    mem.addData(real: _*)
    q.processAllAvailable()
    // watermark advances at batch END; closed sessions emit on the NEXT
    // batch — two far-future sentinel batches flush all real sessions
    mem.addData((t("2024-01-03 00:00:00"), 999L, 0.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-05 00:00:00"), 999L, 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_out").filter($"user_id" =!= 999L)
      .orderBy($"user_id", $"session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    // batch twin: the SAME builder over the same rows (session_window and
    // the decimal-exact sum run identically in batch; watermark is a no-op)
    val expected = StreamingIngest.sessionAgg(
        real.toDF("ts", "user_id", "value"))
      .orderBy($"user_id", $"session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    assert(expected.length == 3, s"batch twin: ${expected.mkString(",")}")
    assert(got.sameElements(expected),
      s"stream ${got.mkString(",")} vs batch ${expected.mkString(",")}")
  }

  test("dropDuplicatesWithinWatermark dedups clustered keys with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = StreamingIngest.dedupWithinWatermark(
        mem.toDF.toDF("ts", "event_id", "value"), Seq("event_id"), "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ddw_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (t("2024-01-01 10:00:00"), 1L, 1.0),
      (t("2024-01-01 10:05:00"), 1L, 1.0),  // duplicate, same batch
      (t("2024-01-01 10:00:00"), 2L, 2.0))
    q.processAllAvailable()
    mem.addData(
      (t("2024-01-01 10:20:00"), 1L, 1.0),  // duplicate, later batch, in watermark
      (t("2024-01-01 10:30:00"), 3L, 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("ddw_out").select($"event_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)),
      s"each key exactly once: ${ids.mkString(",")}")
  }
}
