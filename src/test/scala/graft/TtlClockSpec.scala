package graft

import graft.streaming.WatermarkQueries
import org.apache.spark.sql.{Encoders, streaming => st}
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Pins the CLOCK that `TimeMode.ProcessingTime` transformWithState
  * TTL expiry runs on — the fact `ev_stream_ttl2`'s straddle assert is
  * deliberately specific to: Spark pins `batchTimestampMs` (the
  * trigger's timestamp) for the whole batch, stamping TTL'd writes with
  * `batchTimestampMs + ttl` and checking reads against
  * `batchTimestampMs`, so BATCH DURATIONS are irrelevant to expiry and
  * trigger-timestamp gaps fully determine the retained/expired pattern.
  * If an upstream change ever moved TTL to a wall clock, these tests
  * fail the build — instead of the straddle passing while the hash
  * breaks (the failure mode a wall-clocked TTL would create).
  */
private class TtlClockProbe(ttlMs: Long, sleepMs: Long,
    sleepBeforeWrite: Boolean)
    extends st.StatefulProcessor[String, (String, Long), (String, Long, Boolean)] {
  @transient private var seen: st.MapState[Long, Boolean] = _
  @transient private var n: st.ValueState[Long] = _
  override def init(outputMode: st.OutputMode, timeMode: st.TimeMode): Unit = {
    seen = getHandle.getMapState[Long, Boolean]("seen",
      Encoders.scalaLong, Encoders.scalaBoolean,
      st.TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    n = getHandle.getValueState[Long]("n", Encoders.scalaLong,
      st.TTLConfig.NONE)
  }
  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      tv: st.TimerValues): Iterator[(String, Long, Boolean)] = {
    while (rows.hasNext) rows.next()
    val batch = (if (n.exists()) n.get() else 0L) + 1L
    n.update(batch)
    if (batch == 1L) {
      // batch 1 plants the entry, with the sleep moving wall time far
      // from the trigger stamp on whichever side the test probes
      if (sleepBeforeWrite) Thread.sleep(sleepMs)
      seen.updateValue(7L, true)
      if (!sleepBeforeWrite) Thread.sleep(sleepMs)
      Iterator.single((key, batch, seen.containsKey(7L)))
    } else Iterator.single((key, batch, seen.containsKey(7L)))
  }
}

class TtlClockSpec extends SparkSpec {
  import spark.implicits._

  /** Stage `nBatches` one-row files, run the probe processor over them
    * (one file per trigger), return the emitted rows plus each data
    * batch's (trigger timestamp, batch duration). */
  private def runProbe(tag: String, proc: TtlClockProbe,
      nBatches: Int): (Seq[(Long, Boolean)], Seq[(Long, Long)]) = {
    val base = java.nio.file.Files.createTempDirectory(tag).toString
    (0 until nBatches).foreach { i =>
      WatermarkQueries.stageFile(spark,
        Seq(("a", i.toLong)).toDF("event_type", "user_id"),
        s"$base/stage$i", f"$base/in/$i%04d.parquet", 100000L * (i + 1))
    }
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val qName = s"graft_ttlclock_$tag"
    val stamps =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == qName && e.progress.numInputRows > 0)
          stamps.add((
            java.time.Instant.parse(e.progress.timestamp).toEpochMilli,
            e.progress.batchDuration))
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    ss.streams.addListener(listener)
    try {
      val schema = ss.read.parquet(s"$base/in").schema
      val out = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$base/in")
        .selectExpr("event_type", "CAST(user_id AS LONG) AS user_id")
        .as[(String, Long)]
        .groupByKey(_._1)
        .transformWithState(proc,
          st.TimeMode.ProcessingTime(), st.OutputMode.Append())
        .toDF("key", "batch_n", "saw")
      val q = out.writeStream
        .queryName(qName)
        .outputMode("append")
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.ProcessingTime("250 milliseconds"))
        .start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (stamps.size < nBatches && q.isActive &&
          System.nanoTime() < deadline)
        Thread.sleep(50)
      q.stop(); q.awaitTermination()
      require(stamps.size == nBatches,
        s"expected $nBatches data batches, saw ${stamps.size}")
      val rows = spark.read.parquet(s"$base/out")
        .orderBy($"batch_n")
        .collect().map(r => (r.getLong(1), r.getBoolean(2))).toSeq
      val ts = {
        val it = stamps.iterator()
        val b = Seq.newBuilder[(Long, Long)]
        while (it.hasNext) b += it.next()
        b.result().sortBy(_._1)
      }
      (rows, ts)
    } finally ss.streams.removeListener(listener)
  }

  test("reads are batch-clocked: an entry stays visible within its own batch past any wall-time TTL") {
    // TTL 400 ms, then 1200 ms of wall time between the write and the
    // re-read IN THE SAME BATCH: a wall-clocked read would see the
    // entry expired; the batch-clocked read compares two copies of the
    // same frozen trigger stamp and must see it
    val (rows, _) = runProbe("rd",
      new TtlClockProbe(ttlMs = 400, sleepMs = 1200,
        sleepBeforeWrite = false), nBatches = 1)
    assert(rows == Seq((1L, true)),
      s"same-batch read after wall-time > TTL must still see the entry " +
        s"(batch-clocked expiry), got $rows")
  }

  test("writes are stamped with the trigger time, not the wall moment of the update") {
    // TTL 1000 ms; batch 1 sleeps 3000 ms BEFORE writing, so the write's
    // wall moment sits ~3 s after its trigger stamp. Batch 2 triggers
    // right after batch 1 ends: > TTL past batch 1's trigger (expired
    // under the batch stamp) but < TTL past the write's wall moment
    // (retained under a wall stamp). The probe must MISS.
    val ttl = 1000L
    val (rows, ts) = runProbe("wr",
      new TtlClockProbe(ttlMs = ttl, sleepMs = 3000,
        sleepBeforeWrite = true), nBatches = 2)
    val gap = ts(1)._1 - ts(0)._1
    val wallGap = ts(1)._1 - (ts(0)._1 + ts(0)._2)
    // timing preconditions (host-load guard): inconclusive runs cancel
    // instead of asserting the semantic on gaps that don't separate
    // the two clock models
    assume(gap >= ttl + 100,
      s"batch-2 trigger only $gap ms after batch 1's — can't probe expiry")
    assume(wallGap <= ttl - 100,
      s"batch-2 trigger $wallGap ms after batch 1 ENDED — a wall-stamped " +
        "write would also be expired; inconclusive")
    assert(rows.take(1) == Seq((1L, true)))
    assert(rows(1) == (2L, false),
      s"entry written at wall ~t1+3000 must expire by batch-2 trigger " +
        s"(stamp = trigger time), got ${rows(1)}")
  }
}
