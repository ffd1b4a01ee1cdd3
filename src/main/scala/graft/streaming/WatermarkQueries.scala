package graft.streaming

import graft.core.{QueryDef, QueryModule}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time WATERMARK semantics as a declared, oracle-checked query —
  * the one Structured-Streaming behavior a 100 TB ingest actually leans
  * on: out-of-order arrival, bounded state, late data either folded into
  * a still-open window or dropped once the window is finalized.
  *
  * The engine's streaming surface (StreamingIngest, ContinuousIngest,
  * CorpusStream) is unit-tested, but unit tests don't hash-check the
  * WATERMARK ALGEBRA itself. This module replays a deterministic
  * out-of-order arrival sequence through a real `readStream` →
  * `withWatermark` → windowed-count → append-mode sink pipeline and
  * declares the final emitted state, which DuckDB reproduces from the
  * watermark rules alone (no streaming engine on the oracle side):
  *
  *  - trigger 1 ingests the ON-TIME slice (everything before the split
  *    date whose id survives the holdback hash), seeding the watermark
  *    at `max(ts in slice 1) − delay`;
  *  - trigger 2 ingests the timeline TAIL (everything at/after the
  *    split date), which carries the global max event time;
  *  - trigger 3 ingests the genuinely-late HOLDBACK rows. A late row
  *    lands iff its 1-day window is still open against the late-event
  *    watermark (`window_end > wm`) — rows whose windows are finalized
  *    are DROPPED, and because append mode emits a window exactly once,
  *    accepting them would double-count;
  *  - eviction then flushes every window whose end is ≤ the final
  *    watermark `max(all ts) − delay`; newer windows stay in state,
  *    deliberately unemitted.
  *
  * Two Spark subtleties the three-slice design pins down (both verified
  * empirically on 4.1.2 and both load-bearing for the oracle):
  * late-event filtering keys on the WINDOW END, not the row's own ts (a
  * row older than the watermark still lands if its window is open), and
  * since the two-watermark split (SPARK-40925) the late-event watermark
  * LAGS the eviction watermark by one micro-batch — which is exactly
  * why the holdback needs its own third trigger: it must arrive after
  * the batch whose offsets entry carries slice 1's watermark, or
  * nothing is ever old enough to drop.
  *
  * Arrival order is made deterministic the way FileStreamSource actually
  * orders files — (modification time, path) — by staging each slice as
  * ONE parquet file with a pinned mtime and `maxFilesPerTrigger = 1`.
  *
  * At scale nothing here is test-rig-shaped: the same watermark bounds
  * the state store (windows older than `max ts − delay` are evicted,
  * so state is O(open windows × types), not O(history)), and the append
  * sink writes each finalized window exactly once — the idempotent
  * gold-table contract.
  */
object WatermarkQueries extends QueryModule {

  private val SplitDate = "2024-01-25"
  private val DelayDays = 3

  private def root(sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${sys.props("java.io.tmpdir")}/graft_stream/wm_$safe"
  }

  private def wipe(s: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Stage `df` as exactly one parquet file at `dest` with a pinned
    * mtime — the knob FileStreamSource's (modTime, path) ordering keys
    * on, so the replayed arrival sequence is deterministic. */
  private[graft] def stageFile(s: SparkSession, df: DataFrame,
      stageDir: String, dest: String, mtimeMs: Long): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(stageDir)
    val sp = new Path(stageDir)
    val fs = sp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(sp)
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .headOption.getOrElse(
        throw new IllegalStateException(s"no parquet staged under $stageDir"))
    val dp = new Path(dest)
    fs.mkdirs(dp.getParent)
    if (!fs.rename(part, dp))
      throw new IllegalStateException(s"stage rename failed: $part -> $dp")
    fs.setTimes(dp, mtimeMs, -1)
    fs.delete(sp, true)
  }

  /** Run the watermark pipeline over `slices` (arrival order) and return
    * the batch read of everything the append sink emitted. Shared by the
    * declared query (events-table slices) and WatermarkLateSpec's
    * hand-built frames.
    *
    * The stream runs in a DERIVED session (`newSession`: shared
    * SparkContext, independent SQLConf — the caller's session is never
    * mutated, per the GraftSession rule) with state partitioning sized
    * to the stream: a stateful micro-batch pays one state-store
    * commit PER SHUFFLE PARTITION per batch, so partitions must track
    * the stream's key cardinality, not a batch-analytics default — at
    * 100 TB that means sizing to the cluster, here to the fixture
    * (3 micro-batches × 32 idle state stores was pure overhead, ~4×
    * the whole query). */
  private[graft] def runWindowed(s: SparkSession, base: String,
      slices: Seq[DataFrame], delay: String): DataFrame = {
    wipe(s, base)
    slices.zipWithIndex.foreach { case (df, i) =>
      stageFile(s, df, s"$base/stage$i", f"$base/in/$i%04d.parquet",
        100000L * (i + 1))
    }
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = ss.read.parquet(s"$base/in").schema
    val stream = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in")
    val agg = stream
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // read back on the CALLER's session — the result must not carry the
    // derived session's fixture conf into downstream plans
    s.read.parquet(s"$base/out")
      .orderBy(col("window_start"), col("event_type"))
  }

  /** The declared arrival sequence over the events table: slice 1 is
    * everything before [[SplitDate]] except the `event_id % 4 == 0`
    * holdback; slice 2 is the timeline tail (at/after the split — it
    * carries the global max event time, so the final watermark is
    * `max(all ts) − delay`); slice 3 is the holdback, arriving
    * genuinely late against slice 1's watermark. */
  def watermarkLate(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.operators.EventOps.events(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"))
    val split = lit(java.sql.Timestamp.valueOf(s"$SplitDate 00:00:00"))
    val onTime = ev.filter(col("ts") < split && col("event_id") % 4 =!= 0)
    val tail = ev.filter(col("ts") >= split)
    val holdback = ev.filter(col("ts") < split && col("event_id") % 4 === 0)
    runWindowed(s, root(dir), Seq(onTime, tail, holdback), s"$DelayDays days")
  }

  /** The oracle replays the watermark algebra in plain SQL: the
    * late-event watermark from slice 1's max, per-row late acceptance
    * (`window_end > wm_late`), final emission
    * (`window_end <= max(all) − delay`). A value drift in ANY of
    * Spark's three watermark decisions — advancement, late-drop,
    * flush — breaks the hash. */
  private val evWatermark = QueryDef(
    "ev_watermark_late",
    Some(s"""
      WITH f1 AS (
        SELECT ts, event_type FROM events
        WHERE ts < TIMESTAMP '$SplitDate 00:00:00' AND event_id % 4 <> 0),
      f2 AS (
        SELECT ts, event_type FROM events
        WHERE ts >= TIMESTAMP '$SplitDate 00:00:00'),
      f3 AS (
        SELECT ts, event_type FROM events
        WHERE ts < TIMESTAMP '$SplitDate 00:00:00' AND event_id % 4 = 0),
      wml AS (SELECT MAX(ts) - INTERVAL $DelayDays DAY AS w FROM f1),
      wmf AS (SELECT MAX(ts) - INTERVAL $DelayDays DAY AS w FROM events),
      accepted AS (
        SELECT ts, event_type FROM f1
        UNION ALL
        SELECT ts, event_type FROM f2
        UNION ALL
        SELECT f3.ts, f3.event_type FROM f3
        WHERE time_bucket(INTERVAL 1 DAY, f3.ts) + INTERVAL 1 DAY
              > (SELECT w FROM wml))
      SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
        event_type, COUNT(*) AS n_events
      FROM accepted
      GROUP BY 1, 2
      HAVING time_bucket(INTERVAL 1 DAY, ts) + INTERVAL 1 DAY
             <= (SELECT w FROM wmf)
      ORDER BY window_start, event_type"""),
    (s, dir) => watermarkLate(s, dir))

  override val defs: Seq[QueryDef] = Seq(evWatermark)
}
