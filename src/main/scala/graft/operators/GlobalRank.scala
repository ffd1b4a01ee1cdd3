package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed GLOBAL row numbering — the scale path for `ROW_NUMBER()
  * OVER (ORDER BY ...)` with no `PARTITION BY`.
  *
  * Spark executes a partition-less window by moving EVERY row to a single
  * partition (`WindowExec` warns exactly this), which is fine for the
  * reference's dashboard-cardinality ranking (one row per model,
  * `models_earning_distribution.py:100` — see [[WindowOps]] W1) but is the
  * canonical scale-killer once the ranked frame grows with the data: at
  * 100 TB the sort state of one task must hold the table.
  *
  * This is the classic two-phase rank (the public Spark recipe behind
  * `zipWithIndex`, re-expressed on DataFrames so codegen and AQE stay in
  * play):
  *
  *  1. range-repartition + sort within partitions on the full ordering —
  *     a distributed sort, each task holds 1/N of the data;
  *  2. pin the sorted frame (reliable `checkpoint`) so the ids below are
  *     assigned exactly once — range-boundary sampling is seeded by the
  *     RDD id, so a recomputation could place rows differently and a
  *     second action (or task retry) would silently mismatch the offsets
  *     collected below. Pinning is CORRECTNESS here, not caching;
  *  3. `monotonically_increasing_id()` encodes (partition, local position)
  *     as `pid << 33 | pos` for rows in sort order — decode both;
  *  4. one tiny aggregation (one row PER PARTITION, not per row) counts
  *     rows per partition; the driver prefix-sums those counts into
  *     per-partition offsets (bounded by the partition count — never by
  *     the data) and broadcast-joins them back;
  *  5. `rank = offset(pid) + pos + 1`.
  *
  * No `WindowExec` appears in the plan at all (spec-asserted), the sort is
  * the only data-sized exchange, and the result is identical to the
  * single-partition window because range partitioning is order-preserving
  * across partition ids: every row in partition p sorts before every row
  * in p+1, and ties cannot straddle partitions (equal keys map to the same
  * range).
  *
  * The ordering must be TOTAL (include a tiebreak column) — with
  * duplicate full keys the assignment within a tie group is undefined,
  * same as the window form.
  *
  * The pin is a RELIABLE checkpoint (the [[ConnectedComponents]]
  * pattern, not `localCheckpoint`): it survives executor loss, and it
  * leaves nothing in `getPersistentRDDs` — every declared query must end
  * its action cache-clean (OperatorSmokeSpec enforces). A temp
  * checkpoint dir is provisioned when the session has none; cluster
  * deployments should `setCheckpointDir` to durable storage. Checkpoint
  * files live for the returned frame's lifetime (Spark never reclaims
  * reliable checkpoints itself).
  */
object GlobalRank {

  private val PosBits = 33 // monotonically_increasing_id: pid << 33 | pos

  /** `df` with `rankCol` = global 1-based row number under `order`.
    * `numPartitions` <= 0 uses `spark.sql.shuffle.partitions`. */
  def withRowNumber(df: DataFrame, rankCol: String, order: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "global ranking needs at least one sort column")
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      // a driver-local temp dir is only a valid checkpoint target when
      // driver and executors share a filesystem — refuse loudly on a
      // cluster rather than fail later with missing-checkpoint reads
      require(sc.master.startsWith("local"),
        "GlobalRank needs a reliable checkpoint dir on a cluster: call " +
          "sparkContext.setCheckpointDir(<durable storage>) first")
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft_rank_ckpt").toString)
    }
    val sorted = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__gr_id", monotonically_increasing_id())
      .checkpoint()
    val pid = shiftright(col("__gr_id"), PosBits)
    val pos = col("__gr_id").bitwiseAND(lit((1L << PosBits) - 1))
    // driver-small: one (partition, count) row per range partition —
    // bounded by n, independent of data size
    val counts = sorted
      .groupBy(pid.as("__gr_pid")).agg(count(lit(1)).as("__gr_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // offset of partition p = rows in all partitions before p (prefix sum)
    val offsetRows = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsetRows.toSeq.toDF("__gr_pid", "__gr_off")
    sorted
      .withColumn("__gr_pid", pid)
      .join(broadcast(offDf), "__gr_pid")
      .withColumn(rankCol, col("__gr_off") + pos + 1)
      .drop("__gr_id", "__gr_pid", "__gr_off")
  }
}
