package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory — the ONE place the engine's required configuration
  * lives, so no operator ever mutates session conf as a side effect.
  *
  *  - UTC + ANSI off: Athena-permissive cast/overflow semantics
  *    (SURVEY §7.4) and oracle parity.
  *  - `nanosAsLong`: some testdata generations store events.ts as parquet
  *    TIMESTAMP(NANOS), which Spark's vectorized reader rejects; reading
  *    as raw nanos lets [[graft.operators.EventOps.events]] rebuild a
  *    lossless µs timestamp. Harmless when the column ships as
  *    TIMESTAMP(MICROS) — the loader branches on the arrived type.
  *  - GraftExtensions: registers `cosine_sim` and the DimBroadcastRule.
  *
  * Callers append deployment-specific settings (master cores, shuffle
  * partitions sized to the cluster, AQE) on the returned builder.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
