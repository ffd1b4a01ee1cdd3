package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — for the hot-key shapes AQE's skew
  * join can't fix (e.g. a single group key holding 10% of a 100 TB
  * fact, or a skewed key joining a dimension too big to broadcast).
  *
  * Both transforms are algebraic rewrites with identical results:
  *  - salted aggregation = two-phase: partial aggregate on
  *    (keys, salt) spreads the hot key over `buckets` reducers, then a
  *    cheap final aggregate over the partials;
  *  - salted join = salt column on the fact side (deterministic hash,
  *    no RNG) × `buckets`-fold replication of the dimension side, so
  *    one hot key's rows land on `buckets` different tasks.
  */
object Salting {

  /** Deterministic salt in [0, buckets) derived from a row expression. */
  def salt(of: Column, buckets: Int): Column =
    pmod(xxhash64(of), lit(buckets.toLong)).cast("int")

  /** Two-phase SUM over possibly-skewed group keys. `saltBy` must be a
    * column that varies WITHIN a group (any high-cardinality column). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBy: String, buckets: Int = 16): DataFrame = {
    val partial = df
      .groupBy((keys.map(col) :+ salt(col(saltBy), buckets).as("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Skew-safe inner equi-join: fact side gets a deterministic salt,
    * dimension side is replicated `buckets` times, join key becomes
    * (key, salt). Result equals the plain join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBy: String, buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(col(saltBy), buckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact
      .join(replicatedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Measure the skew and pick the salt factor, instead of making the
    * caller guess: one aggregate over the fact computes the hottest
    * key's share; the factor is how many ideal reducer-shares that key
    * occupies (hot / (total / parallelism)), clamped to [1, maxBuckets].
    * 1 means "don't salt" — salting un-skewed data just adds a second
    * aggregate for nothing. The measurement is itself a keyed count —
    * map-side combinable, safe on the skewed input.
    *
    * `sampleFraction < 1` measures on a seeded uniform row sample: the
    * factor is the RATIO hot/(total/parallelism), and both numerator and
    * denominator scale by the sampling fraction, so the estimate is
    * unbiased — while the measurement pass stops costing a full
    * evaluation of `df`. That matters when `df` is itself expensive
    * (e.g. an exploded n-gram frame: measuring on the full frame would
    * compute the explode TWICE, once to measure and once to run — a
    * whole extra corpus pass at 100 TB). Only large factors matter, and
    * those are exactly the ones a sample resolves reliably; noise around
    * the clamp floor just toggles 1↔2, which is harmless either way. */
  def suggestBuckets(df: DataFrame, keys: Seq[String], parallelism: Int,
      maxBuckets: Int = 64, sampleFraction: Double = 1.0): Int = {
    val measured =
      if (sampleFraction < 1.0) df.sample(withReplacement = false, sampleFraction, seed = 42L)
      else df
    val r = measured.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("hot"), sum(col("n")).as("total"))
      .head()
    if (r.isNullAt(0)) 1
    else {
      val hot = r.getLong(0).toDouble
      val ideal = r.getLong(1).toDouble / parallelism
      math.max(1, math.min(maxBuckets, math.ceil(hot / math.max(ideal, 1.0)).toInt))
    }
  }

  /** [[saltedSum]] with the factor measured from the data; falls back to
    * a plain aggregate when the keys are not skewed. */
  def autoSaltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBy: String, parallelism: Int): DataFrame = {
    val buckets = suggestBuckets(df, keys, parallelism)
    if (buckets <= 1)
      df.groupBy(keys.map(col): _*)
        .agg(sum(col(valueCol)).as(s"sum_$valueCol"))
    else saltedSum(df, keys, valueCol, saltBy, buckets)
  }
}
