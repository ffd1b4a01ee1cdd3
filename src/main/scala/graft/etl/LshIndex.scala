package graft.etl

import graft.functions.CosineSimilarity
import graft.operators.SimilarityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Persisted LSH ANN index — the similarity-family sibling of
  * [[MinhashIndex]]: `sim_lsh_ann` recomputes the CORPUS side's
  * hyperplane buckets on every query, which is exactly backwards for a
  * serving path (the corpus is stable; the queries change). Two bucketed
  * tables:
  *
  *  - `<name>_buckets(vec_id, tbl, bucket)` bucketed by (tbl, bucket):
  *    candidate generation joins the (tiny, broadcast) query buckets
  *    against it with the corpus read in place — no exchange
  *    (LshIndexSpec walks the executed plan);
  *  - `<name>_vectors(vec_id, v)` bucketed by vec_id: the exact-cosine
  *    rerank fetches only CANDIDATE vectors from it, again in place.
  *
  * Probe cost is O(queries) shuffle + colocated reads of the touched
  * buckets; the corpus never moves. Refresh per ingest batch appends
  * with the same bucket spec (the [[MinhashIndex.append]] discipline
  * and caveats apply verbatim: drive appends from a committed batch
  * log). Planes are seeded and deterministic ([[SimilarityOps.lshPlanes]]),
  * so index and probe always agree on the bucketing — and the DuckDB
  * oracle replays it from emitted literals, making the indexed query
  * hash-checkable end to end. */
object LshIndex {

  final case class Tables(buckets: String, vectors: String)

  def tables(name: String): Tables =
    Tables(s"${name}_buckets", s"${name}_vectors")

  def build(s: SparkSession, embeddings: DataFrame, name: String,
      tables0: Int = 16, planesPerTable: Int = 4, dims: Int = 64,
      seed: Long = 42L, nBuckets: Int = 32): Tables = {
    val t = tables(name)
    Seq(t.buckets, t.vectors).foreach(MinhashIndex.dropTable(s, _))
    val corpus = embeddings.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v"))
    corpus.repartition(nBuckets, col("vec_id"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(t.vectors)
    val planes = SimilarityOps.lshPlanes(tables0, planesPerTable, dims, seed)
    SimilarityOps.signBuckets(s.table(t.vectors), "vec_id", planes)
      .repartition(nBuckets, col("tbl"), col("bucket"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "tbl", "bucket").sortBy("tbl", "bucket")
      .format("parquet").saveAsTable(t.buckets)
    t
  }

  /** Incremental refresh: append a batch's vectors and buckets under the
    * same bucket spec — probes stay corpus-exchange-free. Same
    * exactly-once contract as [[MinhashIndex.append]]: drive from a
    * committed batch log; a blind re-run duplicates index rows. */
  def append(s: SparkSession, embeddings: DataFrame, name: String,
      tables0: Int = 16, planesPerTable: Int = 4, dims: Int = 64,
      seed: Long = 42L, nBuckets: Int = 32): Unit = {
    val t = tables(name)
    val batch = embeddings.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v"))
    batch.repartition(nBuckets, col("vec_id"))
      .write.mode("append")
      .bucketBy(nBuckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(t.vectors)
    val planes = SimilarityOps.lshPlanes(tables0, planesPerTable, dims, seed)
    SimilarityOps.signBuckets(
        s.table(t.vectors).join(batch.select(col("vec_id")), "vec_id"),
        "vec_id", planes)
      .repartition(nBuckets, col("tbl"), col("bucket"))
      .write.mode("append")
      .bucketBy(nBuckets, "tbl", "bucket").sortBy("tbl", "bucket")
      .format("parquet").saveAsTable(t.buckets)
  }

  /** ANN search against the persisted index — same candidates, same
    * rerank, same results as [[SimilarityOps.lshAnn]] (spec-asserted and
    * oracle-replayed), with the corpus side read in place. */
  def search(s: SparkSession, queries: DataFrame, name: String,
      topK: Int = 5, tables0: Int = 16, planesPerTable: Int = 4,
      dims: Int = 64, seed: Long = 42L): DataFrame = {
    import s.implicits._
    val t = tables(name)
    val planes = SimilarityOps.lshPlanes(tables0, planesPerTable, dims, seed)
    val q = queries.select($"vec_id".as("q_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("qv"))
    val qb = SimilarityOps.signBuckets(
      q.select($"q_id", $"qv".as("v")), "q_id", planes)
    val cands = s.table(t.buckets)
      .join(broadcast(qb), Seq("tbl", "bucket"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"))
      .distinct()
    val w = Window.partitionBy($"q_id").orderBy($"cosine_sim".desc, $"neighbor_id".asc)
    cands
      .join(broadcast(q), "q_id")
      .join(s.table(t.vectors).withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id")
      .select($"q_id", $"neighbor_id",
        CosineSimilarity.cosineNative(s, $"qv", $"v").as("cosine_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= topK)
      .select($"q_id", $"rank", $"neighbor_id", $"cosine_sim")
      .orderBy($"q_id", $"rank")
  }
}
