package graft.operators

import graft.core._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — images/audio/video as opaque `binary` columns with
  * a typed metadata struct (BASELINE.json north-star operator).
  *
  * The Spark-side plumbing (schema, batch shape, partitioning) is real and
  * tested; the actual media DECODE is a deterministic STUB (`decodeStub`)
  * because no image/audio libraries ship in this container — swap the stub
  * body for javax.imageio / ffmpeg bindings in production.
  *
  * Scale notes: media rows are large and skewed — `repartition` by a
  * byte-size-aware bucket before decode so one executor doesn't take all
  * the 4K videos; decode runs per-partition (one model/codec init per
  * partition, amortized over the batch, like mapInPandas batching).
  */
object MultimodalOps extends QueryModule {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a synthetic media payload + typed metadata to each document —
    * the ingestion shape a real pipeline produces (payload bytes are
    * deterministic so the whole pipeline is testable). */
  def withSyntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(concat(lit("IMG:"), col("lang"), lit(":"), col("text")), "utf-8")
        .as("media"),
      struct(
        lit("png").as("format"),
        (pmod(col("doc_id"), lit(640)) + 32).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast(IntegerType).as("height"),
        lit(0L).as("duration_ms")).as("meta"))

  /** ======== STUB ========
    * Deterministic fake "decode + feature extract": real code would decode
    * `media` with an image library and run a feature extractor. The stub
    * derives a fixed-dim float vector from the bytes so shapes, batching,
    * and determinism are all exercised end-to-end. */
  def decodeStub(bytes: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L // deterministic rolling hash over the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dims) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = (h >>> 40).toFloat / (1 << 24).toFloat
      d += 1
    }
    out
  }

  /** Per-partition decode/feature-extract over the binary column —
    * the mapInPandas-equivalent batch shape: one iterator per partition,
    * decoder state initialized once per partition. */
  def extractFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(FloatType)),
      StructField("n_bytes", IntegerType)))
    val rdd = media
      .select(col("doc_id"), col("media"))
      .repartition(col("doc_id")) // spread skewed media rows
      .rdd
      .mapPartitions { rows =>
        // per-partition init happens HERE in a real decoder (codec/model)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          Row(r.getAs[Long]("doc_id"), decodeStub(bytes, dims).toSeq, bytes.length)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Binary column plumbing end-to-end with a DuckDB oracle: payload
    * length + content hash + metadata projection — proves bytes survive
    * the engine byte-exact. */
  private val mmBinary = QueryDef(
    "mm_binary_metadata",
    Some("""
      SELECT doc_id,
        octet_length(encode('IMG:' || lang || ':' || text)) AS n_bytes,
        md5('IMG:' || lang || ':' || text) AS media_md5,
        'png' AS format,
        CAST(doc_id % 640 + 32 AS INTEGER) AS width,
        CAST(doc_id % 480 + 32 AS INTEGER) AS height
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      withSyntheticMedia(T(s, dir, "documents"))
        .select(
          $"doc_id",
          length($"media").cast(LongType).as("n_bytes"),
          md5($"media").as("media_md5"),
          $"meta.format".as("format"),
          $"meta.width".as("width"),
          $"meta.height".as("height"))
        .orderBy($"doc_id")
    })

  /** Feature extraction pipeline (stubbed decode) — rows-only check; the
    * spec asserts shape + determinism. */
  private val mmFeatures = QueryDef(
    "mm_feature_extract",
    None,
    (s, dir) => {
      import s.implicits._
      extractFeatures(withSyntheticMedia(T(s, dir, "documents")))
        .select($"doc_id", size($"features").as("dims"), $"n_bytes")
        .orderBy($"doc_id")
    })

  override val defs: Seq[QueryDef] = Seq(mmBinary, mmFeatures)
}
