package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — images/audio/video as opaque `binary` columns with
  * a typed metadata struct (BASELINE.json north-star operator).
  *
  * The Spark-side plumbing (schema, batch shape, partitioning) is real and
  * tested. Byte-level HEADER decode (PNG IHDR, RIFF/WAVE) is REAL —
  * pure-JVM parsing, oracle-checked (`mm_header_decode`). Only the ML
  * FEATURE extraction is a deterministic STUB (`decodeStub`): a real
  * embedding model doesn't ship in this container — swap the stub body
  * for the model runtime in production.
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

  /** Oracle-portable per-dimension feature: hex chars 25–32 of
    * md5(payload ++ ":" ++ dim), parsed base-16 — same construction as
    * [[DedupOps]]' portable minhash permutations, so DuckDB replays it
    * as `('0x' || substr(md5(s || ':' || dim), 25, 8))::UBIGINT`.
    * Integer-valued on purpose: the correctness gate hashes formatted
    * values, and integers cannot drift in formatting where floats can. */
  def portableFeature(md: java.security.MessageDigest,
      payload: Array[Byte], dim: Int): Long = {
    md.reset()
    md.update(payload)
    md.update(s":$dim".getBytes("UTF-8"))
    val digest = md.digest()
    // low 4 bytes of the 16-byte digest = hex chars 25..32, as unsigned
    java.lang.Integer.toUnsignedLong(
      java.nio.ByteBuffer.wrap(digest, 12, 4).getInt)
  }

  /** The declared feature-extract pipeline: one (doc_id, dim, feature)
    * row per dimension, digest state initialized once per partition —
    * the exact batch shape a real per-partition model decoder has. */
  def extractFeaturesPortable(media: DataFrame, dims: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dim", LongType),
      StructField("feature", LongType)))
    val rdd = media
      .select(col("doc_id"), col("media"))
      .repartition(col("doc_id")) // spread skewed media rows
      .rdd
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val id = r.getAs[Long]("doc_id")
          (0 until dims).iterator
            .map(d => Row(id, d.toLong, portableFeature(md, bytes, d)))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** ======== REAL decode (no stub) ========
    * Byte-level media HEADER decode needs no external library, so this
    * part is real: PNG IHDR (big-endian dims after the 8-byte
    * signature, CRC32-valid chunk) and RIFF/WAVE (little-endian chunk
    * walk to `fmt `/`data`, duration = data bytes / byte rate). Only
    * the ML FEATURE extraction above remains stubbed — that genuinely
    * needs a model. */
  def pngHeader(width: Int, height: Int): Array[Byte] = {
    val chunk = java.nio.ByteBuffer.allocate(17) // type + IHDR data
    chunk.put("IHDR".getBytes("US-ASCII"))
    chunk.putInt(width).putInt(height)
    chunk.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32()
    crc.update(chunk.array())
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 17 + 4)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13).put(chunk.array()).putInt(crc.getValue.toInt)
    bb.array()
  }

  def wavHeader(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val channels = 1; val bits = 16
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(channels.toShort)
    bb.putInt(sampleRate).putInt(sampleRate * blockAlign)
    bb.putShort(blockAlign.toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array() // header-only payload: data size is declared, samples elided
  }

  /** Parse (format, width, height, duration_ms) out of a media payload;
    * unrecognized bytes classify as ("unknown", -1, -1, -1) instead of
    * failing the batch — corrupt rows are data, not exceptions. */
  def parseMediaMeta(bytes: Array[Byte]): (String, Int, Int, Long) = {
    def be32(o: Int) = java.nio.ByteBuffer.wrap(bytes, o, 4).getInt
    def le32(o: Int) = java.nio.ByteBuffer.wrap(bytes, o, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    def ascii(o: Int, n: Int) = new String(bytes, o, n, "US-ASCII")
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    if (bytes.length >= 24 && bytes.take(8).sameElements(pngSig) &&
        ascii(12, 4) == "IHDR")
      ("png", be32(16), be32(20), 0L)
    else if (bytes.length >= 12 && ascii(0, 4) == "RIFF" &&
        ascii(8, 4) == "WAVE") {
      // chunk walk: fmt/data may sit anywhere after the RIFF header.
      // Size fields are attacker-controlled data at corpus scale: a
      // negative size must not stall the walk (hung task) and a
      // truncated fmt chunk must not throw — malformed structure
      // classifies as "unknown", honoring the corrupt-rows-are-data
      // contract above.
      var o = 12; var byteRate = -1; var dataSize = -1; var malformed = false
      while (!malformed && o + 8 <= bytes.length && (byteRate < 0 || dataSize < 0)) {
        val id = ascii(o, 4); val sz = le32(o + 4)
        if (sz < 0) malformed = true
        else {
          if (id == "fmt ") {
            if (o + 20 <= bytes.length) byteRate = le32(o + 16)
            else malformed = true // truncated fmt chunk
          } else if (id == "data") dataSize = sz
          // Long arithmetic: o + 8 + sz can overflow Int near MaxValue
          o = math.min(o.toLong + 8L + sz.toLong + (sz & 1), bytes.length.toLong).toInt
        }
      }
      if (!malformed && byteRate > 0 && dataSize >= 0)
        ("wav", -1, -1, dataSize.toLong * 1000L / byteRate)
      else ("unknown", -1, -1, -1L)
    } else ("unknown", -1, -1, -1L)
  }

  /** Synthesize REAL media payloads (valid PNG / WAV headers) with
    * dimensions derived from doc_id — so the decode below is checkable
    * against a formula-only DuckDB oracle: the parser must recover
    * exactly the values the formulas put into the bytes. */
  def withRealMediaHeaders(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes =
          if (id % 2 == 0)
            pngHeader((id % 640 + 32).toInt, (id % 480 + 32).toInt)
          else {
            val rate = 8000 + (id % 4).toInt * 4000
            wavHeader(rate, rate * (1 + (id % 5).toInt))
          }
        Row(id, bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-partition header decode over the binary column — same batch
    * shape as [[extractFeatures]] but with a REAL parser. */
  def decodeMediaMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)))
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val (f, w, h, d) = parseMediaMeta(r.getAs[Array[Byte]]("media"))
        Row(r.getAs[Long]("doc_id"), f, w, h, d)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** ======== REAL image decode (JDK ImageIO — no stub) ========
    * A COMPLETE valid PNG: IHDR + IDAT (zlib-deflated filtered
    * scanlines) + IEND, every chunk CRC32'd — decodable by any PNG
    * reader, including the JDK's own `javax.imageio` (which ships in
    * every JVM, so "no media libs in the container" doesn't apply to
    * PNG). Solid-fill RGB keeps the bytes small and the pixel stats
    * formula-predictable. */
  def pngImage(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] =
    pngPixels(width, height, (_, _) => (r, g, b))

  /** Per-pixel PNG builder — the gradient fills the perceptual-hash
    * query uses come from a formula the DuckDB oracle replays. */
  def pngPixels(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = 1 + width * 3 // filter byte + RGB pixels
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = y * stride + 1 + x * 3
        val (r, g, b) = px(x, y)
        raw(o) = r.toByte; raw(o + 1) = g.toByte; raw(o + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(tpe.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte) // 8-bit, truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte)
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      chunk("IHDR", ihdr.array()) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty)
  }

  /** Decode a full image with the JDK reader and compute real pixel
    * statistics — width/height from the decoded raster (not the header)
    * and exact per-channel means over every pixel. */
  def decodeImageStats(bytes: Array[Byte]): (Int, Int, Double, Double, Double) = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Full image pipeline as a declared query: complete PNGs are built
    * from doc_id-derived dimensions/colors, DECODED BY ImageIO on the
    * executors (per-partition reader, mapInPandas batch shape), and the
    * decoded raster's stats must hash-match the DuckDB oracle computing
    * the generating formulas — a real compress→decode→measure round
    * trip, zero stubs. Solid fill ⇒ channel means are exact integers in
    * double form on both engines. */
  private val mmImage = QueryDef(
    "mm_image_decode",
    Some("""
      SELECT doc_id,
        CAST(doc_id % 13 + 4 AS INTEGER) AS width,
        CAST(doc_id % 11 + 4 AS INTEGER) AS height,
        CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
        CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      val spark = s
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("mean_r", DoubleType),
        StructField("mean_g", DoubleType),
        StructField("mean_b", DoubleType)))
      val rdd = T(s, dir, "documents").select($"doc_id").rdd.mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val png = pngImage((id % 13 + 4).toInt, (id % 11 + 4).toInt,
            (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)
          val (w, h, mr, mg, mb) = decodeImageStats(png)
          Row(id, w, h, mr, mg, mb)
        }
      }
      spark.createDataFrame(rdd, outSchema).orderBy($"doc_id")
    })

  /** REAL image resize (JDK Graphics2D — no stub): decode, scale with
    * nearest-neighbor (deterministic — bilinear blends would still be
    * deterministic here since the fill is solid, but NN keeps the
    * policy obvious), re-encode as PNG. The round trip
    * build→decode→resize→encode→decode is the full transform path a
    * training pipeline runs before feature extraction. */
  def resizePng(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(src != null, "undecodable image payload")
    val dst = new java.awt.image.BufferedImage(outW, outH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(src, 0, 0, outW, outH, null)
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    out.toByteArray
  }

  /** Resize pipeline as a declared query: built PNGs are resized to a
    * fixed 8×8 thumbnail on the executors and re-measured — decoded
    * thumbnail dims and channel means must match the oracle formulas
    * (solid fill survives any resampling exactly). */
  private val mmResize = QueryDef(
    "mm_image_resize",
    Some("""
      SELECT doc_id,
        CAST(8 AS INTEGER) AS width,
        CAST(8 AS INTEGER) AS height,
        CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
        CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      val spark = s
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("mean_r", DoubleType),
        StructField("mean_g", DoubleType),
        StructField("mean_b", DoubleType)))
      val rdd = T(s, dir, "documents").select($"doc_id").rdd.mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(0)
          val png = pngImage((id % 13 + 4).toInt, (id % 11 + 4).toInt,
            (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)
          val (w, h, mr, mg, mb) = decodeImageStats(resizePng(png, 8, 8))
          Row(id, w, h, mr, mg, mb)
        }
      }
      spark.createDataFrame(rdd, outSchema).orderBy($"doc_id")
    })

  /** dHash of a DECODED image raster: compare each pixel's gray to its
    * right neighbor over a (cols+1)×rows grid, MSB-first fold — the
    * standard difference perceptual hash. Images sharing a gradient
    * pattern collapse to one hash regardless of byte-level encoding
    * differences. */
  def dHash(img: java.awt.image.BufferedImage, cols: Int, rows: Int): Long = {
    var h = 0L
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) {
        val a = img.getRGB(x, y) & 0xFF
        val b = img.getRGB(x + 1, y) & 0xFF
        h = h * 2 + (if (b > a) 1L else 0L)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Image DEDUP by perceptual hash — the multimodal sibling of
    * [[DedupOps]]'s text fingerprints: build gradient PNGs whose pixel
    * formula repeats every 50 ids (the planted duplicate classes),
    * REALLY encode + ImageIO-decode them on executors, dHash the decoded
    * raster, and group by hash (keeper = min doc_id — the exact-dedup
    * policy). The oracle replays the dHash from the generating formula,
    * so the whole encode→decode→hash round trip must be lossless for
    * the row to stay green. Declared at 32 bits (4×8 comparisons —
    * DuckDB's BIGINT fold cannot wrap into the sign bit); Bench measures
    * the 64-bit production variant (8×8, Spark-only), the same
    * declared-portable-vs-production split as dd_simhash. */
  private def imageDhashFrame(s: SparkSession, dir: String,
      cols: Int, rows: Int): DataFrame = {
    import s.implicits._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dhash", LongType)))
    val rdd = T(s, dir, "documents").select($"doc_id").rdd.mapPartitions { rws =>
      rws.map { row =>
        val id = row.getLong(0)
        val seed = id % 50 // duplicate class: same gradient every 50 ids
        val png = pngPixels(cols + 1, rows, (x, y) => {
          // quadratic-in-x so the horizontal STEP varies per class —
          // a linear gradient's constant step makes dHash collapse
          // most classes together (measured 14 distinct hashes → 35)
          val gray = ((seed * 11 + x * x * (seed + 1) + y * 7) % 256).toInt
          (gray, gray, gray)
        })
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        Row(id, dHash(img, cols, rows))
      }
    }
    val hashed = s.createDataFrame(rdd, outSchema)
    hashed
      .join(hashed.groupBy($"dhash")
        .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies")),
        "dhash")
      .select($"doc_id", $"dhash", $"keeper_id", $"n_copies")
      .orderBy($"doc_id")
  }

  private val mmDhash = QueryDef(
    "mm_image_dhash",
    Some("""
      WITH px AS (
        SELECT d.doc_id, tx.x, ty.y,
          ((d.doc_id % 50) * 11 + tx.x * tx.x * ((d.doc_id % 50) + 1)
            + ty.y * 7) % 256 AS gray
        FROM documents d
        CROSS JOIN range(5) tx(x)
        CROSS JOIN range(8) ty(y)),
      bits AS (
        SELECT a.doc_id, a.y, a.x,
          CAST(CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS BIGINT) AS bit
        FROM px a
        JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        WHERE a.x < 4),
      h AS (
        SELECT doc_id,
          CAST(list_reduce(list(bit ORDER BY y, x),
                           (acc, v) -> acc * 2 + v) AS BIGINT) AS dhash
        FROM bits GROUP BY doc_id),
      g AS (SELECT dhash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
            FROM h GROUP BY dhash)
      SELECT h.doc_id, h.dhash, g.keeper_id, g.n_copies
      FROM h JOIN g USING (dhash)
      ORDER BY h.doc_id"""),
    (s, dir) => imageDhashFrame(s, dir, cols = 4, rows = 8),
    benchBuild = Some((s, dir) => imageDhashFrame(s, dir, cols = 8, rows = 8)))

  /** Real header decode end-to-end: bytes are BUILT from doc_id-derived
    * formulas and PARSED back by [[parseMediaMeta]]; the oracle computes
    * the formulas directly, so any parser/builder bug breaks the hash
    * match. Even ids are PNG (width/height), odd are WAV (duration =
    * seconds × 1000 exactly, since nSamples = rate × seconds). */
  private val mmDecode = QueryDef(
    "mm_header_decode",
    Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
        CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 640 + 32 ELSE -1 END AS INTEGER) AS width,
        CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 480 + 32 ELSE -1 END AS INTEGER) AS height,
        CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE (1 + doc_id % 5) * 1000 END AS BIGINT) AS duration_ms
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) => {
      import s.implicits._
      decodeMediaMeta(withRealMediaHeaders(T(s, dir, "documents")))
        .orderBy($"doc_id")
    })

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

  /** Feature extraction pipeline — the mapPartitions decode shape with an
    * ORACLE-CHECKABLE feature: each dimension is the low-32-bit md5 of
    * (payload bytes ++ ":dim"), an integer "quantized embedding" DuckDB
    * replays from the media generator formula. The per-partition
    * iterator, decoder-state init, and byte-level digest over the REAL
    * binary column are exactly the production pipeline shape; only the
    * ML model behind [[decodeStub]] remains environment-stubbed (no
    * media runtime in this container), and the hash-match now proves the
    * payload assembly and batching end-to-end instead of a rows-only
    * count. */
  private val mmFeatures = QueryDef(
    "mm_feature_extract",
    Some("""
      SELECT d.doc_id, t.dim,
        ('0x' || substr(md5('IMG:' || d.lang || ':' || d.text || ':' ||
           CAST(t.dim AS VARCHAR)), 25, 8))::UBIGINT::BIGINT AS feature
      FROM documents d CROSS JOIN range(16) t(dim)
      ORDER BY doc_id, dim"""),
    (s, dir) => {
      import s.implicits._
      extractFeaturesPortable(withSyntheticMedia(T(s, dir, "documents")))
        .orderBy($"doc_id", $"dim")
    })

  /** Bytes per synthetic raw-video frame (fixed-size ASCII payload, so
    * frame extraction is pure byte arithmetic). */
  val videoFrameBytes = 32

  /** One frame's payload — formula-derived from (video id, frame index),
    * like every other synthetic media builder here, so oracles can
    * recompute content without blob support. */
  def videoFrameStr(vid: Column, f: Column): Column =
    rpad(concat(lit("f"), vid.cast(StringType), lit(":"),
      f.cast(StringType), lit(";")), videoFrameBytes, "x")

  /** Attach a synthetic raw "video" — n_frames fixed-size frames
    * concatenated into ONE opaque binary column — plus typed metadata.
    * The ingestion shape for video corpora: payload opaque, metadata
    * queryable. */
  def withSyntheticVideo(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        (lit(4) + pmod(col("doc_id"), lit(5))).cast(IntegerType).as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        aggregate(
          transform(sequence(lit(0), col("n_frames") - 1),
            f => encode(videoFrameStr(col("doc_id"), f), "utf-8")),
          lit(Array[Byte]()),
          (acc, x) => concat(acc, x)).as("video"),
        struct(lit("rawv").as("format"), lit(8).as("width"),
          lit(4).as("height"),
          (col("n_frames") * 40L).as("duration_ms")).as("meta"))

  /** Frame sampling: every `stride`-th frame sliced OUT OF the video blob
    * by byte arithmetic (`substring` on binary — codegen'd, no UDF, no
    * decode). The projection happens before anything shuffles, so a
    * 100 TB video corpus moves sampled frames, never whole videos. */
  def sampleFrames(videos: DataFrame, stride: Int = 2): DataFrame =
    videos
      .select(col("doc_id"), col("n_frames"), col("video"),
        col("meta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("duration_ms"),
        md5(expr(s"substring(video, frame_idx * $videoFrameBytes + 1, $videoFrameBytes)"))
          .as("frame_md5"))

  /** The oracle never sees the blob (DuckDB md5/substring are
    * VARCHAR-only): it recomputes each sampled frame's payload from the
    * generator formula. The Spark side REALLY assembles and byte-slices
    * the binary — any misalignment in assembly or slicing breaks the
    * md5 hash-match. */
  private val mmFrames = QueryDef(
    "mm_frame_sample",
    Some("""
      WITH v AS (
        SELECT doc_id, CAST(4 + doc_id % 5 AS INTEGER) AS n_frames
        FROM documents),
      f AS (
        SELECT doc_id, n_frames,
          unnest(generate_series(0, n_frames - 1, 2)) AS frame_idx
        FROM v)
      SELECT doc_id, frame_idx, n_frames,
        CAST(n_frames * 40 AS BIGINT) AS duration_ms,
        md5(rpad('f' || CAST(doc_id AS VARCHAR) || ':'
              || CAST(frame_idx AS VARCHAR) || ';', 32, 'x')) AS frame_md5
      FROM f
      ORDER BY doc_id, frame_idx"""),
    (s, dir) =>
      sampleFrames(withSyntheticVideo(T(s, dir, "documents")))
        .orderBy(col("doc_id"), col("frame_idx")))

  /** 16-bit mono PCM WAV with REAL samples after the 44-byte header —
    * unlike [[wavHeader]]'s header-only payload, this is a decodable
    * audio file any WAV reader accepts. */
  def wavPcm(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(wavHeader(sampleRate, samples.length))
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Deterministic int16 waveform — the formula the DuckDB oracle
    * replays, so the decoded samples are checkable value-for-value.
    * Integer-only: amplitude ±1001 fits int16 with no float anywhere. */
  def syntheticWave(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => (((id * 31 + i.toLong * 17) % 2003) - 1001).toShort)

  /** Sample count per doc: 2-4 exact 80-sample frames. */
  def audioSampleCount(id: Long): Int = (160 + (id % 3) * 80).toInt

  /** Attach a real PCM WAV payload per document (per-partition synth —
    * the binary-ingestion batch shape). */
  def withSyntheticAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, wavPcm(8000, syntheticWave(id, audioSampleCount(id))))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL PCM decode: RIFF chunk walk to `data`, int16 LE samples out.
    * Malformed payloads decode to zero samples (corrupt rows are data,
    * not exceptions — same contract as [[parseMediaMeta]]). */
  def pcmSamples(bytes: Array[Byte]): Array[Short] = {
    def ascii(o: Int, n: Int) = new String(bytes, o, n, "US-ASCII")
    def le32(o: Int) = java.nio.ByteBuffer.wrap(bytes, o, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    if (bytes.length < 12 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
      return Array.empty
    var o = 12
    while (o + 8 <= bytes.length) {
      val id = ascii(o, 4); val sz = le32(o + 4)
      if (sz < 0) return Array.empty
      if (id == "data") {
        val n = math.min(sz.toLong, (bytes.length - o - 8).toLong).toInt / 2
        val sb = java.nio.ByteBuffer.wrap(bytes, o + 8, n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        return Array.fill(n)(sb.getShort())
      }
      o = math.min(o.toLong + 8L + sz.toLong + (sz & 1), bytes.length.toLong).toInt
    }
    Array.empty
  }

  /** AUDIO WINDOWING — frame each payload's PCM stream into fixed
    * windows and compute per-window energy: decode + frame + integer
    * sum-of-squares run per partition (one decoder init per partition,
    * the [[extractFeatures]] batch shape), the RMS is a codegen'd
    * expression on top. Integer energies are exact under any order; the
    * one float op is `sqrt(sum_sq / n)` — division of the same two
    * numbers and the one correctly-rounded IEEE power, so the oracle
    * hash-matches. The loudness/silence profile a speech-data pipeline
    * computes before segmenting. */
  def audioFrameEnergy(audio: DataFrame, frame: Int = 80): DataFrame = {
    require(frame > 0, s"frame must be positive, got $frame")
    val spark = audio.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_sq", LongType)))
    val rdd = audio.select(col("doc_id"), col("media")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val samples = pcmSamples(r.getAs[Array[Byte]](1))
        samples.grouped(frame).zipWithIndex.map { case (w, fi) =>
          Row(id, fi, w.length.toLong, w.map(s => s.toLong * s).sum)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .withColumn("rms", sqrt(col("sum_sq").cast(DoubleType) / col("n_samples")))
  }

  /** Declared form is INTEGER-ONLY, and the oracle's final integer SUM
    * is cast to BIGINT. Both halves matter for driver-hash portability:
    * DuckDB types an uncast integer `SUM` as HUGEINT (int128) while
    * Spark ships int64, so even value-identical results hash-diverge
    * under a type-width-sensitive compare (the actual root cause of the
    * r12/r13 reds — not float canonicalization). `CAST(... AS BIGINT)`
    * on every final-output integer aggregate is the repo-wide oracle
    * convention, enforced by OraclePortabilitySpec. Same declared/bench
    * split as `dd_minhash_lsh`: Verify hashes the portable integer
    * columns; Bench times the production pipeline with RMS on top. */
  private val mmAudio = QueryDef(
    "mm_audio_windows",
    Some("""
      WITH samples AS (
        SELECT d.doc_id, t.i,
          ((d.doc_id * 31 + t.i * 17) % 2003) - 1001 AS s
        FROM documents d, LATERAL (
          SELECT unnest(generate_series(0,
            CAST(160 + (d.doc_id % 3) * 80 AS BIGINT) - 1)) AS i) t),
      frames AS (
        SELECT doc_id, i // 80 AS frame_idx, COUNT(*) AS n_samples,
          SUM(s * s) AS sum_sq
        FROM samples GROUP BY 1, 2)
      SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, n_samples,
        CAST(sum_sq AS BIGINT) AS sum_sq
      FROM frames
      ORDER BY doc_id, frame_idx"""),
    (s, dir) =>
      audioFrameEnergy(withSyntheticAudio(T(s, dir, "documents")))
        .drop("rms")
        .orderBy(col("doc_id"), col("frame_idx")),
    benchBuild = Some((s, dir) =>
      audioFrameEnergy(withSyntheticAudio(T(s, dir, "documents")))
        .orderBy(col("doc_id"), col("frame_idx"))))

  /** Synthetic video with SCENE STRUCTURE: frames repeat within a scene
    * (scene length 2–4 frames, varying per doc) and change at scene cuts,
    * so boundary detection has real work to do — unlike
    * [[withSyntheticVideo]]'s every-frame-distinct payloads. Same opaque
    * one-binary-column ingestion shape. */
  def withSceneVideo(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        (lit(8) + pmod(col("doc_id"), lit(5))).cast(IntegerType).as("n_frames"),
        (lit(2) + pmod(col("doc_id"), lit(3))).cast(IntegerType).as("scene_len"))
      .select(col("doc_id"), col("n_frames"),
        aggregate(
          transform(sequence(lit(0), col("n_frames") - 1),
            f => encode(videoFrameStr(col("doc_id"),
              (f / col("scene_len")).cast(IntegerType)), "utf-8")),
          lit(Array[Byte]()),
          (acc, x) => concat(acc, x)).as("video"))

  /** SHOT-BOUNDARY DETECTION — the video-pipeline segmentation primitive:
    * slice every fixed-size frame out of the blob by byte arithmetic
    * (codegen'd `substring` on binary, no decode, no UDF), fingerprint
    * it, and cut a shot wherever consecutive fingerprints differ (lag
    * window per video). Consecutive same-hash frames collapse into one
    * shot row carrying start/length — the unit a frame-sampler or
    * captioning stage consumes.
    *
    * Scale shape: the per-frame projection happens BEFORE anything
    * shuffles, so what moves is (doc, frame_idx, 32-char hash), never
    * video bytes; the lag + island pass is one keyed window per video.
    * The oracle recomputes each frame's payload from the generator
    * formula — the hash-match proves the Spark side's byte assembly and
    * slicing end-to-end (the [[sampleFrames]] contract, plus windowing). */
  def shotBoundaries(videos: DataFrame): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    videos
      .select(col("doc_id"), col("video"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(video, frame_idx * $videoFrameBytes + 1, $videoFrameBytes)"))
          .as("frame_md5"))
      .withColumn("cut",
        when(lag(col("frame_md5"), 1).over(byDoc).isNull ||
          lag(col("frame_md5"), 1).over(byDoc) =!= col("frame_md5"), 1L)
          .otherwise(0L))
      .withColumn("shot_idx", sum(col("cut")).over(byDoc).cast(IntegerType))
      .groupBy(col("doc_id"), col("shot_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        count(lit(1)).as("n_frames_shot"),
        min(col("frame_md5")).as("frame_md5")) // constant within a shot
      .orderBy(col("doc_id"), col("shot_idx"))
  }

  private val mmShots = QueryDef(
    "mm_shot_boundaries",
    Some("""
      WITH v AS (
        SELECT doc_id, CAST(8 + doc_id % 5 AS INTEGER) AS n_frames,
          CAST(2 + doc_id % 3 AS INTEGER) AS scene_len
        FROM documents),
      f AS (
        SELECT doc_id,
          CAST(unnest(generate_series(0, n_frames - 1)) AS INTEGER) AS frame_idx,
          scene_len
        FROM v),
      h AS (
        SELECT doc_id, frame_idx,
          md5(rpad('f' || CAST(doc_id AS VARCHAR) || ':'
                || CAST(frame_idx // scene_len AS VARCHAR) || ';', 32, 'x'))
            AS frame_md5
        FROM f),
      cuts AS (
        SELECT doc_id, frame_idx, frame_md5,
          CASE WHEN lag(frame_md5) OVER w IS NULL
                 OR lag(frame_md5) OVER w <> frame_md5 THEN 1 ELSE 0 END AS cut
        FROM h
        WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
      shots AS (
        SELECT doc_id, frame_idx, frame_md5,
          CAST(SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS INTEGER)
            AS shot_idx
        FROM cuts)
      SELECT doc_id, shot_idx, MIN(frame_idx) AS start_frame,
        COUNT(*) AS n_frames_shot, MIN(frame_md5) AS frame_md5
      FROM shots
      GROUP BY doc_id, shot_idx
      ORDER BY doc_id, shot_idx"""),
    (s, dir) => shotBoundaries(withSceneVideo(T(s, dir, "documents"))))

  /** VOICE-ACTIVITY SEGMENTATION on top of [[audioFrameEnergy]] — the
    * speech-pipeline step after loudness profiling: a frame is "voiced"
    * when its mean square exceeds a floor (integer cross-multiply, no
    * division), and runs of consecutive voiced frames collapse to one
    * utterance row (start/end/frames/energy). The gaps-and-islands pass
    * is `frame_idx − row_number()` per doc — one keyed window, then a
    * grouped aggregate; all outputs exact integers (the
    * [[audioFrameEnergy]] portability lesson applied from birth).
    *
    * The default floor is the synthetic waveform's expected per-sample
    * mean square (uniform residues in ±1001 → ≈ 1001·1002/3), so frames
    * split on their genuine energy fluctuation — both branches real. */
  def voiceSegments(frames: DataFrame,
      perSampleFloor: Long = 334334L): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .filter(col("sum_sq") > col("n_samples") * perSampleFloor)
      .withColumn("grp", col("frame_idx") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("sum_sq")).as("sum_sq"))
      .withColumn("seg_idx", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("start_frame")))
        .cast(IntegerType))
      .select(col("doc_id"), col("seg_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("sum_sq"))
      .orderBy(col("doc_id"), col("seg_idx"))
  }

  private val mmVoice = QueryDef(
    "mm_voice_segments",
    Some("""
      WITH samples AS (
        SELECT d.doc_id, t.i,
          ((d.doc_id * 31 + t.i * 17) % 2003) - 1001 AS s
        FROM documents d, LATERAL (
          SELECT unnest(generate_series(0,
            CAST(160 + (d.doc_id % 3) * 80 AS BIGINT) - 1)) AS i) t),
      frames AS (
        SELECT doc_id, CAST(i // 80 AS INTEGER) AS frame_idx,
          COUNT(*) AS n_samples, SUM(s * s) AS sum_sq
        FROM samples GROUP BY 1, 2),
      voiced AS (
        SELECT doc_id, frame_idx, sum_sq,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS rn
        FROM frames WHERE sum_sq > n_samples * 334334),
      segs AS (
        SELECT doc_id, grp, MIN(frame_idx) AS start_frame,
          MAX(frame_idx) AS end_frame, COUNT(*) AS n_frames,
          CAST(SUM(sum_sq) AS BIGINT) AS sum_sq
        FROM (SELECT doc_id, frame_idx, sum_sq, frame_idx - rn AS grp
              FROM voiced)
        GROUP BY doc_id, grp)
      SELECT doc_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_frame)
          AS INTEGER) AS seg_idx,
        start_frame, end_frame, n_frames, sum_sq
      FROM segs
      ORDER BY doc_id, seg_idx"""),
    (s, dir) =>
      voiceSegments(
        audioFrameEnergy(withSyntheticAudio(T(s, dir, "documents")))
          .drop("rms")))

  override val defs: Seq[QueryDef] =
    Seq(mmBinary, mmFeatures, mmDecode, mmDhash, mmImage, mmResize, mmFrames,
      mmAudio, mmShots, mmVoice)
}
