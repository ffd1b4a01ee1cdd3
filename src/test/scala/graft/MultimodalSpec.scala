package graft

import graft.core.T
import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = MultimodalOps.withSyntheticMedia(T(spark, sf0001, "documents"))

  test("media column is binary with typed metadata struct") {
    val schema = media.schema
    assert(schema("media").dataType.typeName == "binary")
    val metaFields = schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields ==
      MultimodalOps.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("feature extraction: fixed dims, deterministic across runs") {
    val f1 = MultimodalOps.extractFeatures(media, dims = 16)
      .orderBy($"doc_id").collect()
    val f2 = MultimodalOps.extractFeatures(media, dims = 16)
      .orderBy($"doc_id").collect()
    assert(f1.length == 500)
    assert(f1.forall(_.getSeq[Float](1).length == 16))
    assert(f1.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
  }

  test("portable features: JVM digest path equals the SQL md5 recompute") {
    // The declared mm_feature_extract runs the mapPartitions decoder; its
    // DuckDB oracle replays md5 over the generator string. Cross-check the
    // JVM MessageDigest path against Spark's own md5 expression on the
    // REAL binary column — same construction, independent implementations.
    val viaJvm = MultimodalOps.extractFeaturesPortable(media)
      .orderBy($"doc_id", $"dim").collect().map(_.toSeq).toSeq
    val viaSql = media
      .select($"doc_id", $"media",
        explode(sequence(lit(0L), lit(15L))).as("dim"))
      .select($"doc_id", $"dim",
        conv(substring(md5(concat($"media",
          encode(concat(lit(":"), $"dim".cast("string")), "utf-8"))), 25, 8),
          16, 10).cast("long").as("feature"))
      .orderBy($"doc_id", $"dim").collect().map(_.toSeq).toSeq
    assert(viaJvm.length == 500 * 16)
    assert(viaJvm == viaSql)
  }

  test("decode stub distinguishes different payloads") {
    val a = MultimodalOps.decodeStub("payload-a".getBytes, 8).toSeq
    val b = MultimodalOps.decodeStub("payload-b".getBytes, 8).toSeq
    assert(a != b)
    assert(a == MultimodalOps.decodeStub("payload-a".getBytes, 8).toSeq)
  }

  test("PNG/WAV header round-trip: built bytes parse back exactly") {
    assert(MultimodalOps.parseMediaMeta(MultimodalOps.pngHeader(1920, 1080)) ==
      ("png", 1920, 1080, 0L))
    // 16000 Hz mono 16-bit, 3 s of samples -> 3000 ms
    assert(MultimodalOps.parseMediaMeta(MultimodalOps.wavHeader(16000, 48000)) ==
      ("wav", -1, -1, 3000L))
  }

  test("the PNG header is genuinely valid: ImageIO accepts its signature and CRC holds") {
    val bytes = MultimodalOps.pngHeader(640, 480)
    // CRC32 over the IHDR chunk must match the stored value
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 12, 17)
    assert(java.nio.ByteBuffer.wrap(bytes, 29, 4).getInt == crc.getValue.toInt)
    // JDK's own reader recognizes the stream as PNG from the header
    val readers = javax.imageio.ImageIO.getImageReaders(
      javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    assert(readers.hasNext && readers.next().getFormatName.equalsIgnoreCase("png"))
  }

  test("full PNG round-trip: ImageIO decodes the built image to the exact pixels") {
    val png = MultimodalOps.pngImage(9, 5, 200, 100, 50)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO must decode the generated PNG")
    assert(img.getWidth == 9 && img.getHeight == 5)
    assert((img.getRGB(4, 2) & 0xffffff) == (200 << 16 | 100 << 8 | 50))
    val (w, h, mr, mg, mb) = MultimodalOps.decodeImageStats(png)
    assert((w, h) == (9, 5))
    assert((mr, mg, mb) == (200.0, 100.0, 50.0), "solid fill ⇒ exact means")
  }

  test("the WAV header is genuinely valid: the JDK's own audio parser agrees") {
    val bytes = MultimodalOps.wavHeader(16000, 48000)
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    assert(fmt.getFormat.getSampleRate == 16000.0f)
    assert(fmt.getFormat.getChannels == 1)
    assert(fmt.getFormat.getSampleSizeInBits == 16)
    assert(fmt.getFrameLength == 48000, "declared data size = 48000 frames")
  }

  test("resize preserves solid-fill means and hits the target dims") {
    val png = MultimodalOps.pngImage(13, 7, 10, 20, 30)
    val (w, h, mr, mg, mb) =
      MultimodalOps.decodeImageStats(MultimodalOps.resizePng(png, 8, 8))
    assert((w, h) == (8, 8))
    assert((mr, mg, mb) == (10.0, 20.0, 30.0))
  }

  test("corrupt payloads classify as unknown instead of failing the batch") {
    assert(MultimodalOps.parseMediaMeta(Array[Byte](1, 2, 3)) ==
      ("unknown", -1, -1, -1L))
    assert(MultimodalOps.parseMediaMeta("RIFFxxxxWAVE".getBytes) ==
      ("unknown", -1, -1, -1L))
    assert(MultimodalOps.parseMediaMeta(Array.empty[Byte]) ==
      ("unknown", -1, -1, -1L))
  }

  test("adversarial RIFF chunk sizes terminate and classify as unknown") {
    def riff(chunks: (String, Int)*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + chunks.size * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + chunks.size * 8)
      bb.put("WAVE".getBytes("US-ASCII"))
      chunks.foreach { case (id, sz) =>
        bb.put(id.getBytes("US-ASCII")).putInt(sz)
      }
      bb.array()
    }
    // sz = -8 made the old walk advance by zero bytes — a hung task
    assert(MultimodalOps.parseMediaMeta(riff("data" -> -8)) ==
      ("unknown", -1, -1, -1L))
    assert(MultimodalOps.parseMediaMeta(riff("fmt " -> -8)) ==
      ("unknown", -1, -1, -1L))
    // sz near Int.MaxValue overflowed o + 8 + sz into a negative offset
    assert(MultimodalOps.parseMediaMeta(riff("junk" -> Int.MaxValue, "data" -> 4)) ==
      ("unknown", -1, -1, -1L))
    // truncated fmt chunk: header present but bytes end before byteRate
    assert(MultimodalOps.parseMediaMeta(
      MultimodalOps.wavHeader(16000, 48000).take(24)) ==
      ("unknown", -1, -1, -1L))
    // a well-formed payload still parses after the hardening
    assert(MultimodalOps.parseMediaMeta(MultimodalOps.wavHeader(16000, 48000)) ==
      ("wav", -1, -1, 3000L))
  }

  test("decodeMediaMeta over the corpus recovers the synthesized dimensions") {
    val out = MultimodalOps.decodeMediaMeta(
      MultimodalOps.withRealMediaHeaders(T(spark, sf0001, "documents")))
      .orderBy($"doc_id").collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        assert(r.getString(1) == "png")
        assert(r.getInt(2) == (id % 640 + 32).toInt)
        assert(r.getInt(3) == (id % 480 + 32).toInt)
      } else {
        assert(r.getString(1) == "wav")
        assert(r.getLong(4) == (1 + id % 5) * 1000)
      }
    }
  }

  test("video assembly and frame slicing are byte-exact; stride respected") {
    val vids = MultimodalOps.withSyntheticVideo(
      T(spark, sf0001, "documents").filter($"doc_id" < 20))
    // blob length = n_frames * frame size, byte-exact
    vids.select($"doc_id", $"n_frames", org.apache.spark.sql.functions.length($"video").as("len"))
      .collect().foreach { r =>
        assert(r.getAs[Int]("len") ==
          r.getAs[Int]("n_frames") * MultimodalOps.videoFrameBytes)
      }
    val frames = MultimodalOps.sampleFrames(vids).collect()
    frames.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 2 == 0, "stride-2 must sample even frames only")
      // sliced frame md5 == md5 of the formula-generated payload
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(("f" + r.getAs[Long]("doc_id") + ":" + r.getAs[Int]("frame_idx") + ";")
          .padTo(MultimodalOps.videoFrameBytes, 'x').mkString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("frame_md5") == expected)
    }
    // doc 0 has 4 frames -> samples frames 0 and 2
    assert(frames.filter(_.getAs[Long]("doc_id") == 0L)
      .map(_.getAs[Int]("frame_idx")).sorted.sameElements(Seq(0, 2)))
  }

  test("audio: PCM round-trip, framed energy, partial tail, corrupt bytes are data") {
    // decode inverts the synth exactly
    val wave = MultimodalOps.syntheticWave(7L, 200)
    val bytes = MultimodalOps.wavPcm(8000, wave)
    assert(MultimodalOps.pcmSamples(bytes).sameElements(wave))
    // the payload is ALSO a well-formed WAV to the header parser
    val (fmt, _, _, durMs) = MultimodalOps.parseMediaMeta(bytes)
    assert(fmt == "wav" && durMs == 200L * 1000L / 8000L)
    // framed energy: a frame size that does NOT divide the stream leaves
    // a partial tail window whose n_samples is the remainder
    val audio = MultimodalOps.withSyntheticAudio(
      Seq((7L, "x")).toDF("doc_id", "text"))
    val frames = MultimodalOps.audioFrameEnergy(audio, frame = 60)
      .orderBy($"frame_idx").collect()
    // doc 7: 160 + (7 % 3) * 80 = 240 samples -> 4 full frames of 60
    assert(frames.map(_.getAs[Long]("n_samples")).toSeq == Seq(60L, 60L, 60L, 60L))
    val expected = wave // recompute energies from the formula directly
    val w7 = MultimodalOps.syntheticWave(7L, 240)
    frames.zipWithIndex.foreach { case (r, fi) =>
      val sumSq = w7.slice(fi * 60, fi * 60 + 60).map(s => s.toLong * s).sum
      assert(r.getAs[Long]("sum_sq") == sumSq)
      assert(r.getAs[Double]("rms") == math.sqrt(sumSq.toDouble / 60))
    }
    // a 250-sample stream at frame=60 -> tail window of 10
    val tail = MultimodalOps.audioFrameEnergy(
      MultimodalOps.withSyntheticAudio(Seq((1L, "x")).toDF("doc_id", "text"))
        .selectExpr("doc_id",
          "media AS media0").select($"doc_id", $"media0".as("media")),
      frame = 70).orderBy($"frame_idx").collect()
    // doc 1: 160 + 80 = 240 samples -> 3 x 70 + tail of 30
    assert(tail.map(_.getAs[Long]("n_samples")).toSeq == Seq(70L, 70L, 70L, 30L))
    // corrupt payloads decode to zero samples, never throw
    assert(MultimodalOps.pcmSamples("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(MultimodalOps.pcmSamples(Array.empty[Byte]).isEmpty)
  }

  test("shot boundaries: scene-repeated frames collapse, cuts land exactly at scene changes") {
    // doc 9: n_frames = 8 + 9%5 = 12, scene_len = 2 + 9%3 = 2 -> 6 shots
    // of 2 frames; doc 10: n_frames = 8 + 10%5 = 8, scene_len = 2 + 10%3
    // = 3 -> shots of 3,3,2 frames (the tail scene is partial)
    val vids = MultimodalOps.withSceneVideo(
      Seq((9L, "x"), (10L, "y")).toDF("doc_id", "text"))
    val shots = MultimodalOps.shotBoundaries(vids).collect()
    val d9 = shots.filter(_.getAs[Long]("doc_id") == 9L)
    assert(d9.length == 6)
    assert(d9.map(_.getAs[Int]("start_frame")).sorted.toSeq ==
      Seq(0, 2, 4, 6, 8, 10))
    assert(d9.forall(_.getAs[Long]("n_frames_shot") == 2L))
    val d10 = shots.filter(_.getAs[Long]("doc_id") == 10L)
      .sortBy(_.getAs[Int]("shot_idx"))
    assert(d10.map(_.getAs[Long]("n_frames_shot")).toSeq == Seq(3L, 3L, 2L))
    assert(d10.map(_.getAs[Int]("start_frame")).toSeq == Seq(0, 3, 6))
    // each shot's fingerprint is the md5 of its scene's formula payload —
    // the byte-slicing is pinned to the generator, like sampleFrames
    d10.zipWithIndex.foreach { case (r, scene) =>
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(("f10:" + scene + ";")
          .padTo(MultimodalOps.videoFrameBytes, 'x').mkString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("frame_md5") == expected)
    }
    // shot indexes are 1-based and dense per doc
    assert(d9.map(_.getAs[Int]("shot_idx")).sorted.toSeq == (1 to 6))
  }

  test("voice segments: threshold splits frames, islands merge, gaps separate, energies sum") {
    // hand-built energy frames: doc 1 voiced at 0,1 then 3 (gap at 2),
    // doc 2 all silent -> no rows. floor 100 per sample, 10 samples/frame
    val frames = Seq(
      (1L, 0, 10L, 2000L), (1L, 1, 10L, 1500L), (1L, 2, 10L, 900L),
      (1L, 3, 10L, 1200L),
      (2L, 0, 10L, 100L), (2L, 1, 10L, 999L))
      .toDF("doc_id", "frame_idx", "n_samples", "sum_sq")
    val segs = MultimodalOps.voiceSegments(frames, perSampleFloor = 100L)
      .collect()
    assert(segs.forall(_.getAs[Long]("doc_id") == 1L),
      "an all-silent doc must produce no segments")
    val s = segs.sortBy(_.getAs[Int]("seg_idx"))
      .map(r => (r.getAs[Int]("seg_idx"), r.getAs[Int]("start_frame"),
        r.getAs[Int]("end_frame"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("sum_sq"))).toSeq
    // frame 2 (900 = 10*90 <= 10*100 floor? 900 <= 1000 -> silent) splits
    // the run; frame 1 (1500 > 1000) and frame 3 (1200 > 1000) are voiced
    assert(s == Seq((1, 0, 1, 2L, 3500L), (2, 3, 3, 1L, 1200L)))
    // the declared query's synthetic corpus exercises BOTH branches
    val real = MultimodalOps.voiceSegments(
      MultimodalOps.audioFrameEnergy(MultimodalOps.withSyntheticAudio(
        T(spark, sf0001, "documents"))).drop("rms"))
    val voicedFrames = real.agg(org.apache.spark.sql.functions.sum($"n_frames"))
      .head.getLong(0)
    val allFrames = MultimodalOps.audioFrameEnergy(
      MultimodalOps.withSyntheticAudio(T(spark, sf0001, "documents"))).count()
    assert(voicedFrames > 0 && voicedFrames < allFrames,
      s"default floor must split frames, got $voicedFrames of $allFrames voiced")
  }
}
