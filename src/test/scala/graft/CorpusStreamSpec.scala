package graft

import graft.core.T
import graft.operators.{CorpusPipeline, CorpusPrepOps}
import graft.streaming.CorpusStream
import java.nio.file.Files
import org.apache.spark.sql.functions._

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-row repetition metrics equal the batch groupBy forms") {
    val docs = T(spark, sf0001, "documents")
    val batch = CorpusPrepOps.repetitionStats(docs)
      .select($"doc_id", $"dup_token_frac", $"top_2gram_frac")
      .orderBy($"doc_id").collect()
    val perRow = docs
      .select($"doc_id", graft.operators.DedupOps.tokens($"text").as("toks"))
      .select($"doc_id", $"toks", CorpusPrepOps.gramsOf($"toks").as("grams"))
      .filter(size($"toks") >= 2)
      .select($"doc_id",
        CorpusPrepOps.dupTokenFrac($"toks").as("dup_token_frac"),
        CorpusPrepOps.top2gramFrac($"grams").as("top_2gram_frac"))
      .orderBy($"doc_id").collect()
    assert(batch.length == perRow.length)
    batch.zip(perRow).foreach { case (b, r) =>
      assert(b.getLong(0) == r.getLong(0))
      assert(b.getDouble(1) == r.getDouble(1), s"dup frac differs for doc ${b.getLong(0)}")
      assert(b.getDouble(2) == r.getDouble(2), s"top2 frac differs for doc ${b.getLong(0)}")
    }
  }

  test("streaming curation dedups across micro-batches and matches batch flags") {
    val src = Files.createTempDirectory("cur_src").toString + "/data"
    val cp = Files.createTempDirectory("cur_cp").toString
    val out = Files.createTempDirectory("cur_out").toString + "/data"
    val docs = T(spark, sf0001, "documents").limit(100)
    docs.write.parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val q = CorpusStream.curateStream(
        spark.readStream.schema(schema).parquet(src))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val fpOf = md5(lower(trim(regexp_replace($"text", "\\s+", " "))))
    val got = spark.read.parquet(out)
    // no duplicate fingerprints survive
    val fps = got.select(fpOf.as("fp")).collect().map(_.getString(0))
    assert(fps.distinct.length == fps.length, "stateful dedup must be exact")
    // every survivor passes the batch quality + repetition predicates
    // (scrub is a no-op on this corpus: no PII in the synthetic text)
    val t = CorpusPipeline.Thresholds()
    assert(CorpusPipeline.repetitionFilter(
      CorpusPipeline.qualityFilter(got, t), t).count() == got.count())
    // fingerprint SET matches the batch path (keeper identity may differ:
    // first-seen vs min doc_id — same content either way)
    val batchFps = CorpusPipeline.exactDedup(
      CorpusPipeline.repetitionFilter(CorpusPipeline.qualityFilter(docs, t), t))
      .select(fpOf.as("fp")).collect().map(_.getString(0)).sorted
    assert(fps.sorted.sameElements(batchFps))
    // batch 2: replay the same docs plus one genuinely new doc
    docs.limit(10).write.mode("append").parquet(src)
    Seq((100000L, "a genuinely new document with plenty of distinct words " +
      "alpha beta gamma delta epsilon zeta eta theta", "en", "srcX", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(src)
    run()
    val after = spark.read.parquet(out)
    assert(after.count() == got.count() + 1,
      "replayed docs stay suppressed by the state store; the new doc lands")
  }

  test("streaming semantic dedup drops planted near-dups and matches the batch twin") {
    val src = Files.createTempDirectory("sem_src").toString + "/data"
    val cp = Files.createTempDirectory("sem_cp").toString
    val kept = Files.createTempDirectory("sem_kept").toString + "/kept"
    val base = T(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding").filter($"vec_id" < 50)
    // batch 1: the base corpus (no pair reaches cosine 0.9 — measured)
    base.write.parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      // a just-terminated AvailableNow query can linger in the active
      // list for a beat — starting the next run over the same checkpoint
      // then trips the concurrent-use guard
      val deadline = System.nanoTime() + 30_000_000_000L
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val q = graft.streaming.CorpusStream.semanticDedupStream(spark,
        spark.readStream.schema(schema).parquet(src), kept, cp, tau = 0.9)
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(kept).count() == 50,
      "no base vector is near any other at tau 0.9 — all kept")
    // batch 2: a jittered copy of kept vec 0 (cosine ~1, must drop), two
    // jittered copies of each other but of nothing kept (one survives),
    // and the WITHIN-batch pair arrives with ascending ids so first-seen
    // equals min-id
    val jitter = (c: org.apache.spark.sql.Column) =>
      transform(c, x => x * lit(1.001f) + lit(0.001f))
    val dupOfKept = base.filter($"vec_id" === 0)
      .select(lit(10000L).as("vec_id"), jitter($"embedding").as("embedding"))
    val freshA = T(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding").filter($"vec_id" === 60)
      .select(lit(10001L).as("vec_id"), $"embedding")
    val freshB = freshA.select(lit(10002L).as("vec_id"),
      jitter($"embedding").as("embedding"))
    dupOfKept.unionByName(freshA).unionByName(freshB)
      .write.mode("append").parquet(src)
    run()
    val keptIds = spark.read.parquet(kept)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(!keptIds.contains(10000L), "near-dup of a kept vector must drop")
    assert(keptIds.contains(10001L), "first of the fresh pair is kept")
    assert(!keptIds.contains(10002L), "its within-batch near-dup drops")
    // batch-twin equivalence: min-id keepers over ALL arrivals = the
    // stream's first-seen keepers (arrival order is ascending-id here)
    val all = base
      .unionByName(dupOfKept).unionByName(freshA).unionByName(freshB)
    val batchKeepers = graft.operators.SimilarityOps
      .semanticDedup(spark, all, tau = 0.9)
      .filter($"is_kept").select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == batchKeepers,
      s"stream kept ${keptIds.size} vs batch ${batchKeepers.size}")
    // crash replay: delete batch 1's commit marker so the restarted
    // stream re-executes it with the SAME batch id and offsets — the
    // overwrite-by-batch-id sink plus the probe's own-batch exclusion
    // must make the replay byte-idempotent (no loss, no duplicates)
    val commits = new java.io.File(cp, "commits")
    val last = commits.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toInt).max
    assert(new java.io.File(commits, last.toString).delete())
    new java.io.File(commits, s".$last.crc").delete() // local-FS checksum shadow
    run()
    val again = spark.read.parquet(kept)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(again == keptIds, "a replayed micro-batch must be a no-op")
  }

  test("streaming minhash dedup drops lexical near-dups and matches the batch twin") {
    val src = Files.createTempDirectory("mh_src").toString + "/data"
    val cp = Files.createTempDirectory("mh_cp").toString
    val kept = Files.createTempDirectory("mh_kept").toString + "/kept"
    def doc(id: Long, text: String) = (id, text, "en", "srcA", text.length.toLong)
    def words(tag: String, n: Int) = (1 to n).map(k => s"${tag}_$k").mkString(" ")
    // batch 1: ten mutually-distinct docs (no shared trigrams)
    val batch1 = (1L to 10L).map(i => doc(i, words(s"b$i", 12)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    batch1.write.parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val deadline = System.nanoTime() + 30_000_000_000L
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val q = graft.streaming.CorpusStream.minhashDedupStream(spark,
        spark.readStream.schema(schema).parquet(src), kept, cp)
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(kept).count() == 10, "distinct docs all survive")
    // batch 2: a near-dup of kept doc 1 (one word changed → trigram
    // jaccard 9/11), a fresh doc, its within-batch near-dup, and a
    // second fresh doc — ascending ids so first-seen = min-id
    val fresh = words("f", 12)
    val batch2 = Seq(
      doc(100L, words("b1", 11) + " changed"),
      doc(101L, fresh),
      doc(102L, fresh.replace("f_12", "altered")),
      doc(103L, words("g", 12)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    batch2.write.mode("append").parquet(src)
    run()
    val keptIds = spark.read.parquet(kept)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(!keptIds.contains(100L), "near-dup of a kept doc must drop")
    assert(keptIds.contains(101L) && !keptIds.contains(102L),
      "within-batch pair collapses to its min id")
    assert(keptIds.contains(103L))
    // batch-twin equivalence over all arrivals (no cross-batch chains)
    val all = batch1.unionByName(batch2)
    val losers = graft.operators.DedupOps.minhashComponents(spark, all)
      .filter($"component" =!= $"doc_id").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val batchKeepers = all.select($"doc_id").collect()
      .map(_.getLong(0)).toSet -- losers
    assert(keptIds == batchKeepers,
      s"stream kept ${keptIds.toSeq.sorted} vs batch ${batchKeepers.toSeq.sorted}")
    // crash replay of the last micro-batch is a no-op
    val commits = new java.io.File(cp, "commits")
    val last = commits.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toInt).max
    assert(new java.io.File(commits, last.toString).delete())
    new java.io.File(commits, s".$last.crc").delete()
    run()
    val again = spark.read.parquet(kept)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(again == keptIds, "a replayed micro-batch must be a no-op")
  }

  test("indexed streaming minhash dedup: same kept set, index stays rebuild-equivalent") {
    val src = Files.createTempDirectory("mhi_src").toString + "/data"
    val cp = Files.createTempDirectory("mhi_cp").toString
    val kept = Files.createTempDirectory("mhi_kept").toString + "/kept"
    val idx = "mhistream_idx"
    def doc(id: Long, text: String) = (id, text, "en", "srcA", text.length.toLong)
    def words(tag: String, n: Int) = (1 to n).map(k => s"${tag}_$k").mkString(" ")
    try {
      val batch1 = (1L to 10L).map(i => doc(i, words(s"b$i", 12)))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      batch1.write.parquet(src)
      val schema = spark.read.parquet(src).schema
      def run(): Unit = {
        val deadline = System.nanoTime() + 30_000_000_000L
        while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        graft.streaming.CorpusStream.minhashDedupStreamIndexed(spark,
          spark.readStream.schema(schema).parquet(src), kept, cp, idx)
          .awaitTermination()
      }
      run()
      val fresh = words("f", 12)
      val batch2 = Seq(
        doc(100L, words("b1", 11) + " changed"), // near-dup of kept doc 1
        doc(101L, fresh),
        doc(102L, fresh.replace("f_12", "altered")), // within-batch near-dup
        doc(103L, words("g", 12)))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      batch2.write.mode("append").parquet(src)
      run()
      val keptIds = spark.read.parquet(kept)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      // identical decisions to the recompute-probe stream / batch twin
      val all = batch1.unionByName(batch2)
      val losers = graft.operators.DedupOps.minhashComponents(spark, all)
        .filter($"component" =!= $"doc_id").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(keptIds == all.select($"doc_id").collect().map(_.getLong(0)).toSet -- losers)

      // the index holds exactly the kept docs — answers like a rebuild
      val sizes = spark.table(s"${idx}_sizes").select($"doc_id")
        .collect().map(_.getLong(0))
      assert(sizes.toSet == keptIds && sizes.length == keptIds.size,
        "index rows must be the kept docs, no duplicates")

      // crash replay AFTER the index append (worst benign window): same
      // kept set, no duplicate index rows
      val commits = new java.io.File(cp, "commits")
      val last = commits.listFiles().map(_.getName)
        .filter(_.forall(_.isDigit)).map(_.toInt).max
      assert(new java.io.File(commits, last.toString).delete())
      new java.io.File(commits, s".$last.crc").delete()
      run()
      val again = spark.read.parquet(kept)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(again == keptIds, "replayed micro-batch must keep the same set")
      val sizesAgain = spark.table(s"${idx}_sizes").select($"doc_id")
        .collect().map(_.getLong(0))
      assert(sizesAgain.length == keptIds.size,
        "the marker must stop a replay from double-appending the index")
    } finally
      Seq(s"${idx}_banded", s"${idx}_shingles", s"${idx}_sizes")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("whitespace-variant copies share flags: stream and batch keep the same fp set") {
    // Doc 1 fails the punct-ratio cut on NORMALIZED text; doc 2 is the
    // same content padded with extra whitespace — under raw-text flags its
    // ratio would pass, and the stream would keep a fingerprint batch
    // drops. Docs 3/4 are a passing pair: exactly one survivor each path.
    // 35 commas over 105 normalized chars = 0.333 > 0.30 (fails on norm);
    // padding adds 23 whitespace chars: 35/128 = 0.273 <= 0.30 (raw passes)
    val failing = (1 to 20).map(i => s"w$i" + (if (i <= 15) ",," else ","))
      .mkString(" ")
    val passing = (1 to 20).map(i => s"tok$i").mkString(" ")
    def pad(s: String) = "  " + s.replace(" ", "  ") + "  "
    val docs = Seq(
      (1L, failing, "en", "srcA", failing.length.toLong),
      (2L, pad(failing), "en", "srcA", pad(failing).length.toLong),
      (3L, passing, "en", "srcA", passing.length.toLong),
      (4L, pad(passing), "en", "srcA", pad(passing).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = CorpusPipeline.Thresholds()
    // sanity: the divergence trap is armed — raw-text ratio of the padded
    // copy is under the threshold while the normalized ratio is over it
    val rawRatio = docs.filter($"doc_id" === 2).select(
      length(regexp_replace($"text", "[a-zA-Z0-9 ]", "")) / length($"text"))
      .head().getDouble(0)
    assert(rawRatio <= t.maxPunctRatio, "padded copy must pass under RAW flags")
    val src = Files.createTempDirectory("wsv_src").toString + "/data"
    val cp = Files.createTempDirectory("wsv_cp").toString
    val outP = Files.createTempDirectory("wsv_out").toString + "/data"
    docs.write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = CorpusStream.curateStream(
      spark.readStream.schema(schema).parquet(src), t)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outP)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fpOf = md5(lower(trim(regexp_replace($"text", "\\s+", " "))))
    val streamFps = spark.read.parquet(outP)
      .select(fpOf.as("fp")).collect().map(_.getString(0)).sorted
    val batchFps = CorpusPipeline.exactDedup(
      CorpusPipeline.repetitionFilter(CorpusPipeline.qualityFilter(docs, t), t))
      .select(fpOf.as("fp")).collect().map(_.getString(0)).sorted
    assert(streamFps.sameElements(batchFps),
      s"stream ${streamFps.length} fps vs batch ${batchFps.length}")
    assert(streamFps.length == 1, "only the passing pair survives, deduped to one")
  }
}
