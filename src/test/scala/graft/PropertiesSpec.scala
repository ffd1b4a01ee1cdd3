package graft

import graft.domain.DomainFunctions
import graft.operators.{DedupOps, MultimodalOps}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based checks (SURVEY §5.4) — pure-function laws plus a few
  * bounded Spark round-trips. */
object GraftProperties extends Properties("graft") {

  // F12 — the reference's threshold table, re-derived independently from
  // needle.py:7-23 and compared over the whole relevant range.
  property("deduceTimeUnit thresholds") =
    forAll(Gen.choose(0, 500)) { delta =>
      val start = java.time.LocalDate.of(2024, 1, 1)
      val end = start.plusDays(delta)
      val expected =
        if (delta == 0) "day"
        else if (delta <= 7) "week"
        else if (delta <= 15) "biweek"
        else if (delta <= 30) "month"
        else if (delta <= 90) "quarter"
        else "year"
      DomainFunctions.deduceTimeUnit(start.toString, end.toString) == expected
    }

  property("decodeStub is deterministic and dimension-exact") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)),
      Gen.choose(1, 64)) { (bytes, dims) =>
      val a = MultimodalOps.decodeStub(bytes.toArray, dims)
      val b = MultimodalOps.decodeStub(bytes.toArray, dims)
      a.length == dims && a.sameElements(b)
    }

  private lazy val spark = SparkSpec.session
  private val word = Gen.oneOf("the", "fast", "key", "order", "sort",
    "table", "scan", "merge", "part", "window")

  // E1/dedup invariant: n tokens → max(0, n-2) trigrams (before distinct)
  property("shingle count = max(0, tokens - 2)") = {
    import spark.implicits._
    forAll(Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))) { words =>
      val text = words.mkString(" ")
      val got = Seq(text).toDF("text")
        .select(DedupOps.shingles($"text").as("sh"))
        .head().getSeq[String](0).length
      val toks = if (text.trim.isEmpty) 1 else text.trim.split("\\s+").length
      got == math.max(0, toks - 2)
    }
  }

  // J2 scale rewrite: the union-of-equi-joins decomposition must equal
  // the OR-predicate join on ARBITRARY key collisions — left rows
  // matching several right rows, pairs matching via both keys at once
  // (ADVICE r2: the old left-id dedup dropped matches).
  property("orJoinDecomposed = OR-predicate join") = {
    import spark.implicits._
    val keys = Gen.choose(0L, 6L) // tiny domain forces heavy collisions
    val leftGen = Gen.nonEmptyListOf(keys)
    val rightGen = Gen.nonEmptyListOf(Gen.zip(keys, keys))
    forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("lid", "k")
      val right = rs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rid", "ka", "kb")
      val expected = left.join(right, $"k" === $"ka" || $"k" === $"kb")
        .select($"lid", $"rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = graft.operators.JoinOps
        .orJoinDecomposed(left, right, "k", "ka", "kb", Seq("lid"), Seq("rid"))
        .select($"lid", $"rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == expected
    }
  }

  // Shard packing: the two-pass distributed prefix sum must give the
  // same assignment for EVERY bucketing (bucket width is a physical
  // knob, never a semantic one) and for any budget.
  property("packShards is bucket-width invariant") = {
    import spark.implicits._
    val docsGen = Gen.nonEmptyListOf(Gen.nonEmptyListOf(word).map(_.mkString(" ")))
    forAll(docsGen, Gen.choose(8L, 256L), Gen.choose(1L, 50L)) {
      (texts, budget, bucket) =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        def run(b: Long) = graft.operators.CorpusPrepOps
          .packShards(docs, budget, b)
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
        run(bucket) == run(1000000L) // one bucket == naive global window
    }
  }

  // ManifestTable law: any sequence of merges reads back as the
  // left-to-right in-memory fold of keyed upserts — snapshot isolation
  // never loses or duplicates a (key, date) grain row
  property("manifest table merges fold like a map") = {
    import spark.implicits._
    val batchGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1, 6), Gen.choose(2022, 2024), Gen.choose(0.0, 100.0)))
    forAll(Gen.nonEmptyListOf(batchGen)) { batches0 =>
      val batches = batches0.take(4).map(_.take(8)) // bound Spark work
      val base = java.nio.file.Files
        .createTempDirectory("manifest_prop").toString + "/t"
      def keyOf(r: (Int, Int, Double)) = (s"k${r._1}", s"${r._2}-01-01")
      batches.foreach { b =>
        val df = b.map { case (k, y, v) => (s"k$k", s"$y-01-01", v) }
          .toDF("id", "date", "v")
          .withColumn("date", org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("date")))
        graft.etl.ManifestTable.mergeInto(spark, df, base,
          Seq("id", "date"), "date")
      }
      val got = graft.etl.ManifestTable.read(spark, base)
        .select($"id", $"date".cast("string"), $"v")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      // (a) exactly one row per (id, date) grain, covering every key
      // ever merged; (b) each key's value comes from the LAST batch
      // containing it (dropDuplicates picks one candidate within a
      // batch, so assert membership, not a specific pick)
      val allKeys = batches.flatten.map(keyOf).toSet
      // (c) maintenance is row-invisible under ANY merge history:
      // clustered compaction + vacuum never change what readers see
      graft.etl.ManifestTable.compact(spark, base, targetFileBytes = 2048,
        clusterBy = Seq(org.apache.spark.sql.functions.col("v")))
      graft.etl.ManifestTable.vacuum(spark, base)
      val afterMaint = graft.etl.ManifestTable.read(spark, base)
        .select($"id", $"date".cast("string"), $"v")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      got.map(_._1).toSet == allKeys &&
        got.length == allKeys.size &&
        got.forall { case (key, v) =>
          batches.reverse.find(_.exists(keyOf(_) == key))
            .get.collect { case r if keyOf(r) == key => r._3 }
            .contains(v)
        } &&
        afterMaint.sorted.sameElements(got.sorted)
    }
  }

  // A12: applying the same update batch twice is a no-op
  property("merge upsert is idempotent") = {
    import spark.implicits._
    val kv = Gen.mapOf(Gen.zip(Gen.choose(1, 20), Gen.choose(0.0, 100.0)))
    forAll(kv, kv) { (base, updates) =>
      (base.nonEmpty && updates.nonEmpty) ==> Prop {
        val b = base.toSeq.toDF("k", "v")
        val u = updates.toSeq.toDF("k", "v")
        val once = graft.etl.MergeService.upsert(b, u, Seq("k")).drop("merge_action")
        val twice = graft.etl.MergeService.upsert(once, u, Seq("k")).drop("merge_action")
        once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty
      }
    }
  }
}
