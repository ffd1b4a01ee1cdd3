package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** O(tokens) rolling fingerprints for every W-token window of a
  * document — the hot pass of repeated-passage mining
  * ([[graft.operators.DedupOps.repeatedPassages]]). One xxhash64 per
  * TOKEN, then the classic polynomial rolling hash over the token
  * hashes:
  *
  *   H(p)   = Σ_{j=0..w-1} t(p+j) · B^(w-1-j)   (mod 2^64)
  *   H(p+1) = (H(p) − t(p) · B^(w-1)) · B + t(p+w)
  *
  * all in native 64-bit wraparound arithmetic (mod 2^64 is free), so
  * hashing all windows of an n-token document costs O(n) multiply-adds
  * — versus the composed `concat_ws(slice(...))` form, which
  * materializes and hashes O(n·W) bytes of window STRING per document
  * (the round-11 review's optimization note). Window hashes depend only
  * on window CONTENTS (the telescoped sum), so equal token runs collide
  * across documents exactly as the downstream pair join requires.
  *
  * Output: `array<long>` of length n−w+1 (empty when n < w), index i =
  * the window starting at 1-based token position i+1 — `posexplode`
  * recovers the same (pos, hash) rows the composed form produced.
  *
  * Bench-path only: the declared `dd_repeated_passages` keeps the
  * md5-over-window-text form its DuckDB oracle replays bit-for-bit;
  * DedupSpec pins the two pipelines to identical passages. */
case class WindowHashes(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window size must be >= 1, got $w")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      th(i) = if (s == null) WindowHashes.NullTok
        else XXH64.hashUTF8String(s, WindowHashes.Seed)
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * WindowHashes.B + th(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - w) {
      h = (h - th(p - 1) * bPowW1) * WindowHashes.B + th(p + w - 1)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrCls = classOf[GenericArrayData].getName
    val xxh = classOf[XXH64].getName
    // constants embedded as literals so the generated loops are
    // constant-folded — no object dereference in the hot path
    val bLit = s"${WindowHashes.B}L"
    val bw1Lit = s"${bPowW1}L"
    val seedLit = s"${WindowHashes.Seed}L"
    val nullLit = s"${WindowHashes.NullTok}L"
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      s"""
        int $n = $toks.numElements();
        if ($n < $w) {
          ${ev.value} = new $arrCls(new long[0]);
        } else {
          long[] $th = new long[$n];
          for (int $i = 0; $i < $n; $i++) {
            org.apache.spark.unsafe.types.UTF8String $s = $toks.getUTF8String($i);
            $th[$i] = $s == null ? $nullLit : $xxh.hashUTF8String($s, $seedLit);
          }
          long[] $out = new long[$n - $w + 1];
          long $h = 0L;
          for (int $i = 0; $i < $w; $i++) $h = $h * $bLit + $th[$i];
          $out[0] = $h;
          for (int $p = 1; $p <= $n - $w; $p++) {
            $h = ($h - $th[$p - 1] * $bw1Lit) * $bLit + $th[$p + $w - 1];
            $out[$p] = $h;
          }
          ${ev.value} = new $arrCls($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  /** B^(w-1) mod 2^64, fixed at construction. */
  private val bPowW1: Long = WindowHashes.bPow(w - 1)
}

object WindowHashes {
  /** Odd base: multiplication by an odd constant is a bijection mod
    * 2^64, so windows differing in one token hash differently with the
    * usual polynomial-hash collision bounds. (FNV-1a's 64-bit prime.) */
  val B: Long = 0x100000001b3L
  val Seed: Long = 42L
  /** Stand-in hash for a null token (split() never yields one). */
  val NullTok: Long = 0x9e3779b97f4a7c15L

  private[functions] def bPow(e: Int): Long = {
    var r = 1L
    var i = 0
    while (i < e) { r *= B; i += 1 }
    r
  }

  /** Column API over a session temp function (the [[PlaneBuckets]]
    * registry mechanism); `w` keys the function name. */
  def windowHashes(spark: SparkSession, toks: Column, w: Int): Column = {
    val name = s"window_hashes_$w"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      { exprs =>
        require(exprs.length == 1, s"$name takes 1 argument")
        WindowHashes(exprs.head, w)
      },
      "scala_udf")
    org.apache.spark.sql.functions.call_function(name, toks)
  }
}
