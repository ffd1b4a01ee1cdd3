package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MISRA-GRIES heavy-hitters summary as a native Catalyst aggregate
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS'12 — both public). Finds frequent-item CANDIDATES
  * with O(k) state per partial aggregate and the classic guarantee:
  * any item with true count > n/(k+1) is present in the summary (no
  * false negatives above that floor), and every kept estimate
  * undercounts by at most n/(k+1).
  *
  * Why it matters at 100 TB: the exact "which tokens appear in > 5% of
  * the stream" needs a full-vocabulary shuffle — one keyed row per
  * DISTINCT token, billions at web scale. This aggregate's partials
  * carry AT MOST k entries per map task (the [[TopKAggregate]]
  * truncation argument applied to frequency), so the exchange is
  * O(k · partitions) regardless of vocabulary; a second pass then
  * exact-counts only the ≤ k candidates (a broadcastable set) and
  * filters to the true heavy hitters — exact output, bounded-state
  * plumbing, which is what makes the composite oracle-checkable
  * against a plain GROUP BY.
  *
  * Merge = per-key sum, then if the union exceeds k entries subtract
  * the (k+1)-th largest count from every entry and drop the non-
  * positive ones — the Agarwal et al. rule that keeps the summary
  * mergeable with additive error, i.e. safe under Spark's arbitrary
  * combiner tree shapes. */
case class HeavyHittersAggregate(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAggregate.Buffer]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)

  // k must be plan-time constant: buffers of different capacities would
  // not carry a common error bound through merges
  private lazy val k: Int = kExpr.eval() match {
    case i: Int if i > 0 => i
    case other => throw new IllegalArgumentException(
      s"heavy_hitters k must be a positive integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(item, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), kExpr = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHittersAggregate.resultType

  override def createAggregationBuffer(): HeavyHittersAggregate.Buffer =
    new HeavyHittersAggregate.Buffer(k)

  override def update(buf: HeavyHittersAggregate.Buffer,
      input: InternalRow): HeavyHittersAggregate.Buffer = {
    val v = item.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: HeavyHittersAggregate.Buffer,
      other: HeavyHittersAggregate.Buffer): HeavyHittersAggregate.Buffer = {
    other.foreach { case (t, c) => buf.offer(t, c) }
    buf.shrinkToCapacity()
    buf
  }

  override def eval(buf: HeavyHittersAggregate.Buffer): Any =
    new GenericArrayData(buf.sortedBestFirst.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })

  // Tokens travel as int-length-prefixed UTF-8 byte arrays, NOT
  // DataOutputStream.writeUTF: writeUTF throws UTFDataFormatException
  // past 65535 encoded bytes, and one pathological unbroken token (an
  // embedded base64 blob surviving whitespace tokenization) must not
  // crash the whole aggregation at shuffle time.
  override def serialize(buf: HeavyHittersAggregate.Buffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    val entries = buf.sortedBestFirst
    out.writeInt(entries.length)
    entries.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.close()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): HeavyHittersAggregate.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buf = new HeavyHittersAggregate.Buffer(k)
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.offer(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    buf.shrinkToCapacity()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAggregate =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = HeavyHittersAggregate.FUNC_NAME
}

object HeavyHittersAggregate {
  val FUNC_NAME = "graft_heavy_hitters"

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  /** The Misra-Gries counter map, capacity-bounded to k entries. A
    * single-increment offer on a full map runs the classic decrement-
    * all step; bulk offers (merge path) may transiently exceed k and
    * are brought back by [[shrinkToCapacity]]'s subtract-(k+1)-th rule —
    * both preserve "estimate undercounts true count by ≤ total/(k+1)". */
  final class Buffer(k: Int) {
    private val counts = new java.util.HashMap[String, Long]()

    def offer(t: String, c: Long): Unit = {
      val cur = counts.get(t)
      if (cur != 0L || counts.containsKey(t)) counts.put(t, cur + c)
      else if (counts.size < k) counts.put(t, c)
      else if (c == 1L) decrementAll()
      else { counts.put(t, c); shrinkToCapacity() }
    }

    /** The classic MG step for one unmatched arrival on a full map:
      * every counter pays 1, zeros evict (the arrival's own +1 and −1
      * cancel, so it is never inserted). */
    private def decrementAll(): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }

    /** Agarwal et al. merge reduction: subtract the (k+1)-th largest
      * count from every entry, drop non-positive. No-op at ≤ k. */
    def shrinkToCapacity(): Unit = {
      if (counts.size <= k) return
      val vals = new java.util.ArrayList[Long](counts.values())
      java.util.Collections.sort(vals, java.util.Collections.reverseOrder())
      val sub = vals.get(k) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }

    def foreach(f: ((String, Long)) => Unit): Unit =
      counts.forEach((t, c) => f((t, c)))
    def size: Int = counts.size
    def sortedBestFirst: Array[(String, Long)] = {
      val arr = new Array[(String, Long)](counts.size)
      var i = 0
      counts.forEach { (t, c) => arr(i) = (t, c); i += 1 }
      arr.sortWith { case ((t1, c1), (t2, c2)) =>
        if (c1 != c2) c1 > c2 else t1 < t2
      }
    }
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FUNC_NAME,
      { exprs =>
        require(exprs.length == 2, s"$FUNC_NAME takes (item, k)")
        HeavyHittersAggregate(exprs(0), exprs(1))
      },
      "scala_udf")

  /** Column API: ≤ k Misra-Gries candidates `(token, est)`, best-first. */
  def heavyHitters(spark: SparkSession, item: Column, k: Int): Column = {
    register(spark)
    call_function(FUNC_NAME, item.cast("string"), lit(k))
  }
}
