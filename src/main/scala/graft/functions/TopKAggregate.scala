package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Grouped top-k as a native Catalyst aggregate with MAP-SIDE TRUNCATION —
  * the scale form of `ROW_NUMBER() OVER (PARTITION BY g ORDER BY s) <= k`.
  *
  * The window form shuffles EVERY row of every group and then sorts whole
  * groups just to keep k of them; at 100 TB "top 3 per category" moves the
  * table to do it. This aggregate keeps a bounded heap per (mapper, group)
  * instead: partial aggregation truncates to k entries before anything is
  * exchanged, so the shuffle carries at most k entries per group per map
  * task and the final merge is k-vs-k. Same result by totality of the
  * ordering (score DESC, id ASC — ties cannot select differently), which
  * is also what lets the DuckDB oracle replay it with a window
  * (`o8_grouped_topk`).
  *
  * Implemented as a [[TypedImperativeAggregate]] (the same machinery as
  * Spark's own `percentile_approx`/`collect_set`), NOT a Scala UDAF: it
  * plans into ObjectHashAggregate with codegen'd children and needs no
  * encoder round trip per row.
  *
  * Shape is deliberately concrete — score DOUBLE, id BIGINT, result
  * `array<struct<score,id>>` sorted best-first — callers project/cast
  * into it ([[TopKAggregate.topK]]) and join payloads back by id if they
  * need more than the ranking pair. Null score or id rows are skipped,
  * matching the window form where NULLS sort last and never reach rank k
  * (asserted in TopKSpec against live null-bearing data).
  */
case class TopKAggregate(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAggregate.Buffer]
  with ImplicitCastInputTypes {

  // analysis-time contract: the SQL-registered form (`graft_top_k` via
  // GraftExtensions) coerces int/decimal scores and int ids here instead
  // of ClassCastException-ing executor-side mid-job
  // (narrowed to Seq[DataType]: AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType, IntegerType)

  // k must be plan-time constant: buffers of different sizes can't merge
  private lazy val k: Int = kExpr.eval() match {
    case i: Int if i > 0 => i
    case other => throw new IllegalArgumentException(
      s"top_k k must be a positive integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))

  override def nullable: Boolean = false
  override def dataType: DataType = TopKAggregate.resultType

  override def createAggregationBuffer(): TopKAggregate.Buffer =
    new TopKAggregate.Buffer(k)

  override def update(buf: TopKAggregate.Buffer, input: InternalRow): TopKAggregate.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAggregate.Buffer, other: TopKAggregate.Buffer): TopKAggregate.Buffer = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: TopKAggregate.Buffer): Any =
    new GenericArrayData(buf.sortedBestFirst.map { case (s, i) =>
      InternalRow(s, i)
    })

  override def serialize(buf: TopKAggregate.Buffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    val entries = buf.sortedBestFirst
    out.writeInt(entries.length)
    entries.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.close()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): TopKAggregate.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buf = new TopKAggregate.Buffer(k)
    val n = in.readInt()
    (0 until n).foreach(_ => buf.offer(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = TopKAggregate.FUNC_NAME
}

object TopKAggregate {
  val FUNC_NAME = "graft_top_k"

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Bounded worst-on-top heap: `offer` keeps the best k under the total
    * order (score DESC, id ASC), evicting in O(log k). Never exceeds k
    * entries — THE invariant that truncates the shuffle. */
  final class Buffer(k: Int) {
    // worst first: smaller score is worse; on ties the LARGER id is
    // worse (the selection prefers smaller ids)
    private val heap = new java.util.PriorityQueue[(Double, Long)](
      math.max(k, 1),
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })

    def offer(s: Double, i: Long): Unit = {
      if (heap.size < k) heap.offer((s, i))
      else {
        val worst = heap.peek()
        // Double.compare, NOT >/==: IEEE comparison disagrees with the
        // heap's comparator (and with Spark's sort order) on NaN and
        // -0.0, and a split decision procedure would corrupt selection
        val c = java.lang.Double.compare(s, worst._1)
        if (c > 0 || (c == 0 && i < worst._2)) { heap.poll(); heap.offer((s, i)) }
      }
    }
    def offer(e: (Double, Long)): Unit = offer(e._1, e._2)
    def foreach(f: ((Double, Long)) => Unit): Unit = heap.forEach(e => f(e))
    def size: Int = heap.size
    def sortedBestFirst: Array[(Double, Long)] = {
      val arr = heap.toArray(Array.empty[(Double, Long)])
      // same total order as the heap: score desc (Double.compare, so NaN
      // ranks greatest like Spark's DESC sort), id asc on ties
      arr.sortWith { case ((s1, i1), (s2, i2)) =>
        val c = java.lang.Double.compare(s1, s2)
        if (c != 0) c > 0 else i1 < i2
      }
    }
  }

  /** Idempotent per-session registration (also done by [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FUNC_NAME,
      { exprs =>
        require(exprs.length == 3, s"$FUNC_NAME takes (score, id, k)")
        TopKAggregate(exprs(0), exprs(1), exprs(2))
      },
      "scala_udf")

  /** Column API: best-k `(score, id)` pairs per group, best-first. */
  def topK(spark: SparkSession, score: Column, id: Column, k: Int): Column = {
    register(spark)
    call_function(FUNC_NAME, score.cast("double"), id.cast("long"), lit(k))
  }
}
