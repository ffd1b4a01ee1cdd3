package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

/** File-level zone maps (min/max column statistics) for
  * [[ManifestTable]] — the lakehouse data-skipping design (Delta's
  * per-file `stats`, Iceberg's manifest `lower_bounds`/`upper_bounds`,
  * both public): each committed manifest records, per data FILE, the
  * min/max/null-count of every numeric, date, and timestamp column,
  * read once from the parquet FOOTERS of the files that commit staged.
  *
  * Why this exists when parquet already stores row-group stats: at
  * 100 TB a selective scan's cost is dominated by OPENING files —
  * listing, footer fetches, task scheduling — before a single row-group
  * stat is consulted. Zone maps move that elimination to PLAN time on
  * the driver: [[ManifestTable.readWhere]] intersects a predicate's
  * ranges with the manifest's per-file bounds and hands Spark only the
  * files that can match. Paired with clustered compaction
  * ([[ManifestTable.compact]] `clusterBy`, e.g. on a
  * [[ZOrderLayout.interleave16]] Morton key), file ranges become
  * disjoint and a point/range query opens O(matching files), not
  * O(table). Files with no recorded stats are always kept — pruning is
  * only ever an elimination proof, so a legacy manifest written before
  * stats existed stays correct and heals on its next commit.
  *
  * Collection cost rides the merge's own O(touched) contract: only
  * files under dirs NEW in the committing snapshot are footer-read
  * (carried-forward dirs reuse the previous manifest's lines verbatim),
  * and a footer read is metadata-only — no row pages are fetched.
  *
  * Conservative by construction:
  *  - only conjuncts of `<, <=, >, >=, =, IN` between a column and
  *    literals prune; anything else (OR trees, expressions over the
  *    column, UDF-ish conjuncts) contributes nothing and the full
  *    predicate is re-applied as a normal filter on the survivors;
  *  - strict vs inclusive bounds are honored exactly;
  *  - NaN/Infinity in float stats, INT96 timestamps, and nested types
  *    are never recorded (comparison semantics are not total-order-safe
  *    or the footer stats are unusable);
  *  - an all-null column IS recorded (empty bounds): no comparison
  *    matches NULL, so such files are provably skippable.
  *
  * STRING columns (BINARY + UTF8 annotation) record min/max too, in a
  * separate string domain — the reference's schema-on-read semantics
  * keep silver dates as STRINGS (SURVEY §1.3), so a range predicate on
  * a string-typed date column must prune. Two facts make this sound:
  *  - ordering: parquet UTF8 stats are UNSIGNED byte-lexicographic —
  *    exactly Spark's UTF8String comparison. Bounds are held as
  *    latin-1 byte-image Strings (a bijective byte↔char map), so plain
  *    `String.compareTo` over them IS the unsigned byte order, and
  *    `ColStats` keeps value-equality semantics. parquet-mr itself
  *    refuses to surface binary stats from legacy ambiguous-order
  *    writers (they arrive as "no value"), so a bad ordering can never
  *    reach the pruner.
  *  - truncation: a writer may truncate long binary stats, but
  *    parquet's truncator guarantees `truncMin <= realMin` and
  *    `truncMax >= realMax` (incrementing the last prefix byte; when
  *    that overflows it DROPS the stat, which arrives as unusable).
  *    Loose-but-valid bounds only WIDEN a file's claimed range, so
  *    pruning remains an elimination proof — a truncated-stats file is
  *    kept whenever the real values could match. The same looseness is
  *    why string bounds are never treated as exact values:
  *    [[graft.etl.ManifestTable.statsAgg]] refuses to answer MIN/MAX
  *    from them.
  */
object ZoneMaps {

  /** Per-file, per-column statistic. A column carries NUMERIC bounds
    * (dates as epoch days, timestamps as epoch micros — the same
    * internal representation Catalyst literals carry, so pruning
    * compares BigDecimals in one domain with no calendar math) OR
    * STRING bounds (`strBounds`: latin-1 byte-image Strings whose
    * `compareTo` is the unsigned byte order — possibly truncation-loose,
    * always valid), never both. All-null is `nulls == rows` with both
    * bounds empty: no comparison matches NULL, provably skippable. */
  final case class ColStats(bounds: Option[(BigDecimal, BigDecimal)],
      nulls: Long, rows: Long,
      strBounds: Option[(String, String)] = None)

  /** Bytes → the latin-1 byte-image String domain (bijective, order- and
    * equality-preserving: char k == unsigned byte k for 0..255). */
  private[graft] def byteImage(bs: Array[Byte]): String =
    new String(bs, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** colName -> stats for one file. Only columns with usable footer
    * stats appear. */
  type FileStats = Map[String, ColStats]

  private val colName = "^[A-Za-z0-9_]+$".r

  /** Row count of one parquet file from its footer alone — metadata-only,
    * independent of whether any column has usable stats (the sizing input
    * for [[FileBlooms]], which must size filters for all-string files
    * that record no [[ColStats]] at all). */
  def fileRowCount(conf: Configuration, file: Path): Long = {
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = rdr.getFooter.getBlocks
      (0 until blocks.size()).map(blocks.get(_).getRowCount).sum
    } finally rdr.close()
  }

  /** Footer-read a batch of parquet files: driver loop while the batch is
    * small (one metadata RPC each — cheaper than scheduling a job), one
    * Spark job above the threshold. A compaction restaging a thousand
    * partitions stages thousands of files; sequential driver footer reads
    * would serialize the commit on metadata latency, which is exactly the
    * driver-side-loop smell the rest of the engine avoids. The Hadoop
    * conf ships as `Writable` bytes (`SerializableConfiguration` is
    * private[spark]). Keys are full path strings. */
  def forFiles(spark: org.apache.spark.sql.SparkSession, conf: Configuration,
      files: Seq[Path]): Map[String, FileStats] = {
    val DistributeThreshold = 64
    if (files.lengthCompare(DistributeThreshold) <= 0)
      files.map(p => p.toString -> forFile(conf, p)).toMap
    else {
      val confBytes = {
        val b = new java.io.ByteArrayOutputStream()
        val o = new java.io.DataOutputStream(b)
        conf.write(o); o.close(); b.toByteArray
      }
      val paths = files.map(_.toString)
      val slices = math.max(1,
        math.min(paths.size / 8, spark.sparkContext.defaultParallelism))
      spark.sparkContext.parallelize(paths, slices)
        .mapPartitions { it =>
          val c = new Configuration(false)
          c.readFields(new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(confBytes)))
          it.map(p => p -> forFile(c, new Path(p)))
        }
        .collect().toMap
    }
  }

  /** Footer-read one parquet file. Metadata-only: no row pages. */
  def forFile(conf: Configuration, file: Path): FileStats = {
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = rdr.getFooter.getBlocks
      if (blocks.isEmpty) return Map.empty
      // per column: fold row-group stats; a column is usable only if
      // EVERY block either has real min/max or is all-null
      val perBlock: Seq[Map[String, ColStats]] =
        (0 until blocks.size()).map { i =>
          val b = blocks.get(i)
          val rows = b.getRowCount
          val cols = b.getColumns
          (0 until cols.size()).flatMap { j =>
            val cc = cols.get(j)
            val name = cc.getPath.toDotString
            if (cc.getPath.size != 1 || colName.findFirstIn(name).isEmpty) None
            else {
              val st = cc.getStatistics
              if (st == null || !st.isNumNullsSet) None
              else if (!st.hasNonNullValue) {
                if (st.getNumNulls == rows)
                  Some(name -> ColStats(None, rows, rows))
                else None // values exist but no stats: unusable
              } else {
                decode(cc.getPrimitiveType,
                    st.genericGetMin.asInstanceOf[AnyRef],
                    st.genericGetMax.asInstanceOf[AnyRef])
                  .map {
                    case NumBounds(mn, mx) =>
                      name -> ColStats(Some((mn, mx)), st.getNumNulls, rows)
                    case StrBounds(mn, mx) =>
                      name -> ColStats(None, st.getNumNulls, rows,
                        strBounds = Some((mn, mx)))
                  }
              }
            }
          }.toMap
        }
      val names = perBlock.map(_.keySet).reduce(_ intersect _)
      names.flatMap { n =>
        val ss = perBlock.map(_(n))
        val bounds = ss.flatMap(_.bounds) match {
          case Seq() => None
          case bs => Some((bs.map(_._1).min, bs.map(_._2).max))
        }
        val strBounds = ss.flatMap(_.strBounds) match {
          case Seq() => None
          case bs => Some((bs.map(_._1).min, bs.map(_._2).max))
        }
        // a column mixing domains across blocks cannot happen for one
        // parquet schema; guard anyway — unusable beats unsound
        if (bounds.isDefined && strBounds.isDefined) None
        else Some(n -> ColStats(bounds, ss.map(_.nulls).sum,
          ss.map(_.rows).sum, strBounds))
      }.toMap
    } finally rdr.close()
  }

  private sealed trait Decoded
  private final case class NumBounds(mn: BigDecimal, mx: BigDecimal) extends Decoded
  private final case class StrBounds(mn: String, mx: String) extends Decoded

  /** Parquet (physical, logical) min/max -> the numeric BigDecimal
    * domain or the latin-1 string domain, or None when the type has no
    * total-order-safe mapping. */
  private def decode(t: org.apache.parquet.schema.PrimitiveType,
      mn: AnyRef, mx: AnyRef): Option[Decoded] = {
    // BINARY + UTF8 annotation: modern parquet-mr only surfaces these
    // stats when the column order is the unsigned type-defined one
    // (legacy ambiguous-order files arrive valueless), and truncation
    // only loosens bounds — see the object doc's soundness notes
    if (t.getPrimitiveTypeName == PrimitiveTypeName.BINARY &&
        t.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation])
      return (mn, mx) match {
        case (a: org.apache.parquet.io.api.Binary, b: org.apache.parquet.io.api.Binary) =>
          Some(StrBounds(byteImage(a.getBytes), byteImage(b.getBytes)))
        case _ => None
      }
    def num(v: AnyRef): Option[BigDecimal] = v match {
      case i: java.lang.Integer => Some(BigDecimal(i.intValue))
      case l: java.lang.Long => Some(BigDecimal(l.longValue))
      case f: java.lang.Float =>
        if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.doubleValue))
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d.doubleValue))
      case _ => None
    }
    val scale: Option[BigDecimal => BigDecimal] = t.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 |
          PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
        t.getLogicalTypeAnnotation match {
          case null => Some(identity)
          case _: LogicalTypeAnnotation.IntLogicalTypeAnnotation => Some(identity)
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => Some(identity)
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit match { // normalize to micros, the Catalyst domain
              case LogicalTypeAnnotation.TimeUnit.MICROS => Some(identity)
              case LogicalTypeAnnotation.TimeUnit.MILLIS => Some(_ * 1000)
              case _ => None // NANOS: Spark can't write it; skip
            }
          case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => None
          case _ => None
        }
      case _ => None // INT96, non-string BINARY, BOOLEAN, FIXED_LEN: no safe mapping
    }
    for (f <- scale; a <- num(mn); b <- num(mx)) yield NumBounds(f(a), f(b))
  }

  // ---- manifest (de)serialization -----------------------------------
  // One line per file: #filestats\t<relpath>\t<col>=<min>,<max>,<nulls>,<rows>|...
  // All-null columns serialize empty min/max: <col>=,,<nulls>,<rows>
  // String bounds serialize as s:<base64-of-bytes> in the min/max slots
  // (base64's alphabet has none of the protocol's separators, and the
  // raw bytes may contain anything)

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
  private def unb64(s: String): String =
    byteImage(java.util.Base64.getDecoder.decode(s))

  def render(relPath: String, fs: FileStats): String = {
    val cols = fs.toSeq.sortBy(_._1).map { case (n, s) =>
      val (mn, mx) = s.bounds
        .map { case (a, b) => (a.bigDecimal.toPlainString, b.bigDecimal.toPlainString) }
        .orElse(s.strBounds.map { case (a, b) => (s"s:${b64(a)}", s"s:${b64(b)}") })
        .getOrElse(("", ""))
      s"$n=$mn,$mx,${s.nulls},${s.rows}"
    }
    s"$relPath\t${cols.mkString("|")}"
  }

  def parse(body: String): (String, FileStats) = {
    val Array(rel, cols) = body.split("\t", 2)
    val fs = cols.split("\\|").filter(_.nonEmpty).flatMap { c =>
      val eq = c.indexOf('=')
      if (eq < 0) None
      else {
        val n = c.substring(0, eq)
        c.substring(eq + 1).split(",", -1) match {
          case Array(mn, mx, nulls, rows) =>
            scala.util.Try {
              if (mn.startsWith("s:") && mx.startsWith("s:"))
                n -> ColStats(None, nulls.toLong, rows.toLong,
                  strBounds = Some((unb64(mn.drop(2)), unb64(mx.drop(2)))))
              else {
                val bounds =
                  if (mn.isEmpty || mx.isEmpty) None
                  else Some((BigDecimal(mn), BigDecimal(mx)))
                n -> ColStats(bounds, nulls.toLong, rows.toLong)
              }
            }.toOption
          case _ => None
        }
      }
    }.toMap
    rel -> fs
  }

  // ---- predicate -> per-column ranges -------------------------------

  /** One extracted conjunct: col within [lower, upper], each bound
    * optional and independently strict or inclusive. */
  final case class Range(lower: Option[(BigDecimal, Boolean)], // (bound, strict)
      upper: Option[(BigDecimal, Boolean)])

  /** [[Range]] in the latin-1 string domain (unsigned byte order). */
  final case class StrRange(lower: Option[(String, Boolean)],
      upper: Option[(String, Boolean)])

  /** Both domains' conjunctive ranges, extracted in one walk. */
  final case class Constraints(num: Map[String, Range],
      str: Map[String, StrRange]) {
    def isEmpty: Boolean = num.isEmpty && str.isEmpty
  }

  /** Conjunctive ranges over literal comparisons in `pred`, in the
    * stats domain. Unrecognized conjuncts are dropped (conservative:
    * less pruning, never wrong). Columns typed outside the stats domain
    * (strings, arrays) never yield a range.
    *
    * `schema` (the table's data schema, when the caller has one) gates
    * SOUNDNESS across type families: the stats domain is per-type —
    * dates as epoch DAYS, timestamps as epoch MICROS, numerics as
    * themselves — so a literal from a DIFFERENT family than the column
    * (a timestamp literal on a DATE column, a number on a timestamp
    * column) would compare across domains and could eliminate files
    * that DO match once Spark's own coercion runs. Such conjuncts are
    * dropped: no pruning, full predicate re-applied, correct result.
    * Numeric-vs-numeric of any width stays prunable (both engines and
    * the stats agree in the exact BigDecimal domain). A column absent
    * from the schema never has stats, so its constraints are harmless —
    * except the partition column `part_year`, which eliminates whole
    * partitions and therefore requires a numeric literal. */
  def constraintsOf(pred: Expression,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Map[String, Range] =
    allConstraintsOf(pred, schema).num

  /** Literal value in its stats domain: numeric/date/timestamp in
    * BigDecimal, strings as latin-1 byte images of their UTF-8 bytes
    * (compareTo == the unsigned byte order parquet stats use). */
  private sealed trait Dom { def isStr: Boolean }
  private final case class NumV(v: BigDecimal) extends Dom { def isStr = false }
  private final case class StrV(v: String) extends Dom { def isStr = true }

  def allConstraintsOf(pred: Expression,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Constraints = {
    import org.apache.spark.sql.types._
    def numericT(t: DataType): Boolean = t.isInstanceOf[NumericType]
    def sound(col: String, l: Literal): Boolean = schema match {
      case None => true // untyped call sites (specs); readWhere passes one
      case Some(sch) => sch.find(_.name == col) match {
        case Some(f) => (f.dataType, l.dataType) match {
          case (ct, lt) if numericT(ct) && numericT(lt) => true
          case (DateType, DateType) => true
          case (TimestampType, TimestampType) => true
          case (TimestampNTZType, TimestampNTZType) => true
          case (StringType, StringType) => true
          case _ => false
        }
        case None => col != "part_year" || numericT(l.dataType)
      }
    }
    def litVal(l: Literal): Option[Dom] = l.value match {
      case null => None
      case i: java.lang.Integer => Some(NumV(BigDecimal(i.intValue)))
      case l2: java.lang.Long => Some(NumV(BigDecimal(l2.longValue)))
      case s: java.lang.Short => Some(NumV(BigDecimal(s.intValue)))
      case b: java.lang.Byte => Some(NumV(BigDecimal(b.intValue)))
      case f: java.lang.Float =>
        if (f.isNaN || f.isInfinite) None else Some(NumV(BigDecimal(f.doubleValue)))
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) None else Some(NumV(BigDecimal(d.doubleValue)))
      case d: org.apache.spark.sql.types.Decimal => Some(NumV(d.toBigDecimal))
      case u: org.apache.spark.unsafe.types.UTF8String =>
        Some(StrV(byteImage(u.getBytes)))
      case _ => None // nested/binary internals: not in any stats domain
    }
    def attr(e: Expression): Option[String] = e match {
      case ua: UnresolvedAttribute if ua.nameParts.size == 1 =>
        Some(ua.nameParts.head)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    // one conjunct's contribution: (col, lower, upper), bounds in ONE domain
    type B = (Dom, Boolean)
    type C = (String, Option[B], Option[B])
    def walk(e: Expression): Seq[C] = e match {
      // Column DSL predicates arrive as UnresolvedFunction(op, args) —
      // Spark 4's ColumnNode conversion defers operator resolution to
      // analysis. Normalize the comparison ops into their typed Catalyst
      // forms and recurse; unknown ops fall through to "no constraint".
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        (f.nameParts, f.arguments) match {
          case (Seq("and"), Seq(l, r)) => walk(And(l, r))
          case (Seq(">"), Seq(a, b)) => walk(GreaterThan(a, b))
          case (Seq(">="), Seq(a, b)) => walk(GreaterThanOrEqual(a, b))
          case (Seq("<"), Seq(a, b)) => walk(LessThan(a, b))
          case (Seq("<="), Seq(a, b)) => walk(LessThanOrEqual(a, b))
          case (Seq("=" | "=="), Seq(a, b)) => walk(EqualTo(a, b))
          case (Seq("in"), a +: vs) if vs.nonEmpty => walk(In(a, vs))
          case _ => Seq.empty
        }
      case And(l, r) => walk(l) ++ walk(r)
      case GreaterThan(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          (c, Some((v, true)): Option[B], None: Option[B]) }.toSeq
      case GreaterThanOrEqual(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          (c, Some((v, false)): Option[B], None: Option[B]) }.toSeq
      case LessThan(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          (c, None: Option[B], Some((v, true)): Option[B]) }.toSeq
      case LessThanOrEqual(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          (c, None: Option[B], Some((v, false)): Option[B]) }.toSeq
      case EqualTo(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          (c, Some((v, false)): Option[B], Some((v, false)): Option[B]) }.toSeq
      // mirrored literal-first forms
      case GreaterThan(l: Literal, a) => walk(LessThan(a, l))
      case GreaterThanOrEqual(l: Literal, a) => walk(LessThanOrEqual(a, l))
      case LessThan(l: Literal, a) => walk(GreaterThan(a, l))
      case LessThanOrEqual(l: Literal, a) => walk(GreaterThanOrEqual(a, l))
      case EqualTo(l: Literal, a) => walk(EqualTo(a, l))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val lits = vs.map(_.asInstanceOf[Literal])
        val bds = lits.map(litVal)
        // every literal must land in ONE domain, or the list's min/max
        // has no meaning (mixed lists are dropped — conservative)
        if (bds.exists(_.isEmpty) ||
            bds.flatten.map(_.isStr).distinct.size != 1) Seq.empty
        else attr(a).filter(c => lits.forall(sound(c, _))).map { c =>
          val doms = bds.flatten
          val (mn, mx) = doms.head match {
            case _: NumV =>
              val vs2 = doms.collect { case NumV(v) => v }
              (NumV(vs2.min): Dom, NumV(vs2.max): Dom)
            case _: StrV =>
              val vs2 = doms.collect { case StrV(v) => v }
              (StrV(vs2.min): Dom, StrV(vs2.max): Dom)
          }
          (c, Some((mn, false)): Option[B], Some((mx, false)): Option[B])
        }.toSeq
      case _ => Seq.empty
    }
    val cs = walk(pred)
    def isStrC(c: C): Boolean = c._2.orElse(c._3).exists(_._1.isStr)
    // tightest bound wins; equal bounds prefer strict
    val num = cs.filterNot(isStrC).groupBy(_._1).map { case (c, rs) =>
      val lo = rs.flatMap(_._2).collect { case (NumV(v), s) => (v, s) }
        .sortBy(r => (-r._1, !r._2)).headOption
      val hi = rs.flatMap(_._3).collect { case (NumV(v), s) => (v, s) }
        .sortBy(r => (r._1, !r._2)).headOption
      c -> Range(lo, hi)
    }
    val str = cs.filter(isStrC).groupBy(_._1).map { case (c, rs) =>
      val lo = rs.flatMap(_._2).collect { case (StrV(v), s) => (v, s) }
        .sortWith((a, b) =>
          if (a._1 != b._1) a._1 > b._1 else a._2 && !b._2).headOption
      val hi = rs.flatMap(_._3).collect { case (StrV(v), s) => (v, s) }
        .sortWith((a, b) =>
          if (a._1 != b._1) a._1 < b._1 else a._2 && !b._2).headOption
      c -> StrRange(lo, hi)
    }
    Constraints(num, str)
  }

  /** Can a file with `stats` contain a row matching `ranges`? Only a
    * provable NO skips the file. All-null is `nulls == rows` (NOT
    * bounds-absence: a string-stats column has no NUMERIC bounds yet
    * plenty of values — it must stay unprunable in this domain). */
  def mayMatch(stats: FileStats, ranges: Map[String, Range]): Boolean =
    ranges.forall { case (col, r) =>
      stats.get(col) match {
        case None => true // no stats for this column: cannot eliminate
        case Some(cs) if cs.nulls == cs.rows => false // all NULL: no comparison matches
        case Some(ColStats(None, _, _, _)) => true // other-domain stats: cannot eliminate
        case Some(ColStats(Some((mn, mx)), _, _, _)) =>
          val okLo = r.lower.forall { case (v, strict) =>
            if (strict) mx > v else mx >= v }
          val okHi = r.upper.forall { case (v, strict) =>
            if (strict) mn < v else mn <= v }
          okLo && okHi
      }
    }

  /** [[mayMatch]] in the string domain — bounds and range values are
    * latin-1 byte images, so `compareTo` is the unsigned byte order.
    * Sound under truncation: stored bounds are loose-but-valid
    * (truncMin <= realMin, truncMax >= realMax), so the elimination
    * tests below only ever keep MORE files than exact bounds would. */
  def mayMatchStr(stats: FileStats, ranges: Map[String, StrRange]): Boolean =
    ranges.forall { case (col, r) =>
      stats.get(col) match {
        case None => true
        case Some(cs) if cs.nulls == cs.rows => false
        case Some(cs) => cs.strBounds match {
          case None => true // numeric-domain stats: cannot eliminate here
          case Some((mn, mx)) =>
            val okLo = r.lower.forall { case (v, strict) =>
              if (strict) mx.compareTo(v) > 0 else mx.compareTo(v) >= 0 }
            val okHi = r.upper.forall { case (v, strict) =>
              if (strict) mn.compareTo(v) < 0 else mn.compareTo(v) <= 0 }
            okLo && okHi
        }
      }
    }
}
