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
  *  - NaN/Infinity in float stats, INT96 timestamps, strings, and
  *    nested types are never recorded (comparison semantics are not
  *    total-order-safe or the footer stats are unusable);
  *  - an all-null column IS recorded (empty bounds): no comparison
  *    matches NULL, so such files are provably skippable.
  */
object ZoneMaps {

  /** Per-file, per-column statistic. `bounds` None = every value in the
    * file is NULL (provably unmatched by any comparison). Domains: dates
    * as epoch days, timestamps as epoch micros — the same internal
    * representation Catalyst literals carry, so pruning compares
    * BigDecimals in one domain with no calendar math. */
  final case class ColStats(bounds: Option[(BigDecimal, BigDecimal)],
      nulls: Long, rows: Long)

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
                  .map { case (mn, mx) =>
                    name -> ColStats(Some((mn, mx)), st.getNumNulls, rows)
                  }
              }
            }
          }.toMap
        }
      val names = perBlock.map(_.keySet).reduce(_ intersect _)
      names.map { n =>
        val ss = perBlock.map(_(n))
        val bounds = ss.flatMap(_.bounds) match {
          case Seq() => None
          case bs => Some((bs.map(_._1).min, bs.map(_._2).max))
        }
        n -> ColStats(bounds, ss.map(_.nulls).sum, ss.map(_.rows).sum)
      }.toMap
    } finally rdr.close()
  }

  /** Parquet (physical, logical) min/max -> the shared BigDecimal
    * domain, or None when the type has no total-order-safe mapping. */
  private def decode(t: org.apache.parquet.schema.PrimitiveType,
      mn: AnyRef, mx: AnyRef): Option[(BigDecimal, BigDecimal)] = {
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
      case _ => None // INT96, BINARY, BOOLEAN, FIXED_LEN: no safe mapping
    }
    for (f <- scale; a <- num(mn); b <- num(mx)) yield (f(a), f(b))
  }

  // ---- manifest (de)serialization -----------------------------------
  // One line per file: #filestats\t<relpath>\t<col>=<min>,<max>,<nulls>,<rows>|...
  // All-null columns serialize empty min/max: <col>=,,<nulls>,<rows>

  def render(relPath: String, fs: FileStats): String = {
    val cols = fs.toSeq.sortBy(_._1).map { case (n, s) =>
      val (mn, mx) = s.bounds
        .map { case (a, b) => (a.bigDecimal.toPlainString, b.bigDecimal.toPlainString) }
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
              val bounds =
                if (mn.isEmpty || mx.isEmpty) None
                else Some((BigDecimal(mn), BigDecimal(mx)))
              n -> ColStats(bounds, nulls.toLong, rows.toLong)
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
      schema: Option[org.apache.spark.sql.types.StructType] = None): Map[String, Range] = {
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
          case _ => false
        }
        case None => col != "part_year" || numericT(l.dataType)
      }
    }
    def litVal(l: Literal): Option[BigDecimal] = l.value match {
      case null => None
      case i: java.lang.Integer => Some(BigDecimal(i.intValue))
      case l2: java.lang.Long => Some(BigDecimal(l2.longValue))
      case s: java.lang.Short => Some(BigDecimal(s.intValue))
      case b: java.lang.Byte => Some(BigDecimal(b.intValue))
      case f: java.lang.Float =>
        if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.doubleValue))
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d.doubleValue))
      case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
      case _ => None // internal UTF8String etc.: not in the stats domain
    }
    def attr(e: Expression): Option[String] = e match {
      case ua: UnresolvedAttribute if ua.nameParts.size == 1 =>
        Some(ua.nameParts.head)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def one(col: String, lo: Option[(BigDecimal, Boolean)],
        hi: Option[(BigDecimal, Boolean)]) = Map(col -> Range(lo, hi))
    def walk(e: Expression): Seq[Map[String, Range]] = e match {
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
          one(c, Some((v, true)), None) }.toSeq
      case GreaterThanOrEqual(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          one(c, Some((v, false)), None) }.toSeq
      case LessThan(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          one(c, None, Some((v, true))) }.toSeq
      case LessThanOrEqual(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          one(c, None, Some((v, false))) }.toSeq
      case EqualTo(a, l: Literal) =>
        (attr(a) zip litVal(l)).collect { case (c, v) if sound(c, l) =>
          one(c, Some((v, false)), Some((v, false))) }.toSeq
      // mirrored literal-first forms
      case GreaterThan(l: Literal, a) => walk(LessThan(a, l))
      case GreaterThanOrEqual(l: Literal, a) => walk(LessThanOrEqual(a, l))
      case LessThan(l: Literal, a) => walk(GreaterThan(a, l))
      case LessThanOrEqual(l: Literal, a) => walk(GreaterThanOrEqual(a, l))
      case EqualTo(l: Literal, a) => walk(EqualTo(a, l))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val lits = vs.map(_.asInstanceOf[Literal])
        val bds = lits.map(litVal)
        if (bds.exists(_.isEmpty)) Seq.empty
        else attr(a).filter(c => lits.forall(sound(c, _))).map(c =>
          one(c, Some((bds.flatten.min, false)), Some((bds.flatten.max, false)))).toSeq
      case _ => Seq.empty
    }
    walk(pred).flatten.groupBy(_._1).map { case (c, rs) =>
      val ranges = rs.map(_._2)
      // tightest bound wins; equal bounds prefer strict
      val lo = ranges.flatMap(_.lower).sortBy(r => (-r._1, !r._2)).headOption
      val hi = ranges.flatMap(_.upper).sortBy(r => (r._1, !r._2)).headOption
      c -> Range(lo, hi)
    }
  }

  /** Can a file with `stats` contain a row matching `ranges`? Only a
    * provable NO skips the file. */
  def mayMatch(stats: FileStats, ranges: Map[String, Range]): Boolean =
    ranges.forall { case (col, r) =>
      stats.get(col) match {
        case None => true // no stats for this column: cannot eliminate
        case Some(ColStats(None, _, _)) => false // all NULL: no comparison matches
        case Some(ColStats(Some((mn, mx)), _, _)) =>
          val okLo = r.lower.forall { case (v, strict) =>
            if (strict) mx > v else mx >= v }
          val okHi = r.upper.forall { case (v, strict) =>
            if (strict) mn < v else mn <= v }
          okLo && okHi
      }
    }
}
