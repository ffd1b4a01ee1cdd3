package graft.etl

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom filters for [[ManifestTable]] — EQUALITY data skipping
  * on columns [[ZoneMaps]] cannot prune: strings, and high-cardinality
  * keys whose per-file min/max ranges overlap because the layout is not
  * clustered on them. The design is the public lakehouse one (Iceberg's
  * puffin blobs, Delta's bloom-filter indexes): a compact sidecar per
  * partition unit holds one Bloom filter per (data file, column);
  * [[ManifestTable.readWhere]] probes them at PLAN time on the driver and
  * hands Spark only the files that might contain the sought key.
  *
  * Zone maps answer "can this RANGE intersect the file's bounds"; blooms
  * answer "can this VALUE be in the file at all" — a point lookup
  * `user_id = X` on a table laid out by date prunes nothing by bounds
  * (every file spans most ids) but prunes almost everything by bloom:
  * with a 1% false-positive rate, ~99% of non-matching files drop.
  *
  * Cost contract, same as the zone maps: filters are built ONLY for units
  * newly staged by the committing version (carried-forward dirs keep the
  * sidecar they were staged with — units are immutable), with one
  * column-pruned distributed pass over the staged files. At 1% fpp a
  * filter costs ~9.6 bits/row: ~1.2 MB per 10^6-row file-column, ~0.1% of
  * the data it indexes. The sidecar lives INSIDE the unit dir
  * (`part_year=y/_blooms/blooms.bin`) so it travels with the unit —
  * carried forward by reference, removed by vacuum with its dir —
  * and Spark's data scans never see it (`_`-prefixed paths are filtered
  * by the file index).
  *
  * Conservative by construction: a file with no sidecar, a column with no
  * filter, a probe value of an unsupported type, or any predicate shape
  * other than conjunctive `=` / `IN` contributes NO elimination — the
  * full predicate is always re-applied to the surviving scan. Supported
  * column types: string and exact integers (int/long/short/byte); the
  * insert and probe sides share one canonical mapping (strings as UTF-8,
  * integers widened to long) so a filter can never miss a value it was
  * fed.
  */
object FileBlooms {

  /** Sidecar dir name inside a `part_year=y` unit dir. The leading `_`
    * keeps it invisible to Spark's parquet file index. */
  val SidecarDir = "_blooms"
  private val SidecarFile = "blooms.bin"
  private val Magic = 0x47424c4d // "GBLM"

  private[graft] def sidecarPath(unitDir: Path) =
    new Path(new Path(unitDir, SidecarDir), SidecarFile)

  /** Column types a filter is built (and probed) for. */
  private def supported(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType => true
    case _ => false
  }

  /** Build the sidecar for every parquet file under `unitDir`.
    *
    * One distributed column-pruned pass: each input split folds its rows
    * into per-(file, column) filters sized by the file's footer row count
    * (splits of one file merge — Bloom OR is lossless for identical
    * sizing). This is genuine per-partition imperative state, so it runs
    * on the RDD; the frame feeding it is a plain column-pruned scan.
    * Collected filters are driver-written in one sidecar file: the
    * filters are already headed for plan-time driver probes, so driver
    * residency is the point, and their total size is bounded by
    * bits-per-row × rows-this-commit-staged. */
  def build(spark: SparkSession, unitDir: Path, schema: Option[StructType],
      cols: Seq[String], fpp: Double = 0.01,
      knownRows: Map[String, Long] = Map.empty): Unit = {
    val fs = unitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(unitDir)) return
    val files = fs.listStatus(unitDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    if (files.isEmpty) return
    val rdr = schema.map(spark.read.schema(_)).getOrElse(spark.read)
    val df = rdr.parquet(files.map(_.toString): _*)
    val present = cols.filter(c =>
      df.schema.fields.exists(f => f.name == c && supported(f.dataType)))
    if (present.isEmpty) return
    val kinds: Map[String, Boolean] = present.map(c => // true = string
      c -> (df.schema(c).dataType == StringType)).toMap
    // sizing: the zone-map scan of the same commit usually already knows
    // each file's row count (`knownRows`); only files it could not cover
    // (no stats-domain column at all) pay a footer read here
    val conf = spark.sparkContext.hadoopConfiguration
    val rowsByFile: Map[String, Long] = files.map { p =>
      p.getName -> knownRows.getOrElse(p.getName, ZoneMaps.fileRowCount(conf, p))
    }.toMap
    val narrowed = df.select(input_file_name().as("__file") +: present.map(col): _*)
    val perFile = narrowed.rdd
      .mapPartitions { it =>
        val acc = scala.collection.mutable.Map.empty[(String, String), BloomFilter]
        it.foreach { row =>
          val full = row.getString(0)
          val fileName = full.substring(full.lastIndexOf('/') + 1)
          present.zipWithIndex.foreach { case (c, i) =>
            val v = row.get(i + 1)
            if (v != null) {
              val bf = acc.getOrElseUpdate((fileName, c),
                BloomFilter.create(math.max(rowsByFile.getOrElse(fileName, 1L), 64L), fpp))
              if (kinds(c)) bf.putString(v.asInstanceOf[String])
              else bf.putLong(v.asInstanceOf[Number].longValue)
            }
          }
        }
        acc.iterator
      }
      .reduceByKey(_ mergeInPlace _)
      .collect()
    val out = fs.create(sidecarPath(unitDir), true)
    val d = new DataOutputStream(out)
    try {
      d.writeInt(Magic)
      d.writeInt(perFile.length)
      perFile.foreach { case ((file, c), bf) =>
        d.writeUTF(file)
        d.writeUTF(c)
        val bytes = new ByteArrayOutputStream()
        bf.writeTo(bytes)
        d.writeInt(bytes.size())
        d.write(bytes.toByteArray)
      }
    } finally d.close()
  }

  /** Load a unit's sidecar: file name -> column -> filter. Empty when the
    * unit has none (pre-bloom units, bloom-less tables) — the caller then
    * keeps every file. Only `cols` are materialized. */
  def load(fs: FileSystem, unitDir: Path,
      cols: Set[String]): Map[String, Map[String, BloomFilter]] = {
    val p = sidecarPath(unitDir)
    if (cols.isEmpty || !fs.exists(p)) return Map.empty
    val in = new DataInputStream(fs.open(p))
    try {
      if (in.readInt() != Magic) return Map.empty
      val n = in.readInt()
      val entries = (0 until n).flatMap { _ =>
        val file = in.readUTF()
        val c = in.readUTF()
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        if (cols(c))
          Some((file, c, BloomFilter.readFrom(new ByteArrayInputStream(bytes))))
        else None
      }
      entries.groupBy(_._1).map { case (f, es) =>
        f -> es.map(e => e._2 -> e._3).toMap
      }
    } finally in.close()
  }

  /** One conjunct's probe set: the row value must equal SOME member. */
  final case class Probe(values: Seq[Any])

  /** Conjunctive equality constraints of `pred`: col -> the probe sets it
    * must satisfy simultaneously (`c = 1 AND c IN (1,2)` yields two).
    * Everything non-equality, non-conjunctive, or non-literal is ignored
    * — less pruning, never wrong. Values canonicalize to String or
    * `java.lang.Long`; other literal types (doubles, decimals, dates as
    * internal ints are fine — they arrive as Integer) drop the conjunct. */
  def equalitiesOf(pred: Expression): Map[String, Seq[Probe]] = {
    def canon(l: Literal): Option[Any] = l.value match {
      case null => None
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case s: String => Some(s)
      case i: java.lang.Integer => Some(java.lang.Long.valueOf(i.longValue))
      case j: java.lang.Long => Some(j)
      case s: java.lang.Short => Some(java.lang.Long.valueOf(s.longValue))
      case b: java.lang.Byte => Some(java.lang.Long.valueOf(b.longValue))
      case _ => None
    }
    def attr(e: Expression): Option[String] = e match {
      case ua: UnresolvedAttribute if ua.nameParts.size == 1 =>
        Some(ua.nameParts.head)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def walk(e: Expression): Seq[(String, Probe)] = e match {
      // Column DSL predicates arrive as UnresolvedFunction in Spark 4 —
      // same normalization as ZoneMaps.constraintsOf
      case f: UnresolvedFunction =>
        (f.nameParts, f.arguments) match {
          case (Seq("and"), Seq(l, r)) => walk(And(l, r))
          case (Seq("=" | "=="), Seq(a, b)) => walk(EqualTo(a, b))
          case (Seq("in"), a +: vs) if vs.nonEmpty => walk(In(a, vs))
          case _ => Seq.empty
        }
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a, l: Literal) =>
        (attr(a) zip canon(l)).map { case (c, v) => c -> Probe(Seq(v)) }.toSeq
      case EqualTo(l: Literal, a) => walk(EqualTo(a, l))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val cs = vs.map(v => canon(v.asInstanceOf[Literal]))
        if (cs.exists(_.isEmpty)) Seq.empty
        else attr(a).map(c => c -> Probe(cs.flatten)).toSeq
      case _ => Seq.empty
    }
    walk(pred).groupBy(_._1).map { case (c, ps) => c -> ps.map(_._2) }
  }

  /** Do `probes` carry the kind the column's filters were FED? Insert
    * canonicalizes by the column's type (strings via putString, integers
    * via putLong), so a probe of the other kind — `stringCol === 7`,
    * `longCol === "42"`, shapes Spark resolves by coercion — must never
    * eliminate: the filter was not fed that representation and a miss
    * proves nothing. The caller drops such constraints (conservative);
    * [[mayContain]]'s unknown-type fallback stays as the last line. */
  def soundProbes(colType: DataType, probes: Seq[Probe]): Boolean = colType match {
    case StringType =>
      probes.forall(_.values.forall(_.isInstanceOf[String]))
    case IntegerType | LongType | ShortType | ByteType =>
      probes.forall(_.values.forall(_.isInstanceOf[java.lang.Long]))
    case _ => false
  }

  /** Can a file with `filters` contain a row satisfying every probe set?
    * Missing filter or unsupported value: yes (cannot eliminate). */
  def mayContain(filters: Map[String, BloomFilter],
      eqs: Map[String, Seq[Probe]]): Boolean =
    eqs.forall { case (c, probes) =>
      filters.get(c) match {
        case None => true
        case Some(bf) => probes.forall(_.values.exists {
          case s: String => bf.mightContainString(s)
          case l: java.lang.Long => bf.mightContainLong(l)
          case _ => true
        })
      }
    }
}
