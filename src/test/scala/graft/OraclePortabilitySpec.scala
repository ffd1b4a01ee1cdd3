package graft

import org.scalatest.funsuite.AnyFunSuite

/** Binds the oracle-type portability gate into `sbt test` — the build
  * now fails on the HUGEINT class of driver red instead of discovering
  * it one round later at the driver.
  *
  * The gate itself lives in `tools/selfcheck.py` (`--types-only` mode):
  * it binds every declared oracle in DuckDB — types come from the bound
  * plan, no query executes — and fails any result column whose DuckDB
  * type is outside the known-portable families. The measured facts it
  * encodes: DuckDB's arrow export converts int128 (HUGEINT, the type of
  * an uncast integer `SUM`) to DOUBLE, so an uncast SUM hash-diverges
  * from Spark's int64 on value-identical results (the three-round
  * `mm_audio_windows` red); and DECIMAL renders like double only while
  * its precision round-trips a 53-bit mantissa (≤ 15 digits). The
  * repo-wide convention both facts demand: CAST every final-output
  * integer aggregate AS BIGINT, keep DECIMAL precision ≤ 15 (or cast
  * the final value to DOUBLE).
  *
  * Two directions, both required for the binding to mean anything:
  * the gate must be GREEN over the full declared registry, and RED on
  * a deliberately uncast oracle (a gate that cannot fail enforces
  * nothing).
  */
class OraclePortabilitySpec extends AnyFunSuite {

  /** sf0.001 suffices: the gate reads parquet schemas and bound plan
    * types, never data. */
  private val sfDir = "/root/testdata/sf0.001"

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Runs `python3 tools/selfcheck.py --types-only` over `oracle` and
    * returns (exit code, combined output). The spec shells the actual
    * gate binary rather than porting its family table — a port would be
    * a second implementation that could drift from the one the
    * pre-driver check actually runs. */
  private def runGate(oracle: Map[String, String]): (Int, String) = {
    val dir = java.nio.file.Files.createTempDirectory("oracle_gate")
    val json = oracle.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + jsonEscape(k) + "\": \"" + jsonEscape(v) + "\"" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(dir.resolve("oracle_sql.json"),
      json.getBytes("UTF-8"))
    val pb = new ProcessBuilder("python3", "tools/selfcheck.py",
      "--types-only", sfDir, dir.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    (code, out)
  }

  test("the full declared registry is type-portable (gate green)") {
    val (code, out) = runGate(SparkEntry.oracleSql)
    val fails = out.linesIterator
      .filter(l => l.startsWith("TYPEFAIL") || l.startsWith("FAIL")).toSeq
    assert(code == 0 && fails.isEmpty,
      s"oracle-type gate failed (exit $code):\n${fails.mkString("\n")}")
    // every oracle-declared query must have been checked — a gate that
    // silently skipped half the registry would be green vacuously
    val passes = out.linesIterator.count(_.startsWith("TYPEPASS"))
    assert(passes == SparkEntry.oracleSql.size,
      s"gate checked $passes of ${SparkEntry.oracleSql.size} oracles")
  }

  test("an uncast integer SUM (HUGEINT) fails the gate (gate can go red)") {
    val (code, out) = runGate(Map(
      "bad_uncast_sum" -> "SELECT SUM(n_chars) AS total FROM documents"))
    assert(code != 0, s"gate passed an uncast SUM:\n$out")
    assert(out.contains("TYPEFAIL bad_uncast_sum") && out.contains("HUGEINT"),
      s"expected a HUGEINT TYPEFAIL, got:\n$out")
  }

  test("a DECIMAL wider than double round-trip (>15 digits) fails the gate") {
    val (code, out) = runGate(Map(
      "bad_wide_decimal" ->
        "SELECT CAST(n_chars AS DECIMAL(20,2)) AS x FROM documents"))
    assert(code != 0, s"gate passed a DECIMAL(20,2):\n$out")
    assert(out.contains("TYPEFAIL bad_wide_decimal"),
      s"expected a wide-decimal TYPEFAIL, got:\n$out")
  }
}
