package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measured-claims hygiene: the query counts README.md and SCALE.md
  * advertise must equal the registry — the round-5 verdict caught the
  * docs drifting from `SparkEntry.all` (115 vs "the declared 116"),
  * so the numbers are now pinned here and fail the build when a new
  * QueryDef lands without its doc update. */
class SurfaceCountSpec extends AnyFunSuite {

  private val declared = SparkEntry.all.size
  private val oracle = SparkEntry.oracleSql.size
  private val rowsOnly = declared - oracle

  test("README.md advertises the registry's exact counts") {
    val readme = scala.io.Source.fromFile("README.md", "UTF-8").mkString
    val expected =
      s"$declared declared queries, $oracle oracle-checked, $rowsOnly rows-only"
    assert(readme.contains(expected),
      s"README.md must state '$expected' (registry: ${SparkEntry.all.size} defs)")
  }

  test("SCALE.md advertises the registry's exact counts") {
    val scale = scala.io.Source.fromFile("SCALE.md", "UTF-8").mkString
    val expected = s"$declared declared, $oracle DuckDB-oracle-checked"
    assert(scale.contains(expected), s"SCALE.md must state '$expected'")
  }

  test("the rows-only set is exactly the two documented exceptions") {
    val rowsOnlyNames = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(rowsOnlyNames ==
      Set("a15_approx_count_distinct", "mm_feature_extract"),
      s"rows-only queries changed: $rowsOnlyNames — update README/SCALE and this spec")
  }
}
