package graft

import graft.etl.ManifestTable
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Cross-JVM optimistic-concurrency demo — the multi-writer lakehouse
  * story [[ManifestTable.mergeIntoRetrying]] exists for, exercised with
  * two REAL writer processes (ManifestTableSpec's hook test covers the
  * same seam single-JVM; `tools/occ_demo.sh` runs this main twice in
  * parallel). Both writers stage disjoint batches against the SAME base
  * snapshot, coordinated through filesystem barrier markers:
  *
  *   - `win`:  touch own marker, wait for the peer's, commit — first
  *     commit lands its version atomically.
  *   - `lose`: touch own marker, wait for the peer's, then ALSO wait for
  *     the manifest version to advance (the winner's commit landing) —
  *     its own commit then hits a genuine [[ManifestTable.ConcurrentCommitException]]
  *     from a concurrent process, re-stages against the winner's
  *     snapshot, and lands on attempt 2.
  *
  * The sequencing makes the conflict DETERMINISTIC (a free-running race
  * would only usually collide) while everything under test — the
  * conflict detection, the re-stage, the convergence — is the real
  * cross-process protocol on the shared manifest directory. The script
  * asserts the printed attempt counts (1 and 2) and that the final
  * table holds BOTH writers' rows.
  *
  * Usage:
  *   runMain graft.OccDemo seed  <table>
  *   runMain graft.OccDemo win   <table> <barrierDir>
  *   runMain graft.OccDemo lose  <table> <barrierDir>
  *   runMain graft.OccDemo check <table> <expectRows>
  */
object OccDemo {

  private def await(cond: => Boolean, what: String,
      timeoutSec: Int = 120): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1_000_000_000L
    while (!cond) {
      if (System.nanoTime() > deadline)
        sys.error(s"[occ] timed out waiting for $what")
      Thread.sleep(100)
    }
  }

  private def batch(spark: SparkSession, lo: Long, hi: Long) = {
    import spark.implicits._
    (lo to hi).map(i =>
        (i, java.sql.Date.valueOf("2024-03-0" + (i % 3 + 1)), s"w$lo-$i"))
      .toDF("id", "date", "payload")
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val table = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq("id", "date")

    def version(): Int = ManifestTable.currentSnapshot(spark, table)
      .map(_.version).getOrElse(0)

    mode match {
      case "seed" =>
        ManifestTable.mergeInto(spark, batch(spark, 0L, 9L), table,
          keys, "date")
        println(s"[occ] seeded ${ManifestTable.read(spark, table).count()} rows at v${version()}")

      case "win" | "lose" =>
        val barrier = Paths.get(args(2))
        Files.createDirectories(barrier)
        val (mine, theirs) =
          if (mode == "win") ("win.staged", "lose.staged")
          else ("lose.staged", "win.staged")
        val v0 = version()
        val (lo, hi) = if (mode == "win") (100L, 199L) else (200L, 299L)
        val attempts = ManifestTable.mergeIntoRetryingHook(spark,
          batch(spark, lo, hi), table, keys, "date") { attempt =>
          if (attempt == 1) {
            Files.write(barrier.resolve(mine), Array.empty[Byte])
            await(Files.exists(barrier.resolve(theirs)),
              s"peer marker $theirs")
            if (mode == "lose")
              // let the winner's commit land first, so THIS commit is
              // the deterministic conflict
              await(version() > v0, s"manifest advance past v$v0")
          }
        }
        println(s"[occ] writer $mode committed after $attempts attempt(s) at v${version()}")

      case "check" =>
        val expect = args(2).toLong
        val rows = ManifestTable.read(spark, table).count()
        val ok = rows == expect
        println(s"[occ] check rows=$rows expect=$expect ${if (ok) "OK" else "FAIL"}")
        if (!ok) sys.exit(1)
    }
    spark.stop()
  }
}
