package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed connected components over an undirected edge list —
  * alternating large-star / small-star rounds (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC '14), the
  * published algorithm for trillion-edge graphs: converges in
  * O(log² n) rounds and never materializes a neighborhood on one
  * machine (each round is groupBy-min + join — keyed shuffles only,
  * no collect_set, no driver state beyond a convergence checksum).
  *
  * Needed because pairwise near-dup dropping is not transitive: with
  * pairs A~B and B~C but no A~C edge, dropping "the higher id of each
  * pair" removes B and C while a cluster-aware pass keeps exactly one
  * of {A,B,C}. Components make the curation semantics well-defined:
  * every document maps to its component's minimum doc_id.
  */
object ConnectedComponents {

  /** Resolve components of the undirected graph given by `edges` (first
    * two columns = endpoints). Returns (`node`, `component`) for every
    * node incident to an edge, where `component` is the minimum node id
    * in the node's connected component.
    *
    * Edge lists at or below `driverThreshold` (after dedup) resolve by
    * exact union-find on the driver — label-identical, two Spark jobs
    * total — because near-dup pair graphs are output-sized and the
    * distributed loop's per-round fixed cost (checkpoint + convergence
    * action) dominates them; larger graphs take the star-contraction
    * path below, whose properties the rest of this doc describes.
    *
    * Iterations are bounded by `maxIter` (the algorithm provably needs
    * O(log² n); 25 rounds covers any realistic graph) and stop early on
    * a fixed point: an order-insensitive edge-set checksum (count + sum
    * of pair-hashes — one cheap action per round) gates an EXACT
    * `except`-based set-equality confirmation, so a checksum collision
    * cannot fake convergence. If `maxIter` is exhausted without a fixed
    * point the call FAILS (IllegalStateException) rather than silently
    * labeling from a non-star edge set — downstream `nearDupFilter`
    * drops documents by these labels, so a wrong label is silent data
    * loss. Each round is RELIABLY checkpointed to cut lineage — without
    * the cut the plan grows geometrically per round; with
    * `localCheckpoint` the persisted RDDs would outlive the call
    * (cache-leak invariant) and not survive executor loss. A temp
    * checkpoint dir is provisioned when the session has none; cluster
    * deployments should `setCheckpointDir` to durable storage.
    * Checkpoint data from round N is DELETED as soon as round N+1 is
    * checkpointed (Spark never cleans reliable checkpoints itself, so
    * Bench-style repeated calls would otherwise leak disk for the JVM's
    * lifetime); the final round's files — which the returned DataFrame
    * still reads — are registered for deletion at FileSystem close.
    * Round attribution is by checkpoint-dir listing diff, so concurrent
    * `components` calls on one session should use distinct checkpoint
    * dirs. */
  def components(s: SparkSession, edges: DataFrame, maxIter: Int = 25,
      driverThreshold: Long = 1000000L): DataFrame = {
    import s.implicits._
    val Array(ca0, cb0) = edges.columns.take(2)
    val dedupedInput = edges
      .select(col(ca0).cast(LongType).as("u"), col(cb0).cast(LongType).as("v"))
      .filter($"u" =!= $"v")
      .distinct()
    // Near-dup edge lists are OUTPUT-sized (pairs that verified), not
    // corpus-sized: overwhelmingly they fit the driver with room to
    // spare, and star contraction's per-round fixed cost (a checkpoint
    // plus a convergence action) dwarfs the actual work. Below the
    // threshold (default 1M edges ≈ 16 MB) run exact union-find on the
    // driver — same labels (min member id per component), two jobs
    // total; past it, fall through to the distributed contraction.
    // ONE limit-bounded collect both picks the path and fetches the
    // edges — a separate count() would evaluate the (often expensive)
    // upstream pair pipeline twice, and the limit caps driver memory at
    // threshold+1 rows even when the graph is huge. Collected as typed
    // (Long, Long) tuples (specialized, ~32 B each → ~32 MB at the 1M
    // default), not GenericRow (~100 B each). When the probe overflows,
    // its rows are discarded and the distributed path re-evaluates the
    // pair pipeline — one extra upstream pass, paid only by graphs big
    // enough that the contraction rounds dominate it anyway.
    val probe = dedupedInput
      .limit((driverThreshold + 1).min(Int.MaxValue.toLong).toInt)
      .as[(Long, Long)].collect()
    if (probe.length <= driverThreshold)
      return driverComponents(s, probe)
    distributedComponents(s, dedupedInput, maxIter)
  }

  /** Exact union-find with path halving; component label = the minimum
    * member id, matching the distributed path bit-for-bit. */
  private def driverComponents(s: SparkSession,
      es: Array[(Long, Long)]): DataFrame = {
    import s.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x
      while (parent.getOrElse(cur, cur) != cur) {
        val next = parent(cur); parent(cur) = root; cur = next
      }
      root
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // union-by-min keeps every root the minimum of its merged pair, and
    // transitively of its component
    val labels = parent.keys.toSeq.sorted.map(n => (n, find(n)))
    labels.toDF("node", "component")
  }

  private def distributedComponents(s: SparkSession, dedupedInput: DataFrame,
      maxIter: Int): DataFrame = {
    import s.implicits._
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString)
    val ckptRoot = new org.apache.hadoop.fs.Path(s.sparkContext.getCheckpointDir.get)
    val fs = ckptRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    def rddDirs(): Set[String] =
      if (fs.exists(ckptRoot)) fs.listStatus(ckptRoot).map(_.getPath.toString).toSet
      else Set.empty[String]
    // checkpoint df, returning the dirs this round created
    def cut(df: DataFrame): (DataFrame, Set[String]) = {
      val before = rddDirs()
      val out = df.checkpoint()
      (out, rddDirs() -- before)
    }
    def drop(dirs: Set[String]): Unit =
      dirs.foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
    var (e, eDirs) = cut(dedupedInput)
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(least($"u", $"v"), greatest($"u", $"v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = checksum(e)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // large-star: every strictly-larger neighbor of u links to the min
      // of u's neighborhood (computed per-u by aggregation, then joined
      // back — no neighborhood list ever materializes on one node)
      val nbrsL = e.union(e.select($"v".as("u"), $"u".as("v")))
      val minsL = nbrsL.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      val ls = nbrsL.join(minsL, "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v")
        .distinct()
      // small-star over the large-star output: u and its smaller
      // neighbors all link to the min of that set
      val nbrsS = ls.union(ls.select($"v".as("u"), $"u".as("v")))
      val smaller = nbrsS.filter($"v" < $"u")
      val minsS = smaller.groupBy($"u").agg(min($"v").as("m"))
      val ss = smaller.join(minsS, "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(minsS.select($"u", $"m".as("v")))
      val (next, nextDirs) = cut(ss.filter($"u" =!= $"v").distinct())
      val nextSig = checksum(next)
      // checksum equality is the cheap gate; exact set equality confirms
      // (counts already match, so one-direction except suffices)
      converged = nextSig == sig && next.except(e).isEmpty
      drop(eDirs) // round N's checkpoint is dead once round N+1 exists
      e = next
      eDirs = nextDirs
      sig = nextSig
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxIter rounds — " +
          "component labels would be wrong; raise maxIter")
    // the returned DataFrame still reads the final round's checkpoint:
    // delete it at FileSystem close, not now
    eDirs.foreach(d => fs.deleteOnExit(new org.apache.hadoop.fs.Path(d)))
    // At the fixed point edges form stars (node -> component min); the
    // min itself appears only on the right — add roots as self-labeled.
    val nonRoots = e.select($"u".as("node"), $"v".as("component"))
      .groupBy($"node").agg(min($"component").as("component"))
    val roots = e.select($"v".as("node")).distinct()
      .join(nonRoots, Seq("node"), "left_anti")
      .select($"node", $"node".as("component"))
    nonRoots.union(roots)
  }
}
