package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion maintenance for persisted indexes, riding the manifest CDC
  * feed: documents deleted from a [[ManifestTable]] corpus (via
  * [[ManifestTable.deleteWhere]] or a shrinking merge) leave GHOST rows
  * in the MinHash / BM25 / LSH / IVF index tables — wasted probe work that
  * accumulates with every delete, ghost candidates in probe results
  * (a new doc can be rejected as a near-dup of a document that no
  * longer exists), and a blocked data-deletion/compliance story. This
  * object computes WHAT to purge; the families' `compact(deletes)`
  * overloads apply it during the rewrite compaction performs anyway, so
  * the purge costs no extra pass over the index.
  *
  * Two modes, chosen by what the version bookmark still supports:
  *
  *  - CDC ([[IndexCompaction.Remove]]): the bookmarked version is still
  *    within [[ManifestTable.vacuum]]'s retention, so
  *    [[ManifestTable.changes]] yields exactly the rows deleted since —
  *    reading only partitions whose manifest pointer moved. Cost:
  *    O(changed partitions), independent of corpus size. The delete-id
  *    frame is typically tiny and broadcast into the folds' anti-joins.
  *  - RECONCILE ([[IndexCompaction.Retain]]): the bookmark is absent
  *    (first sync — deletes may predate it) or vacuumed past (consumer
  *    slower than the producer's retention window). The diff window is
  *    gone, but the END STATE is still known: the live corpus id set.
  *    Folds semi-join against it, sweeping every ghost regardless of
  *    when it appeared. Cost: O(corpus ids) — one column-pruned read,
  *    paid only on the degraded path, and the folds it feeds rewrite
  *    the whole index anyway. Mirrors [[IncrementalGold]]'s
  *    vacuumed-bookmark degrade: full-state fallback, never a throw.
  *
  * Both modes are idempotent (re-applying removes nothing new), so the
  * bookmark may advance strictly AFTER every family applied its set — a
  * crash mid-apply replays the same purge on the next run. Single
  * maintainer per (corpus, bookmark) assumed, same as every maintenance
  * job here.
  */
object IndexDeleteSync {

  /** What one sync cycle decided. `mode` ∈ cdc / reconcile / noop (no
    * version advance, or CDC window had no deletes). `deleteRows` is the
    * CDC delete-row count (−1 under reconcile: the live-set sweep never
    * counts ghosts up front). */
  final case class Report(fromVersion: Int, toVersion: Int, mode: String,
      deleteRows: Long)

  /** The purge set accumulated since the bookmark, plus the version the
    * bookmark should advance to once it is applied. None = nothing to do
    * (no committed corpus, no version advance, or an empty CDC delete
    * window — the bookmark is advanced here in that last case, since
    * there is nothing for the caller to apply first). */
  def pending(spark: SparkSession, corpusPath: String, bookmarkPath: String,
      keys: Seq[String], idCol: String = "doc_id")
      : Option[(Int, IndexCompaction.DeleteSet, Report)] = {
    val toV = ManifestTable.currentSnapshot(spark, corpusPath)
      .map(_.version).getOrElse(return None)
    val fromV = IncrementalGold.readBookmark(spark, bookmarkPath)
      .map(_.toInt).getOrElse(0)
    if (toV <= fromV) return None
    val diffable = fromV > 0 &&
      ManifestTable.snapshotAt(spark, corpusPath, fromV).isDefined
    if (diffable) {
      // localCheckpoint: the set feeds one fold PER INDEX TABLE (up to
      // seven across the three families) — materialize the CDC diff once
      // instead of re-reading the changed partitions per fold
      val ids = ManifestTable.changes(spark, corpusPath, fromV, toV, keys)
        .filter(col("change") === "delete")
        .select(col(idCol))
        .localCheckpoint()
      val n = ids.count() // driver-small action over O(changed partitions)
      if (n == 0) {
        // version moved with zero deletes (the common case): advance now,
        // spare every family the no-op anti-join
        IncrementalGold.writeBookmark(spark, bookmarkPath, toV.toString)
        None
      } else Some((toV, IndexCompaction.Remove(ids),
        Report(fromV, toV, "cdc", n)))
    } else
      Some((toV, IndexCompaction.Retain(
        ManifestTable.read(spark, corpusPath).select(col(idCol))
          .localCheckpoint()), // id column only, read once for all folds
        Report(fromV, toV, "reconcile", -1L)))
  }

  /** One maintenance cycle's full sync set: ghost purge PLUS updated-doc
    * reindex. `deletes` is what [[pending]] computes (None = nothing to
    * purge); `reindex` carries the UPDATED docs' CURRENT rows straight
    * from the CDC feed (the diff emits the new side's full content) —
    * the text-derived index families purge those ids' SUPERSEDED rows
    * during the fold and re-append the current version, closing the
    * staleness window [[pending]] alone leaves open: an updated doc
    * otherwise keeps BOTH generations' rows under one id, ghost-matching
    * copies of the retired text and double-counting shingle
    * intersections against probes. Updates are only knowable in CDC
    * mode; the RECONCILE degrade path returns `reindex = None` (content
    * staleness is invisible without the diff window — stale update rows
    * then persist until a CDC-mode pass, the same conservative class as
    * ghosts between maintenance runs). */
  final case class SyncSet(toVersion: Int,
      deletes: Option[IndexCompaction.DeleteSet],
      reindex: Option[DataFrame], report: Report)

  /** [[pending]] extended with the updated-doc reindex feed. None =
    * nothing to do at all (no corpus, no version advance, or an empty
    * CDC window — bookmark advanced here in that last case). Unlike
    * [[pending]], a window with zero deletes but pending UPDATES still
    * returns a SyncSet (deletes = None), so the reindex is never
    * silently skipped by the early advance. */
  def pendingFull(spark: SparkSession, corpusPath: String,
      bookmarkPath: String, keys: Seq[String], idCol: String = "doc_id")
      : Option[SyncSet] = {
    val toV = ManifestTable.currentSnapshot(spark, corpusPath)
      .map(_.version).getOrElse(return None)
    val fromV = IncrementalGold.readBookmark(spark, bookmarkPath)
      .map(_.toInt).getOrElse(0)
    if (toV <= fromV) return None
    val diffable = fromV > 0 &&
      ManifestTable.snapshotAt(spark, corpusPath, fromV).isDefined
    if (diffable) {
      val diff = ManifestTable.changes(spark, corpusPath, fromV, toV, keys)
        .localCheckpoint() // one CDC read serves both the purge and the reindex
      val delIds = diff.filter(col("change") === "delete").select(col(idCol))
      val upd = diff.filter(col("change") === "update")
      val nDel = delIds.count()
      val nUpd = upd.count()
      if (nDel == 0 && nUpd == 0) {
        IncrementalGold.writeBookmark(spark, bookmarkPath, toV.toString)
        None
      } else Some(SyncSet(toV,
        if (nDel == 0) None else Some(IndexCompaction.Remove(delIds)),
        if (nUpd == 0) None else Some(upd),
        Report(fromV, toV, "cdc", nDel)))
    } else
      Some(SyncSet(toV,
        Some(IndexCompaction.Retain(
          ManifestTable.read(spark, corpusPath).select(col(idCol))
            .localCheckpoint())),
        None, Report(fromV, toV, "reconcile", -1L)))
  }

  /** Advance the bookmark — call strictly AFTER every index family has
    * applied the pending set (idempotence covers a crash before this). */
  def advance(spark: SparkSession, bookmarkPath: String, toVersion: Int): Unit =
    IncrementalGold.writeBookmark(spark, bookmarkPath, toVersion.toString)

  /** One full sync cycle: compute the pending set, run `apply` with it
    * (the caller feeds it to each family's `compact(deletes)` /
    * `applyDeletes`), then advance the bookmark. */
  def sync(spark: SparkSession, corpusPath: String, bookmarkPath: String,
      keys: Seq[String], idCol: String = "doc_id")(
      apply: IndexCompaction.DeleteSet => Unit): Option[Report] =
    pending(spark, corpusPath, bookmarkPath, keys, idCol).map {
      case (toV, ds, report) =>
        apply(ds)
        advance(spark, bookmarkPath, toV)
        report
    }
}
