package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.catalog.GraftCatalog

/** Micro-batch consumer loop over the store's change-data-feed scan
  * ([[graft.store.TableStore.readChanges]]) — the CDC direction of
  * [[IncrementalFollower]]: where the append follower raises on a
  * rewrite snapshot (a file diff across one no longer means "added
  * rows"), this follower delivers the rewrite's ROW-LEVEL effect —
  * 'insert'/'delete'-tagged rows per commit — so a downstream sink can
  * mirror deletes and updates, not just appends (Delta's CDF streaming
  * read, Iceberg's changelog scan, as a caller-thread loop).
  *
  * Scale posture: the poll touches only the snapshot log; each batch's
  * cost is proportional to what the covered commits themselves touched —
  * appended files scan directly, COW commits diff only their
  * removed/added file pairs, and layout-only rewrites (compaction /
  * sort / z-order) contribute NOTHING, answered from their
  * `rows-preserved` summary marker alone. A consumer mirroring a 100 TB
  * table therefore streams change-sized batches through compactions
  * that would kill the append-only follower.
  */
object ChangeFeedFollower {

  /** Poll `table` until `running()` turns false, invoking `onBatch` with
    * the change rows committed since the last seen snapshot (tagged
    * `_change_type` / `_commit_snapshot_id` / `_commit_timestamp`) and
    * the snapshot id the batch advances to. Returns the last id seen —
    * the cursor a caller persists to resume (`startAfterId`). Batches
    * are RANGES: several commits between polls arrive as one frame,
    * rows still tagged per commit (exactly-once per change, commit
    * order recoverable by `_commit_snapshot_id`). `onBatch` runs on the
    * polling thread; an exception stops the loop without advancing the
    * cursor past that batch.
    */
  def follow(catalog: GraftCatalog, table: String,
      startAfterId: Long = 0L, pollMs: Long = 200L)(
      onBatch: (DataFrame, Long) => Unit)(running: () => Boolean): Long = {
    val store = catalog.store()
    var last = startAfterId
    var go = running()
    while (go) {
      store.currentSnapshotId(table).filter(_ > last).foreach { to =>
        onBatch(store.readChanges(table, last, Some(to)), to)
        last = to
      }
      go = running()
      if (go) Thread.sleep(pollMs)
    }
    last
  }

  /** One non-blocking catch-up poll: hand over whatever changed, return
    * the advanced cursor (unchanged if nothing new). */
  def pollOnce(catalog: GraftCatalog, table: String, startAfterId: Long)(
      onBatch: (DataFrame, Long) => Unit): Long = {
    val store = catalog.store()
    store.currentSnapshotId(table).filter(_ > startAfterId) match {
      case Some(to) =>
        onBatch(store.readChanges(table, startAfterId, Some(to)), to)
        to
      case None => startAfterId
    }
  }

  /** APPLY CHANGES INTO (Delta Live Tables' CDC-apply): net a change
    * batch per key and commit the target's keyed mirror in ONE
    * file-granular COW commit. Per key, the LATEST commit's change
    * wins; within a commit an UPDATE is a delete+insert pair, so
    * inserts out-rank deletes at equal snapshot id. A surviving
    * 'insert' upserts the key's row, a surviving 'delete' removes it —
    * untouched target rows (and untouched FILES) carry by reference.
    * Feed columns beyond the target schema (`_change_type` etc.) are
    * dropped at apply. */
  def applyChanges(catalog: GraftCatalog, target: String, feed: DataFrame,
      keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "applyChanges needs key columns")
    val st = catalog.store()
    val sch = st.schema(target)
    // last writer per key via ONE map-side-combining hash aggregate
    // ([[EventStreams.netLatestByKey]] — latest commit wins, the
    // post-image out-ranks its same-commit delete pair). The former
    // row_number window spelled the same netting as a full shuffle+SORT
    // of the feed; max_by needs no order at all. PERSISTED for the span
    // of the commit: the merge reads it several times (key probe,
    // anti-join, post-image union), and each un-cached read would
    // re-run the netting AND the change-feed diff it consumes —
    // O(batch) cache, freed before returning.
    val last = EventStreams.netLatestByKey(feed, keyCols,
      "_commit_snapshot_id").persist()
    try {
      val upserts = last
        .filter(col(graft.store.TableStore.ChangeTypeCol) === "insert")
        .select(sch.fieldNames.toIndexedSeq.map(col): _*)
      // netted: one row per key already — no distinct needed
      val batchKeys = last.select(keyCols.map(col): _*)
      // one commit: matched files lose every batch key's old row, then
      // the surviving post-images append — deletes and upserts land
      // atomically, untouched files carry
      st.merge(target, batchKeys, keyCols, matchedRows =>
        matchedRows.join(batchKeys, keyCols, "left_anti")
          .unionByName(upserts))
      catalog.registerView(target)
    } finally last.unpersist()
  }

  /** Merge-on-read APPLY CHANGES: the same per-key netting as
    * [[applyChanges]], landed as ONE equality-delete + append commit
    * ([[graft.store.TableStore.equalityApply]]) instead of a COW merge.
    * Where the COW apply must LOCATE every matched file (a probe over
    * the target) and rewrite it, this path writes one key-tuple file
    * plus the post-image batch and never reads the target at all —
    * O(batch) per poll whatever the mirror's size, the shape a
    * 100 TB continuously-replicated table needs. The price is the
    * standard equality-delete one: reads carry an extra broadcast
    * anti-join and metadata COUNT declines until OPTIMIZE. */
  def applyChangesMor(catalog: GraftCatalog, target: String, feed: DataFrame,
      keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "applyChangesMor needs key columns")
    val st = catalog.store()
    val sch = st.schema(target)
    // same hash-aggregate netting as [[applyChanges]] — no window sort,
    // and the same commit-scoped persist (the equality apply reads the
    // netted frame for delete keys AND post-images)
    val last = EventStreams.netLatestByKey(feed, keyCols,
      "_commit_snapshot_id").persist()
    try {
      val upserts = last
        .filter(col(graft.store.TableStore.ChangeTypeCol) === "insert")
        .select(sch.fieldNames.toIndexedSeq.map(col): _*)
      val deleteKeys = last
        .filter(col(graft.store.TableStore.ChangeTypeCol) === "delete")
        .select(keyCols.map(col): _*)
      st.equalityApply(target, deleteKeys, upserts, keyCols)
      catalog.registerView(target)
    } finally last.unpersist()
  }

  /** The composed replication loop: follow `src`'s change feed and
    * mirror every batch into `dst` with [[applyChanges]] — CDC
    * replication from one snapshot table to another, resumable via the
    * returned cursor. */
  def mirror(catalog: GraftCatalog, src: String, dst: String,
      keyCols: Seq[String], startAfterId: Long = 0L): Long =
    pollOnce(catalog, src, startAfterId)(
      (batch, _) => applyChanges(catalog, dst, batch, keyCols))

  /** [[mirror]] with the merge-on-read apply: each poll lands as a
    * no-read equality commit on `dst`. */
  def mirrorMor(catalog: GraftCatalog, src: String, dst: String,
      keyCols: Seq[String], startAfterId: Long = 0L): Long =
    pollOnce(catalog, src, startAfterId)(
      (batch, _) => applyChangesMor(catalog, dst, batch, keyCols))
}
