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
}
