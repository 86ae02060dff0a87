package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.catalog.GraftCatalog

/** Micro-batch consumer loop over the snapshot store's incremental read:
  * each iteration hands `onBatch` the rows appended since the last seen
  * snapshot (as ONE distributed DataFrame over exactly the delta files)
  * plus the snapshot id the batch advances to — the table-as-stream
  * direction Iceberg exposes via `spark.readStream`, built on
  * [[graft.store.TableStore.readIncremental]].
  *
  * Scale posture: the poll touches only the snapshot log (one tiny
  * metadata read per interval); each batch scans only the files added in
  * `(lastSeen, current]`, so a consumer keeping up with appends on a
  * 100 TB table streams deltas and never re-reads the base. A rewrite
  * snapshot (delete/update/replace/merge) in the range makes
  * `readIncremental` raise — mirroring Iceberg's streaming-read default
  * for overwrite snapshots — because a file diff across a rewrite no
  * longer means "added rows"; the caller decides whether to resume from
  * the current id (accepting the gap) or fail the pipeline.
  */
object IncrementalFollower {

  /** Poll `table` until `running()` turns false, invoking `onBatch` for
    * every advance. Returns the last snapshot id seen, the cursor a
    * caller persists to resume later (`startAfterId`). Batches are
    * RANGES: if several appends land between polls they arrive as one
    * batch ending at the newest id (exactly-once per row, in commit
    * order). `onBatch` runs on the polling thread; an exception it
    * throws stops the loop without advancing the cursor past that batch.
    */
  def follow(catalog: GraftCatalog, table: String,
      startAfterId: Long = 0L, pollMs: Long = 200L)(
      onBatch: (DataFrame, Long) => Unit)(running: () => Boolean): Long = {
    val store = catalog.store()
    var last = startAfterId
    var go = running()
    while (go) {
      store.currentSnapshotId(table).filter(_ > last).foreach { to =>
        onBatch(store.readIncremental(table, last, Some(to)), to)
        last = to
      }
      go = running()
      if (go) Thread.sleep(pollMs)
    }
    last
  }

  /** One non-blocking catch-up poll: process whatever is new, return the
    * advanced cursor (unchanged if nothing new) — the building block for
    * schedulers that own their own cadence. */
  def pollOnce(catalog: GraftCatalog, table: String, startAfterId: Long)(
      onBatch: (DataFrame, Long) => Unit): Long = {
    val store = catalog.store()
    store.currentSnapshotId(table).filter(_ > startAfterId) match {
      case Some(to) =>
        onBatch(store.readIncremental(table, startAfterId, Some(to)), to)
        to
      case None => startAfterId
    }
  }
}
