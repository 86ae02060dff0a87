package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Materialized change files (Delta CDF's stored design): with the
  * change feed ENABLED, every COW commit writes its own row-level diff
  * under `cdc/<uuid>/` and the feed serves those files directly — same
  * values as the diff fallback, cost ∝ |changes|. Expire and vacuum
  * reclaim change files with their snapshots.
  */
class StoredChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def newStore(): TableStore =
    new TableStore(new HPath(Files.createTempDirectory("graft-scdc").toUri), spark)

  private def feedRows(st: TableStore, t: String, from: Long = 0L) =
    st.readChanges(t, from)
      .select(col("id"), col("v"), col("_change_type"),
        col("_commit_snapshot_id"))
      .as[(Int, Double, String, Long)].collect().toSeq.sorted

  test("enabled feed: COW commits record cdc dirs and the feed reads THEM") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("id", "v"), 1000L)
    st.updateWhere("t", Seq("v" -> (col("v") * 10)), Some(col("id") === 2), 2000L)
    st.deleteWhere("t", col("id") === 3, 3000L)

    // both COW commits carry a cdc-dir marker
    val snaps = st.snapshotsMetadata("t")
      .select(col("snapshot_id"), col("summary"))
      .collect().map(r => r.getLong(0) ->
        r.getMap[String, String](1).get(TableStore.CdcDirKey)).toMap
    assert(snaps(2L).isDefined && snaps(3L).isDefined && snaps(1L).isEmpty)

    // the feed's COW rows come from the stored cdc files, not data files
    val cowFeed = st.readChanges("t", 1L)
    assert(cowFeed.inputFiles.nonEmpty &&
      cowFeed.inputFiles.forall(_.contains("/cdc/")),
      s"expected cdc-backed scan, got ${cowFeed.inputFiles.toSeq}")

    assert(feedRows(st, "t") == Seq(
      (1, 1.0, "insert", 1L), (2, 2.0, "delete", 2L), (2, 2.0, "insert", 1L),
      (2, 20.0, "insert", 2L), (3, 3.0, "delete", 3L), (3, 3.0, "insert", 1L)))
  }

  test("stored path equals the diff fallback exactly") {
    def run(enabled: Boolean): Seq[(Int, Double, String, Long)] = {
      val st = newStore()
      st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
      if (enabled) st.setChangeFeed("t", enabled = true)
      st.append("t", (1 to 30).map(i => (i, i * 1.0)).toDF("id", "v"), 1000L)
      st.upsert("t", Seq((5, 500.0), (31, 31.0)).toDF("id", "v"),
        Seq("id"), 2000L)
      st.deleteWhere("t", col("id") % 7 === 0, 3000L)
      feedRows(st, "t")
    }
    assert(run(enabled = true) == run(enabled = false))
  }

  test("pre-enable history still answers via the fallback diff") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.append("t", Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), 1000L)
    st.deleteWhere("t", col("id") === 1, 2000L) // no feed yet → no cdc dir
    st.setChangeFeed("t", enabled = true)
    st.deleteWhere("t", col("id") === 2, 3000L) // stored
    assert(feedRows(st, "t") == Seq(
      (1, 1.0, "delete", 2L), (1, 1.0, "insert", 1L),
      (2, 2.0, "delete", 3L), (2, 2.0, "insert", 1L)))
  }

  test("expire reclaims dropped snapshots' change files; vacuum reclaims orphans") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), 1000L)
    st.deleteWhere("t", col("id") === 1, 2000L)
    st.append("t", Seq((3, 3.0)).toDF("id", "v"), 3000L)
    val fs = st.metaFs
    val cdcRoot = new HPath(st.tableDir("t"), "cdc")
    assert(fs.listStatus(cdcRoot).length == 1)
    // expire everything older than the last snapshot: the delete commit
    // (and its cdc dir) goes
    st.expire("t", 3000L)
    assert(!fs.exists(cdcRoot) || fs.listStatus(cdcRoot).isEmpty)

    // orphan: a cdc dir no snapshot references (crashed COW)
    fs.mkdirs(new HPath(cdcRoot, "deadbeef"))
    st.vacuum("t", System.currentTimeMillis() + 1000)
    assert(!fs.exists(new HPath(cdcRoot, "deadbeef")))
  }

  test("concurrent COW writers with the feed enabled: both commit, the " +
      "feed records both, retried attempts leave only vacuumable orphans") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", (1 to 40).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(4), 1000L)
    // two deletes on disjoint predicates racing: the COW retry replays
    // the loser against the winner's snapshot
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = new Thread(() =>
      try st.deleteWhere("t", col("id") <= 5)
      catch { case e: Throwable => errs.add(e) })
    val t2 = new Thread(() =>
      try st.deleteWhere("t", col("id") > 35)
      catch { case e: Throwable => errs.add(e) })
    t1.start(); t2.start(); t1.join(60000); t2.join(60000)
    assert(errs.isEmpty, s"concurrent deletes failed: ${errs.toArray.toSeq}")
    assert(st.read("t").count() == 30)
    // the feed sees exactly the ten deleted rows, five per commit
    val feed = st.readChanges("t", 1L)
      .select(col("id"), col("_change_type"), col("_commit_snapshot_id"))
      .as[(Int, String, Long)].collect().toSeq
    assert(feed.size == 10 && feed.forall(_._2 == "delete"))
    assert(feed.map(_._1).sorted == ((1 to 5) ++ (36 to 40)))
    assert(feed.map(_._3).distinct.sorted == Seq(2L, 3L))
    // any cdc dir from an aborted first attempt is unreferenced debris
    // that vacuum reclaims; the two committed dirs survive
    st.vacuum("t", System.currentTimeMillis() + 1000)
    val fs = st.metaFs
    val cdcRoot = new HPath(st.tableDir("t"), "cdc")
    assert(fs.listStatus(cdcRoot).length == 2)
    assert(st.readChanges("t", 1L).count() == 10) // feed intact post-vacuum
  }

  test("feeds crossing a RENAME render old change files under the new name") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), 1000L)
    st.deleteWhere("t", col("id") === 1, 2000L) // cdc files carry "v"
    st.renameColumn("t", "v", "val")
    st.append("t", Seq((3, 3.0)).toDF("id", "val"), 3000L)
    st.deleteWhere("t", col("id") === 2, 4000L) // cdc files carry "val"
    val feed = st.readChanges("t", 0L)
      .select(col("id"), col("val"), col("_change_type"))
      .as[(Int, Double, String)].collect().toSeq.sorted
    assert(feed == Seq((1, 1.0, "delete"), (1, 1.0, "insert"),
      (2, 2.0, "delete"), (2, 2.0, "insert"), (3, 3.0, "insert")))
  }

  test("TRUNCATE under an enabled feed materializes all-delete change files") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), 1000L)
    st.truncate("t", 2000L)
    assert(st.read("t").count() == 0)
    val feed = st.readChanges("t", 1L)
    // served from stored change files, not a re-diff
    assert(feed.inputFiles.nonEmpty && feed.inputFiles.forall(_.contains("/cdc/")))
    assert(feed.select(col("id"), col("_change_type"))
      .as[(Int, String)].collect().toSeq.sorted ==
      Seq((1, "delete"), (2, "delete")))
  }

  test("rollback under an enabled feed materializes the undo diff") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), 1000L)
    st.append("t", Seq((3, 3.0)).toDF("id", "v"), 2000L)
    st.deleteWhere("t", col("id") === 1, 3000L)
    st.rollback("t", 1L, 4000L) // undo the append of 3 AND the delete of 1
    assert(st.read("t").count() == 2)
    val feed = st.readChanges("t", 3L)
    assert(feed.inputFiles.forall(_.contains("/cdc/")))
    assert(feed.select(col("id"), col("_change_type"))
      .as[(Int, String)].collect().toSeq.sorted ==
      Seq((1, "insert"), (3, "delete")))
    // the whole feed replays the table exactly through the rollback
    val replayed = st.readChanges("t", 0L)
    assert(replayed.filter(col("_change_type") === "insert").count() -
      replayed.filter(col("_change_type") === "delete").count() == 2)
  }

  test("randomized op-sequence property: base + feed replay == final " +
      "table, stored and fallback paths agree") {
    def run(enabled: Boolean, seed: Int): (Seq[(Int, Double)], Seq[(Int, Double, String, Long)]) = {
      val rnd = new scala.util.Random(seed)
      val st = newStore()
      st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
      if (enabled) st.setChangeFeed("t", enabled = true)
      var nextId = 0
      def fresh(n: Int): org.apache.spark.sql.DataFrame = {
        val rows = (nextId until nextId + n).map(i => (i, i * 1.5))
        nextId += n
        rows.toDF("id", "v")
      }
      st.append("t", fresh(20), 1000L)
      (1 to 12).foreach { step =>
        rnd.nextInt(6) match {
          case 0 => st.append("t", fresh(5 + rnd.nextInt(10)), 1000L + step)
          case 1 => st.deleteWhere("t", col("id") % (2 + rnd.nextInt(5)) === 0,
            1000L + step)
          case 2 => st.updateWhere("t", Seq("v" -> (col("v") + 100)),
            Some(col("id") % (3 + rnd.nextInt(4)) === 1), 1000L + step)
          case 3 => st.compact("t")
          case 4 => st.upsert("t",
            fresh(3).withColumn("v", col("v") * 10), Seq("id"), 1000L + step)
          case 5 =>
            val ids = st.currentSnapshotId("t").get
            st.rollback("t", math.max(1L, ids - 1 - rnd.nextInt(2)),
              1000L + step)
        }
      }
      val fin = st.read("t").select("id", "v")
        .as[(Int, Double)].collect().toSeq.sorted
      val feed = st.readChanges("t", 0L)
        .select(col("id"), col("v"), col("_change_type"),
          col("_commit_snapshot_id"))
        .as[(Int, Double, String, Long)].collect().toSeq.sorted
      // replay: inserts minus deletes must equal the final multiset
      val counts = scala.collection.mutable.Map[(Int, Double), Int]()
      feed.foreach { case (id, v, ct, _) =>
        val d = if (ct == "insert") 1 else -1
        counts((id, v)) = counts.getOrElse((id, v), 0) + d
      }
      val replayed = counts.toSeq.flatMap { case (row, n) =>
        assert(n >= 0, s"negative multiplicity for $row")
        Seq.fill(n)(row)
      }.sorted
      assert(replayed == fin,
        s"seed=$seed enabled=$enabled replay mismatch:\n$replayed\nvs\n$fin")
      (fin, feed)
    }
    for (seed <- Seq(1, 7, 23)) {
      val (finS, feedS) = run(enabled = true, seed)
      val (finF, feedF) = run(enabled = false, seed)
      assert(finS == finF, s"seed=$seed: final states diverge")
      assert(feedS == feedF, s"seed=$seed: stored vs fallback feeds diverge")
    }
  }

  test("compaction under an enabled feed stays silent and unmaterialized") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.setChangeFeed("t", enabled = true)
    st.append("t", (1 to 10).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(3), 1000L)
    st.compact("t")
    val fs = st.metaFs
    assert(!fs.exists(new HPath(st.tableDir("t"), "cdc")))
    assert(st.readChanges("t", 1L).count() == 0)
  }
}
