package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.catalog.GraftCatalog

/** The CDC consumer loop: row-level changes arrive exactly once per
  * commit with their tags; rewrites deliver their net effect instead of
  * stopping the stream (the contract that separates this from
  * [[IncrementalFollower]]); compactions pass through silently.
  */
class ChangeFeedFollowerSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fixture(): GraftCatalog = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft-cdcf"), spark)
    cat.createDatabase("default")
    cat
  }

  private def drain(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, Long)] =
    df.select(col("id"), col("_change_type"), col("_commit_snapshot_id"))
      .as[(Int, String, Long)].collect().toSeq.sorted

  test("pollOnce delivers inserts AND deletes across a COW rewrite") {
    val cat = fixture()
    cat.createTable("c1", Seq(1).toDF("id").schema)
    var cursor = 0L
    cursor = ChangeFeedFollower.pollOnce(cat, "c1", cursor)((_, _) => fail())
    assert(cursor == 0L)
    cat.append("c1", Seq(1, 2, 3).toDF("id"), 1000L)
    cat.deleteWhere("c1", col("id") === 2)
    // append + delete between polls: one range batch, tagged per commit
    var seen = Seq.empty[(Int, String, Long)]
    cursor = ChangeFeedFollower.pollOnce(cat, "c1", cursor) { (df, to) =>
      seen = drain(df); assert(to == 2L)
    }
    assert(cursor == 2L)
    assert(seen == Seq((1, "insert", 1L), (2, "delete", 2L),
      (2, "insert", 1L), (3, "insert", 1L)))
    // drained
    cursor = ChangeFeedFollower.pollOnce(cat, "c1", cursor)((_, _) => fail())
    assert(cursor == 2L)
  }

  test("compaction advances the cursor with an empty batch") {
    val cat = fixture()
    cat.createTable("c2", Seq(1).toDF("id").schema)
    cat.append("c2", (1 to 10).toDF("id").repartition(3), 1000L)
    var cursor = ChangeFeedFollower.pollOnce(cat, "c2", 0L)((_, _) => ())
    cat.compact("c2")
    cursor = ChangeFeedFollower.pollOnce(cat, "c2", cursor) { (df, _) =>
      assert(df.count() == 0) // rows-preserved marker: nothing to deliver
    }
    assert(cursor == 2L)
    // post-compaction appends keep flowing
    cat.append("c2", Seq(11).toDF("id"), 2000L)
    ChangeFeedFollower.pollOnce(cat, "c2", cursor) { (df, _) =>
      assert(drain(df) == Seq((11, "insert", 3L)))
    }
  }

  test("applyChanges nets a batch per key: upserts, deletes, update pairs") {
    val cat = fixture()
    cat.createTable("src", Seq((1, "a")).toDF("id", "s").schema)
    cat.createTable("dst", Seq((1, "a")).toDF("id", "s").schema)
    cat.append("src", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s"), 1000L)
    var cursor = ChangeFeedFollower.mirror(cat, "src", "dst", Seq("id"))
    assert(cat.table("dst").orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
    // one batch spanning an update (delete+insert pair), a delete, and
    // a fresh insert — each key nets to its latest state
    cat.store().updateWhere("src", Seq("s" -> lit("B")), Some(col("id") === 2))
    cat.deleteWhere("src", col("id") === 1)
    cat.append("src", Seq((4, "d")).toDF("id", "s"), 2000L)
    cursor = ChangeFeedFollower.mirror(cat, "src", "dst", Seq("id"), cursor)
    assert(cat.table("dst").orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((2, "B"), (3, "c"), (4, "d")))
    // idempotent: nothing new → no commit
    val snaps = cat.store().currentSnapshotId("dst").get
    assert(ChangeFeedFollower.mirror(cat, "src", "dst", Seq("id"), cursor)
      == cursor)
    assert(cat.store().currentSnapshotId("dst").get == snaps)
    // delete-then-reinsert of the same key across commits in ONE batch:
    // the latest commit wins
    cat.deleteWhere("src", col("id") === 3)
    cat.append("src", Seq((3, "c2")).toDF("id", "s"), 3000L)
    ChangeFeedFollower.mirror(cat, "src", "dst", Seq("id"), cursor)
    assert(cat.table("dst").filter(col("id") === 3)
      .as[(Int, String)].head() == ((3, "c2")))
  }

  test("follow loop mirrors a table through update and delete") {
    import scala.jdk.CollectionConverters._
    val cat = fixture()
    cat.createTable("c3", Seq((1, 1.0)).toDF("id", "v").schema)
    val stop = new AtomicBoolean(false)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[(Int, Double, String)]]
    val worker = new Thread(() => {
      ChangeFeedFollower.follow(cat, "c3", pollMs = 50L) { (df, _) =>
        batches.add(df.select(col("id"), col("v"), col("_change_type"))
          .as[(Int, Double, String)].collect().toSeq)
      }(() => !stop.get())
    })
    worker.start()
    try {
      cat.append("c3", Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), 1000L)
      cat.store().updateWhere("c3", Seq("v" -> col("v") * 10),
        Some(col("id") === 2))
      cat.deleteWhere("c3", col("id") === 1)
      val deadline = System.currentTimeMillis() + 30000
      while (batches.asScala.flatten.size < 5 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally { stop.set(true); worker.join(30000) }
    val all = batches.asScala.flatten.toSeq.sorted
    assert(all == Seq((1, 1.0, "delete"), (1, 1.0, "insert"),
      (2, 2.0, "delete"), (2, 2.0, "insert"), (2, 20.0, "insert")))
  }
}
