package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.catalog.GraftCatalog

/** The table-as-stream consumer loop: every appended row arrives exactly
  * once, in commit order, reading only delta files; rewrites stop the
  * follower instead of silently corrupting the stream.
  */
class IncrementalFollowerSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fixture(): GraftCatalog = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft-follow"), spark)
    cat.createDatabase("default")
    cat
  }

  test("pollOnce drains exactly the new snapshots, exactly once") {
    val cat = fixture()
    cat.createTable("f1", Seq(1).toDF("id").schema)
    var seen = Seq.empty[Int]
    var cursor = 0L
    // nothing yet
    cursor = IncrementalFollower.pollOnce(cat, "f1", cursor)((_, _) => fail())
    assert(cursor == 0L)
    cat.append("f1", Seq(1, 2).toDF("id"), 1000L)
    cat.append("f1", Seq(3).toDF("id"), 2000L)
    // two appends between polls arrive as ONE range batch at the newest id
    cursor = IncrementalFollower.pollOnce(cat, "f1", cursor) { (df, to) =>
      seen ++= df.as[Int].collect().sorted.toSeq
      assert(to == 2L)
    }
    assert(cursor == 2L && seen == Seq(1, 2, 3))
    // drained: nothing to do
    cursor = IncrementalFollower.pollOnce(cat, "f1", cursor)((_, _) => fail())
    assert(cursor == 2L)
    // the next append arrives alone
    cat.append("f1", Seq(4).toDF("id"), 3000L)
    cursor = IncrementalFollower.pollOnce(cat, "f1", cursor) { (df, _) =>
      assert(df.as[Int].collect().toSeq == Seq(4))
    }
    assert(cursor == 3L)
  }

  test("a rewrite in the range raises; resuming past it works") {
    val cat = fixture()
    cat.createTable("f2", Seq(1).toDF("id").schema)
    cat.append("f2", Seq(1, 2, 3).toDF("id"), 1000L)
    val cursor = IncrementalFollower.pollOnce(cat, "f2", 0L)((_, _) => ())
    cat.deleteWhere("f2", col("id") === 2, 2000L)
    intercept[IllegalArgumentException] {
      IncrementalFollower.pollOnce(cat, "f2", cursor)((_, _) => fail())
    }
    // caller decides: resume from the current id, accepting the gap
    val resumed = cat.store().currentSnapshotId("f2").get
    cat.append("f2", Seq(9).toDF("id"), 3000L)
    val after = IncrementalFollower.pollOnce(cat, "f2", resumed) { (df, _) =>
      assert(df.as[Int].collect().toSeq == Seq(9))
    }
    assert(after == resumed + 1)
  }

  test("follow loops until stopped and returns the resume cursor") {
    val cat = fixture()
    cat.createTable("f3", Seq(1).toDF("id").schema)
    val running = new AtomicBoolean(true)
    val total = new AtomicLong(0)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val done = new java.util.concurrent.CompletableFuture[Long]()
    val t = new Thread(() => done.complete(
      IncrementalFollower.follow(cat, "f3", pollMs = 25L) { (df, to) =>
        total.addAndGet(df.count()); batches.add(to)
      }(() => running.get())))
    t.start()
    try {
      cat.append("f3", Seq(1, 2).toDF("id"), 1000L)
      Thread.sleep(300)
      cat.append("f3", Seq(3, 4, 5).toDF("id"), 2000L)
      // wait until the follower has caught up, then stop it
      val deadline = System.currentTimeMillis() + 20000
      while (total.get() < 5 && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
    } finally {
      running.set(false)
      t.join(20000)
    }
    assert(done.getNow(-1L) == 2L) // the resume cursor
    assert(total.get() == 5)       // every row exactly once
    // commit order: batch end-ids strictly increase
    val ids = batches.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
    assert(ids == ids.sorted && ids.distinct == ids && ids.last == 2L)
  }
}
