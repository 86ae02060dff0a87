package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5 property: reading AS OF t must equal replaying exactly
  * the prefix of appends committed at or before t — for any append
  * history and any probe time. Exercises only the (pure, driver-side)
  * snapshot log, so hundreds of cases stay fast.
  */
class SnapshotResolvePropertySpec extends AnyFunSuite {

  private lazy val conf = new org.apache.hadoop.conf.Configuration()

  private val genBatchSizes = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.choose(1, 20)))
  private val genProbe = Gen.choose(0L, 6000L)

  test("AS OF t ≡ replay of the append prefix with commit time <= t") {
    val prop = Prop.forAll(genBatchSizes, genProbe) { (sizes, probe) =>
      val dir = new HPath(Files.createTempDirectory("graft-prop").toUri)
      val fs = FileSystem.get(dir.toUri, conf)
      // commit batch i at time 1000*(i+1) with `size` synthetic files
      sizes.zipWithIndex.foreach { case (size, i) =>
        SnapshotLog.commit(fs, dir, "append",
          newFiles = (0 until size).map(j => DataFile(s"data/b$i-f$j")),
          recordCount = size.toLong, // delta; cumulative computed in-lock
          timestampMs = 1000L * (i + 1))
      }
      val expectedFiles = sizes.zipWithIndex
        .filter { case (_, i) => 1000L * (i + 1) <= probe }
        .flatMap { case (size, i) => (0 until size).map(j => s"data/b$i-f$j") }
      val resolved = SnapshotLog.resolve(fs, dir, Some(probe))
        .map(_.filePaths).getOrElse(Seq.empty)
      val latestSnap = SnapshotLog.resolve(fs, dir, None)
      val latest = latestSnap.map(_.files.size).getOrElse(0)
      // cumulative recordCount is derived in-lock from the append deltas
      resolved == expectedFiles && latest == sizes.sum &&
        latestSnap.map(_.recordCount) == Some(sizes.sum.toLong)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }

  test("commit ids increase monotonically and files accumulate") {
    val dir = new HPath(Files.createTempDirectory("graft-prop2").toUri)
    val fs = FileSystem.get(dir.toUri, conf)
    val s1 = SnapshotLog.commit(fs, dir, "append", Seq(DataFile("data/a")), 1, 100L)
    val s2 = SnapshotLog.commit(fs, dir, "append", Seq(DataFile("data/b")), 2, 200L)
    val s3 = SnapshotLog.commit(fs, dir, "replace", Seq(DataFile("data/c")), 1, 300L,
      replaceAll = true)
    assert(Seq(s1.id, s2.id, s3.id) == Seq(1L, 2L, 3L))
    assert(s2.filePaths == Seq("data/a", "data/b"))
    assert(s3.filePaths == Seq("data/c")) // replaceAll drops the history's files
    val all = SnapshotLog.read(fs, dir)
    assert(all.map(_.id) == Seq(1L, 2L, 3L))
    assert(all.last.summary.isEmpty)
  }

  test("concurrent commits serialize under the lock — none are lost") {
    val dir = new HPath(Files.createTempDirectory("graft-conc").toUri)
    val fs = FileSystem.get(dir.toUri, conf)
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = (1 to threads).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            SnapshotLog.commit(fs, dir, "append", Seq(DataFile(s"data/f$i")), i.toLong,
              timestampMs = 1000L + i).id
        })
      }
      val ids = futures.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
      // every commit got a distinct id and none was lost
      assert(ids.toSet == (1L to threads.toLong).toSet)
      val log = SnapshotLog.read(fs, dir)
      assert(log.size == threads)
      // the last snapshot accumulated every file exactly once
      assert(log.last.filePaths.toSet == (1 to threads).map(i => s"data/f$i").toSet)
      // and the cumulative recordCount (computed inside the lock from the
      // per-commit deltas) agrees with the serialized commit order — no
      // writer based its total on a stale pre-lock read
      assert(log.last.recordCount == (1 to threads).map(_.toLong).sum)
    } finally pool.shutdownNow()
  }

  test("a stale lock from a crashed writer is broken, not waited on forever") {
    val dir = new HPath(Files.createTempDirectory("graft-stale").toUri)
    val fs = FileSystem.get(dir.toUri, conf)
    fs.mkdirs(dir)
    val lock = new HPath(dir, "commit.lock")
    fs.create(lock, false).close()
    // age the lock beyond the stale threshold
    fs.setTimes(lock, System.currentTimeMillis() - SnapshotLog.StaleLockMs - 1000, -1)
    val snap = SnapshotLog.commit(fs, dir, "append", Seq(DataFile("data/x")), 1, 100L)
    assert(snap.id == 1L)
    assert(!fs.exists(lock)) // released after the commit
  }

  test("large file lists spill to manifests and hydrate on resolve") {
    val dir = new HPath(Files.createTempDirectory("graft-manifest").toUri)
    val fs = FileSystem.get(dir.toUri, conf)
    val files1 = (1 to 5).map(i => DataFile(s"data/a$i", i.toLong))
    SnapshotLog.commit(fs, dir, "append", files1, 15, 100L,
      manifestThreshold = 3)
    // spilled: the log holds a reference + count, never the list
    val logText = new String(fs.open(SnapshotLog.logPath(dir)).readAllBytes())
    assert(logText.contains("manifest-1-") && !logText.contains("data/a1"))
    val unhydrated = SnapshotLog.read(fs, dir).head
    assert(unhydrated.files.isEmpty && unhydrated.fileCount == 5)
    // resolve hydrates exactly the resolved snapshot
    val resolved = SnapshotLog.resolve(fs, dir, None).get
    assert(resolved.filePaths == files1.map(_.path))
    assert(resolved.files.map(_.records) == Seq(1L, 2L, 3L, 4L, 5L))
    // appends accumulate THROUGH the manifest-backed predecessor
    val s2 = SnapshotLog.commit(fs, dir, "append", Seq(DataFile("data/b")), 1,
      200L, manifestThreshold = 3)
    assert(s2.filePaths == files1.map(_.path) :+ "data/b")
    assert(s2.recordCount == 16)
    // time travel to the first snapshot still hydrates it
    assert(SnapshotLog.resolve(fs, dir, Some(150L)).get.filePaths.size == 5)
    // small lists stay inline (threshold respected)
    val s3 = SnapshotLog.commit(fs, dir, "replace", Seq(DataFile("data/c")), 1,
      300L, replaceAll = true, manifestThreshold = 3)
    assert(s3.manifest.isEmpty)
  }

  test("summary round-trips through the JSON log") {
    val dir = new HPath(Files.createTempDirectory("graft-prop3").toUri)
    val fs = FileSystem.get(dir.toUri, conf)
    SnapshotLog.commit(fs, dir, "append", Seq(DataFile("data/a")), 5, 100L,
      summary = Map("added-files" -> "1", "added-records" -> "5"))
    val read = SnapshotLog.read(fs, dir).head
    assert(read.summary == Map("added-files" -> "1", "added-records" -> "5"))
  }
}
