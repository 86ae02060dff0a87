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

  test("PROPERTY: checkpoint + expire preserve time travel inside retention") {
    val genCut = Gen.choose(0L, 7000L)
    val prop = Prop.forAll(genBatchSizes, genCut, genProbe) { (sizes, cut, probe) =>
      // keep the java path around: HPath built from a directory URI keeps
      // the trailing slash, so HPath.getName would be "" below
      val jdir = Files.createTempDirectory("graft-ckpt")
      val dir = new HPath(jdir.toUri)
      val fs = FileSystem.get(dir.toUri, conf)
      sizes.zipWithIndex.foreach { case (size, i) =>
        SnapshotLog.commit(fs, dir, "append",
          newFiles = (0 until size).map(j => DataFile(s"data/b$i-f$j")),
          recordCount = size.toLong, timestampMs = 1000L * (i + 1))
      }
      // ground truth BEFORE any maintenance, at every snapshot boundary
      val before = SnapshotLog.read(fs, dir).map(s =>
        s.id -> SnapshotLog.resolveVersion(fs, dir, s.id).get.filePaths).toMap
      val logBytes = fs.getFileStatus(SnapshotLog.logPath(dir)).getLen
      // checkpoint: pure metadata reshaping — every snapshot must still
      // resolve to the same file list, and the log must not grow
      SnapshotLog.checkpoint(fs, dir, cut)
      val afterCkpt = before.forall { case (id, paths) =>
        SnapshotLog.resolveVersion(fs, dir, id).get.filePaths == paths
      }
      val logAfter = fs.getFileStatus(SnapshotLog.logPath(dir)).getLen
      // idempotent: a second checkpoint folds nothing
      val second = SnapshotLog.checkpoint(fs, dir, cut)
      // time travel at an arbitrary instant matches the original history
      val expected = sizes.zipWithIndex
        .filter { case (_, i) => 1000L * (i + 1) <= probe }
        .flatMap { case (size, i) => (0 until size).map(j => s"data/b$i-f$j") }
      val travel = SnapshotLog.resolve(fs, dir, Some(probe))
        .map(_.filePaths).getOrElse(Seq.empty)
      // compose with expire: expire(cut) retains snapshots committed at
      // or after cut (plus the latest), so AS OF probe is preserved
      // exactly when the snapshot SERVING probe — newest commit <= probe
      // — is retained. A probe inside the window can still be served by
      // a pre-cut snapshot; that resolution is legitimately lost.
      val store = new TableStore(new HPath(jdir.getParent.toUri),
        graft.SharedSpark.spark)
      store.expire(jdir.getFileName.toString, cut)
      val servingT = sizes.indices.map(i => 1000L * (i + 1))
        .filter(_ <= probe).lastOption
      val travelKept = servingT match {
        case Some(t) if t >= cut || t == 1000L * sizes.size =>
          SnapshotLog.resolve(fs, dir, Some(probe))
            .map(_.filePaths).getOrElse(Seq.empty) == expected
        case _ => true // no serving snapshot, or it expired with cause
      }
      afterCkpt && logAfter <= logBytes && second == 0 && travel == expected &&
        travelKept
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }

  test("checkpointed log: commits after the fold stay cheap and correct") {
    val dir = new HPath(Files.createTempDirectory("graft-ckpt2").toUri)
    val fs = FileSystem.get(dir.toUri, conf)
    for (i <- 0 until 20)
      SnapshotLog.commit(fs, dir, "append", Seq(DataFile(s"data/f$i")),
        1L, 1000L * (i + 1))
    val full = fs.getFileStatus(SnapshotLog.logPath(dir)).getLen
    // fold everything but the latest: 19 entries become references
    assert(SnapshotLog.checkpoint(fs, dir, Long.MaxValue) == 19)
    val folded = fs.getFileStatus(SnapshotLog.logPath(dir)).getLen
    // O(snapshots × files) inline lists -> O(snapshots) references
    assert(folded < full / 2, s"log $full -> $folded bytes")
    // the latest entry stayed inline (hot read path pays no manifest I/O)
    assert(SnapshotLog.read(fs, dir).last.manifest.isEmpty)
    // a commit on the folded log carries the full file set forward
    val s = SnapshotLog.commit(fs, dir, "append", Seq(DataFile("data/new")),
      1L, 30000L)
    assert(s.fileCount == 21)
    assert(SnapshotLog.resolve(fs, dir, None).get.filePaths.contains("data/f3"))
  }

  test("PROPERTY: auto-checkpoint keeps superseded inline entries bounded with no CALL") {
    val thresh = 12
    val prop = Prop.forAll(genBatchSizes, genProbe) { (sizes, probe) =>
      val dir = new HPath(Files.createTempDirectory("graft-autockpt").toUri)
      val fs = FileSystem.get(dir.toUri, conf)
      sizes.zipWithIndex.foreach { case (size, i) =>
        SnapshotLog.commit(fs, dir, "append",
          newFiles = (0 until size).map(j => DataFile(s"data/b$i-f$j")),
          recordCount = size.toLong, timestampMs = 1000L * (i + 1),
          autoCheckpointThreshold = thresh)
      }
      val all = SnapshotLog.read(fs, dir)
      // the commit path itself enforces the bound: after ANY commit, the
      // non-latest snapshots carry at most `thresh` inline file entries
      // (beyond it they were folded into manifests in the same write)
      val oldInline = all.dropRight(1)
        .collect { case s if s.manifest.isEmpty => s.files.size }.sum
      // the latest snapshot is never folded by the auto path (it may
      // still be manifest-backed via commit's own size spill at
      // DefaultManifestThreshold — that spill is not a fold)
      val latestInline = all.last.manifest.isEmpty ||
        all.last.fileCount > SnapshotLog.DefaultManifestThreshold
      // and the fold is pure metadata reshaping: every version still
      // resolves to exactly its append prefix, time travel intact
      val versionsIntact = all.forall { s =>
        val i = (s.id - 1).toInt
        SnapshotLog.resolveVersion(fs, dir, s.id).get.filePaths ==
          sizes.take(i + 1).zipWithIndex
            .flatMap { case (sz, b) => (0 until sz).map(j => s"data/b$b-f$j") }
      }
      val expected = sizes.zipWithIndex
        .filter { case (_, i) => 1000L * (i + 1) <= probe }
        .flatMap { case (size, i) => (0 until size).map(j => s"data/b$i-f$j") }
      val travel = SnapshotLog.resolve(fs, dir, Some(probe))
        .map(_.filePaths).getOrElse(Seq.empty)
      oldInline <= thresh && latestInline && versionsIntact && travel == expected
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
