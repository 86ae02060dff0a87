package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** File-granular copy-on-write + partition pruning: the two scale
  * behaviors that distinguish "correct at 60k rows" from "viable at
  * 100 TB". A single-key DELETE must rewrite ONE file; a day-scoped read
  * of a partitioned table must scan only that day's files.
  */
class CowAndPartitionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def newStore(): TableStore =
    new TableStore(new HPath(Files.createTempDirectory("graft-cow").toUri), spark)

  test("single-key DELETE rewrites only the file containing the key") {
    val st = newStore()
    val schema = Seq((1, "x")).toDF("id", "v").schema
    st.create("t", schema)
    // three appends = at least 3 files with disjoint, footer-visible id ranges
    st.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1), 1000L)
    st.append("t", Seq((10, "c"), (11, "d")).toDF("id", "v").coalesce(1), 2000L)
    st.append("t", Seq((20, "e"), (21, "f")).toDF("id", "v").coalesce(1), 3000L)
    val before = st.dataFilesAsOf("t", None)
    assert(before.size == 3)

    val snap = st.deleteWhere("t", col("id") === 10, 4000L)
    val after = snap.files
    // the two untouched files are carried BY REFERENCE (same names)
    val beforeNames = before.map(_.path).toSet
    val carried = after.map(_.path).filter(beforeNames.contains)
    assert(carried.size == 2, s"expected 2 carried files, got $after")
    // the file that held id=10 is gone, replaced by a rewritten file
    assert(snap.summary("rewritten-files") == "1")
    assert(snap.summary("carried-files") == "2")
    // rows are correct and the snapshot count is footer-accurate
    assert(st.read("t").orderBy("id").select("id").as[Int].collect().toSeq ==
      Seq(1, 2, 11, 20, 21))
    assert(snap.recordCount == 5)
    // time travel still sees the pre-delete rows
    assert(st.read("t", Some(3500L)).count() == 6)
  }

  test("write.distribution-mode=hash: one file per partition per append") {
    val st = newStore()
    val data = (1 to 400).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    st.create("wd", data.schema, Some(PartitionSpec("grp", "identity")))
    // default (none): an 8-task frame writes its slice of every
    // partition it holds — more files than partitions
    st.append("wd", data.repartition(8), 1000L)
    val defaultFiles = st.dataFilesAsOf("wd", None).size
    assert(defaultFiles > 4, s"expected >4 files, got $defaultFiles")
    st.setTableProperties("wd",
      Map(TableStore.DistributionModeProp -> "hash"))
    st.append("wd", data.repartition(8), 2000L)
    val added = st.dataFilesAsOf("wd", None).size - defaultFiles
    assert(added == 4, s"hash mode: expected 4 new files, got $added")
    // rows and partition routing stay correct either way
    assert(st.read("wd").count() == 800)
    assert(st.read("wd").filter(col("grp") === "g1").count() == 200)
    val parts = st.dataFilesAsOf("wd", None)
      .flatMap(_.partition.get("grp")).toSet
    assert(parts == Set("g0", "g1", "g2", "g3"))
  }

  test("DELETE matching nothing carries every file and rewrites none") {
    val st = newStore()
    st.create("t", Seq((1, "x")).toDF("id", "v").schema)
    st.append("t", Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1), 1000L)
    val before = st.dataFilesAsOf("t", None).map(_.path).toSet
    val snap = st.deleteWhere("t", col("id") === 999, 2000L)
    assert(snap.files.map(_.path).toSet == before)
    assert(snap.summary("rewritten-files") == "0")
    assert(st.read("t").count() == 2)
  }

  test("UPDATE rewrites only matched files; SET sees the pre-image") {
    val st = newStore()
    st.create("acc", Seq((1, 0.0, "s")).toDF("id", "balance", "status").schema)
    st.append("acc", Seq((1, 100.0, "open"), (2, 50.0, "open"))
      .toDF("id", "balance", "status").coalesce(1), 1000L)
    st.append("acc", Seq((3, 0.0, "open"), (4, 75.0, "open"))
      .toDF("id", "balance", "status").coalesce(1), 2000L)
    val before = st.dataFilesAsOf("acc", None)
    val snap = st.updateWhere("acc",
      Seq("balance" -> (col("balance") + 10), "status" -> lit("bonus")),
      Some(col("balance") >= 100), 3000L)
    // only the first file contains balance >= 100
    val beforeNames = before.map(_.path).toSet
    assert(snap.files.map(_.path).count(beforeNames.contains) == 1)
    assert(snap.summary("rewritten-files") == "1")
    val rows = st.read("acc").orderBy("id")
      .select("id", "balance", "status").as[(Int, Double, String)].collect().toSeq
    assert(rows == Seq((1, 110.0, "bonus"), (2, 50.0, "open"),
      (3, 0.0, "open"), (4, 75.0, "open")))
  }

  test("upsert rewrites only files containing matched keys") {
    val st = newStore()
    st.create("u", Seq((1, "x")).toDF("id", "v").schema)
    st.append("u", Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1), 1000L)
    st.append("u", Seq((50, "c"), (51, "d")).toDF("id", "v").coalesce(1), 2000L)
    val before = st.dataFilesAsOf("u", None).map(_.path).toSet
    val snap = st.upsert("u",
      Seq((2, "B"), (60, "new")).toDF("id", "v"), Seq("id"), 3000L)
    // file with ids 50/51 is outside the update key range [2,60]? No —
    // range pred is id in [2,60], so footer prune keeps it, but the exact
    // semi-join probe finds no matching key → carried by reference.
    assert(snap.files.map(_.path).count(before.contains) == 1)
    val rows = st.read("u").orderBy("id").as[(Int, String)].collect().toSeq
    assert(rows == Seq((1, "a"), (2, "B"), (50, "c"), (51, "d"), (60, "new")))
    assert(snap.recordCount == 5)
  }

  test("partitioned writes record values; reads prune by predicate") {
    val st = newStore()
    val data = Seq(
      (1, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 5.0),
      (2, java.sql.Timestamp.valueOf("2024-01-20 11:00:00"), 6.0),
      (3, java.sql.Timestamp.valueOf("2024-02-03 12:00:00"), 7.0),
      (4, java.sql.Timestamp.valueOf("2024-03-15 13:00:00"), 8.0))
      .toDF("id", "ts", "value")
    st.create("ev", data.schema, Some(PartitionSpec("ts", "month")))
    st.append("ev", data, 1000L)
    val files = st.dataFilesAsOf("ev", None)
    // one partition value per month; every file carries its value
    assert(files.flatMap(_.partition.get("ts")).toSet ==
      Set("2024-01", "2024-02", "2024-03"))

    val pred = col("ts") >= lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")) &&
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    val pruned = st.prunedFiles("ev", pred)
    assert(pruned.flatMap(_.partition.get("ts")).toSet == Set("2024-02"))
    assert(pruned.size < files.size)
    // the pruned read still returns exactly the right rows
    assert(st.readWhere("ev", pred).select("id").as[Int].collect().toSeq == Seq(3))
    // unpartitionable predicate keeps everything (conservative)
    assert(st.prunedFiles("ev", col("value") > 0).size == files.size)
  }

  test("partitioned delete prunes candidate files by partition value") {
    val st = newStore()
    val data = Seq(
      (1, java.sql.Date.valueOf("2024-01-05")),
      (2, java.sql.Date.valueOf("2024-02-03")),
      (3, java.sql.Date.valueOf("2024-03-15")))
      .toDF("id", "d")
    st.create("pd", data.schema, Some(PartitionSpec("d", "month")))
    st.append("pd", data, 1000L)
    val before = st.dataFilesAsOf("pd", None)
    val feb = before.filter(_.partition.get("d").contains("2024-02")).map(_.path)
    val snap = st.deleteWhere("pd",
      col("d") === lit(java.sql.Date.valueOf("2024-02-03")), 2000L)
    // only the Feb file was rewritten; Jan + Mar carried by reference
    assert(snap.summary("rewritten-files") == "1")
    assert(!snap.files.map(_.path).exists(feb.contains))
    assert((before.map(_.path).toSet -- feb).subsetOf(snap.files.map(_.path).toSet))
    assert(st.read("pd").select("id").as[Int].collect().toSet == Set(1, 3))
  }

  test("sorted tables cluster writes: disjoint bounds, one-file deletes") {
    val st = newStore()
    val data = (1 to 400).map(i => (i, s"v$i")).toDF("id", "v")
    st.create("srt", data.schema, sortBy = Seq("id"))
    // at production scale AQE right-sizes the range shuffle's partitions
    // (coalesced ranges stay disjoint); at 400 rows it would coalesce to
    // ONE file, so pin it off to observe the multi-file invariant
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(coalesceKey)
    val files =
      try {
        spark.conf.set(coalesceKey, "false")
        st.append("srt", data.repartition(4), 1000L)
        st.dataFilesAsOf("srt", None)
      } finally spark.conf.set(coalesceKey, prior)
    assert(files.size > 1)
    // range clustering: per-file id bounds are pairwise DISJOINT
    val bounds = files.map { f =>
      val b = f.stats("id")
      (b.min.get.toLong, b.max.get.toLong)
    }.sortBy(_._1)
    assert(bounds.sliding(2).forall {
      case Seq((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, s"overlapping bounds: $bounds")
    // a single-key delete therefore rewrites exactly one file
    val snap = st.deleteWhere("srt", col("id") === 17, 2000L)
    assert(snap.summary("rewritten-files") == "1")
    assert(st.read("srt").count() == 399)
  }

  test("COW commits are optimistic: stale bases conflict, ops retry") {
    val st = newStore()
    st.create("oc", Seq((1, "x")).toDF("id", "v").schema)
    st.append("oc", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), 1000L)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    // commit-level guard: a commit computed against snapshot 0 must not
    // silently replace snapshot 1's contents
    intercept[SnapshotLog.CommitConflictException] {
      SnapshotLog.commit(fs, st.tableDir("oc"), "delete", Seq.empty, 0L,
        2000L, replaceAll = true, expectedLastId = Some(0L))
    }
    // two concurrent single-key deletes: whichever loses the race retries
    // against the new base — NEITHER delete is lost
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { st.deleteWhere("oc", col("id") === 1, 3000L); () }
      })
      val f2 = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { st.deleteWhere("oc", col("id") === 2, 3001L); () }
      })
      f1.get(60, java.util.concurrent.TimeUnit.SECONDS)
      f2.get(60, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdownNow()
    assert(st.read("oc").select("id").as[Int].collect().toSeq == Seq(3))
  }

  test("logged column stats prune unpartitioned tables with zero I/O") {
    val st = newStore()
    st.create("cs", Seq((1, "x")).toDF("id", "v").schema)
    st.append("cs", Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1), 1000L)
    st.append("cs", Seq((50, "c"), (51, "d")).toDF("id", "v").coalesce(1), 2000L)
    val files = st.dataFilesAsOf("cs", None)
    // promote captured bounds into the log
    assert(files.forall(_.stats.get("id").exists(b =>
      b.t == "long" && b.min.isDefined && b.max.isDefined)))
    // prune by the logged bounds — no partition spec involved
    val pruned = st.prunedFiles("cs", col("id") === 50)
    assert(pruned.size == 1)
    assert(pruned.head.stats("id").min.contains("50"))
    // string bounds prune too
    assert(st.prunedFiles("cs", col("v") === "zzz").isEmpty)
    assert(st.prunedFiles("cs", col("v") === "a").size == 1)
  }

  test("expire and vacuum respect manifest-backed snapshots") {
    val st = newStore()
    st.create("mf", Seq((1, "x")).toDF("id", "v").schema)
    st.append("mf", Seq((1, "a")).toDF("id", "v").coalesce(1), 1000L)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val dir = st.tableDir("mf")
    val dataFiles = st.dataFilesAsOf("mf", None)
    // force a manifest-backed second snapshot over the same data
    SnapshotLog.commit(fs, dir, "replace", dataFiles, 1, 2000L,
      replaceAll = true, manifestThreshold = 0)
    val manifestDir = new HPath(dir, SnapshotLog.ManifestDir)
    assert(fs.listStatus(manifestDir).length == 1)
    // vacuum must NOT treat the manifest-referenced data file as orphan
    st.vacuum("mf", olderThanMs = System.currentTimeMillis() + 60000)
    assert(st.read("mf").count() == 1)
    // expire the inline snapshot 1; manifest-backed snapshot 2 survives
    st.expire("mf", olderThanMs = 1500L)
    assert(st.read("mf").count() == 1)
    assert(fs.listStatus(manifestDir).length == 1)
    assert(st.history("mf").count() == 1)
  }

  test("partition-spec evolution: identity→month, mixed files prune per their own values") {
    val st = newStore()
    def day(s: String) = java.sql.Date.valueOf(s)
    val schema = Seq((day("2024-01-01"), 1)).toDF("d", "value").schema
    st.create("pe", schema, Some(PartitionSpec("d", "identity")))
    // old regime: one file per DAY (identity values)
    st.append("pe", Seq((day("2024-02-14"), 1)).toDF("d", "value"), 1000L)
    st.append("pe", Seq((day("2024-02-15"), 2)).toDF("d", "value"), 2000L)
    st.setPartitionSpec("pe", PartitionSpec("d", "month"))
    // new regime: one file per MONTH
    st.append("pe", Seq((day("2024-03-10"), 3), (day("2024-03-20"), 4))
      .toDF("d", "value"), 3000L)
    val files = st.dataFilesAsOf("pe", None)
    assert(files.flatMap(_.partition.get("d")).toSet ==
      Set("2024-02-14", "2024-02-15", "2024-03"))

    // day-scoped predicate: the matching OLD file alone (identity value
    // prunes exactly; the March month-file's range excludes February)
    val febPruned = st.prunedFiles("pe", col("d") === lit(day("2024-02-14")))
    assert(febPruned.flatMap(_.partition.get("d")).toSet == Set("2024-02-14"))
    // March predicate: the NEW files alone — old identity values parse
    // under their own format and fall outside the range
    val marPruned = st.prunedFiles("pe", col("d") >= lit(day("2024-03-01")))
    assert(marPruned.flatMap(_.partition.get("d")).toSet == Set("2024-03"))
    // results stay correct across the mixed population
    assert(st.readWhere("pe", col("d") >= lit(day("2024-03-01")))
      .agg(sum(col("value"))).head().getLong(0) == 7L)
    assert(st.readWhere("pe", col("d") === lit(day("2024-02-14"))).count() == 1)
  }

  test("partition-spec evolution preserves the pinned zone and validates the column") {
    val st = newStore()
    val data = Seq((1, java.sql.Timestamp.valueOf("2024-01-05 10:00:00")))
      .toDF("id", "ts")
    st.create("pz", data.schema, Some(PartitionSpec("ts", "day")))
    st.append("pz", data, 1000L)
    intercept[IllegalArgumentException](
      st.setPartitionSpec("pz", PartitionSpec("nope", "month")))
    st.setPartitionSpec("pz", PartitionSpec("ts", "month"))
    val key = "spark.sql.session.timeZone"
    val prior = spark.conf.get(key)
    try {
      // the CREATE-time zone pin must survive the evolution: a write in a
      // different session zone still fails instead of mixing wall clocks
      spark.conf.set(key, "Asia/Tokyo")
      val e = intercept[IllegalArgumentException](st.append("pz", data, 2000L))
      assert(e.getMessage.contains("pinned partition zone"))
    } finally spark.conf.set(key, prior)
    // in the pinned zone, new writes record month values
    st.append("pz", data, 3000L)
    assert(st.dataFilesAsOf("pz", None).flatMap(_.partition.get("ts")).toSet ==
      Set("2024-01-05", "2024-01"))
  }

  test("timestamp partition zone is pinned: mismatched writes fail, reads skip pruning") {
    val st = newStore()
    val data = Seq((1, java.sql.Timestamp.valueOf("2024-01-05 10:00:00")))
      .toDF("id", "ts")
    st.create("tz", data.schema, Some(PartitionSpec("ts", "day")))
    st.append("tz", data, 1000L)
    val key = "spark.sql.session.timeZone"
    val prior = spark.conf.get(key)
    try {
      spark.conf.set(key, "Asia/Tokyo") // table was created under UTC
      // writes in the wrong zone would record wrong wall-clock values: fail
      val e = intercept[IllegalArgumentException](st.append("tz", data, 2000L))
      assert(e.getMessage.contains("pinned partition zone"))
      val pred = col("ts") >= lit(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
      // column stats are zone-FREE (stored as instant micros): they may
      // still prune soundly under the mismatched zone
      assert(st.prunedFiles("tz", pred).isEmpty)
      // but the zone-SENSITIVE partition dimension must be skipped: strip
      // the stats (legacy/capped entries) and the wall-clock partition
      // value alone must not prune under the wrong zone
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        new org.apache.hadoop.conf.Configuration())
      val dir = st.tableDir("tz")
      val stripped = SnapshotLog.read(fs, dir).map(s =>
        s.copy(files = s.files.map(_.copy(stats = Map.empty))))
      SnapshotLog.write(fs, dir, stripped)
      assert(st.prunedFiles("tz", pred).size ==
        st.dataFilesAsOf("tz", None).size)
    } finally spark.conf.set(key, prior)
    // back in the pinned zone: partition-value pruning active again
    assert(st.prunedFiles("tz",
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))).isEmpty)
  }

  test("vacuum removes stale staging dirs and orphan files, nothing live") {
    val st = newStore()
    st.create("vc", Seq((1, "x")).toDF("id", "v").schema)
    st.append("vc", Seq((1, "a")).toDF("id", "v"), 1000L)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val dir = st.tableDir("vc")
    // plant debris: a dead staging dir + an orphan data file
    val stale = new HPath(dir, "stage-deadbeef")
    fs.mkdirs(stale)
    val orphan = new HPath(new HPath(dir, "data"), "orphan-file.parquet")
    fs.create(orphan, true).close()
    // grace window: young debris survives
    st.vacuum("vc", olderThanMs = System.currentTimeMillis() - 60000)
    assert(fs.exists(stale) && fs.exists(orphan))
    // past the window: debris goes, committed data stays
    st.vacuum("vc", olderThanMs = System.currentTimeMillis() + 60000)
    assert(!fs.exists(stale) && !fs.exists(orphan))
    assert(st.read("vc").count() == 1)
    // time travel to the committed snapshot still works
    assert(st.read("vc", Some(1500L)).count() == 1)
  }

  test("hour partition transform prunes to the hour's files from the partition value alone") {
    val st = newStore()
    val data = Seq(
      (1, java.sql.Timestamp.valueOf("2024-03-09 10:15:00")),
      (2, java.sql.Timestamp.valueOf("2024-03-09 11:05:00")),
      (3, java.sql.Timestamp.valueOf("2024-03-09 12:45:00"))).toDF("id", "ts")
    st.create("hp", data.schema, Some(PartitionSpec("ts", "hour")))
    st.append("hp", data, 1000L)
    val files = st.dataFilesAsOf("hp", None)
    assert(files.flatMap(_.partition.get("ts")).toSet ==
      Set("2024-03-09-10", "2024-03-09-11", "2024-03-09-12"))
    val pred =
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-09 11:00:00")) &&
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-09 12:00:00"))
    // strip footer stats so only the hour partition value can prune
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val dir = st.tableDir("hp")
    SnapshotLog.write(fs, dir, SnapshotLog.read(fs, dir).map(s =>
      s.copy(files = s.files.map(_.copy(stats = Map.empty)))))
    val kept = st.prunedFiles("hp", pred)
    assert(kept.size == 1 &&
      kept.head.partition.get("ts").contains("2024-03-09-11"))
    assert(st.readWhere("hp", pred).select("id").as[Int].collect().toSeq ==
      Seq(2))
    // hour needs a timestamp: a DATE column is rejected at create
    intercept[IllegalArgumentException](st.create("hd",
      Seq((1, java.sql.Date.valueOf("2024-01-01"))).toDF("id", "d").schema,
      Some(PartitionSpec("d", "hour"))))
  }

  test("null partition values land in the null partition and stay readable") {
    val st = newStore()
    val data = Seq((1, Option("ASIA")), (2, None), (3, Option("EUROPE")))
      .toDF("id", "region")
    st.create("np", data.schema, Some(PartitionSpec("region", "identity")))
    st.append("np", data, 1000L)
    val files = st.dataFilesAsOf("np", None)
    assert(files.flatMap(_.partition.get("region")).toSet ==
      Set("ASIA", "EUROPE", PartitionSpec.NullPartition))
    // IS NULL keeps only the null partition; equality drops it
    assert(st.readWhere("np", col("region").isNull)
      .select("id").as[Int].collect().toSeq == Seq(2))
    val asia = st.prunedFiles("np", col("region") === "ASIA")
    assert(asia.flatMap(_.partition.get("region")).toSet == Set("ASIA"))
    assert(st.read("np").count() == 3)
  }
}
