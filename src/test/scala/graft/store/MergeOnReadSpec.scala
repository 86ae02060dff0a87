package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Merge-on-read position deletes (Iceberg v2's `write.delete.mode` /
  * `write.update.mode` = merge-on-read): DELETE/UPDATE commit small
  * position-delete files instead of rewriting data files; reads subtract
  * the positions; OPTIMIZE materializes them away. Reference analogue:
  * the snapshot semantics of `/root/reference/append_iceberg.py:182-215`,
  * extended with the v2 write modes the reference's Iceberg tables expose.
  */
class MergeOnReadSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def newStore(): TableStore =
    new TableStore(new HPath(Files.createTempDirectory("graft-mor").toUri), spark)

  private def morTable(st: TableStore, rows: Range = 1 to 100): Unit = {
    val df = rows.map(i => (i.toLong, s"name-$i", i % 10)).toDF("id", "name", "grp")
    st.create("t", df.schema)
    st.setTableProperties("t", Map(
      TableStore.DeleteModeProp -> TableStore.MergeOnRead,
      TableStore.UpdateModeProp -> TableStore.MergeOnRead))
    st.append("t", df, 1000L)
  }

  test("MOR delete: rows gone, data files untouched, delete file written") {
    val st = newStore()
    morTable(st)
    val filesBefore = st.dataFilesAsOf("t", None).map(_.path).toSet
    val snap = st.deleteWhere("t", col("id") <= 20, 2000L)
    assert(snap.operation == "delete")
    assert(snap.summary("merge-on-read") == "true")
    assert(snap.summary("position-deletes") == "20")
    // the data-file PATH set is unchanged — no rewrite happened
    assert(st.dataFilesAsOf("t", None).map(_.path).toSet == filesBefore)
    // every surviving entry that lost rows carries a delete ref
    assert(st.dataFilesAsOf("t", None).exists(_.deletes.nonEmpty))
    assert(st.read("t").count() == 80)
    assert(st.read("t").agg(min("id")).head().getLong(0) == 21L)
    // live record count maintained in metadata (no scan)
    assert(st.recordCountAsOf("t", None).contains(80L))
    // time travel to the pre-delete snapshot still sees all rows
    assert(st.read("t", Some(1000L)).count() == 100)
  }

  test("MOR delete honors SQL NULL-predicate semantics (NULL keeps the row)") {
    val st = newStore()
    val df = Seq((1L, java.lang.Long.valueOf(0L)), (2L, null: java.lang.Long),
      (3L, java.lang.Long.valueOf(5L))).toDF("id", "balance")
    st.create("t", df.schema)
    st.setTableProperties("t",
      Map(TableStore.DeleteModeProp -> TableStore.MergeOnRead))
    st.append("t", df, 1000L)
    st.deleteWhere("t", col("balance") === 0L, 2000L)
    assert(st.read("t").select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
  }

  test("second MOR delete stacks refs; positions never delete twice") {
    val st = newStore()
    morTable(st)
    st.deleteWhere("t", col("id") <= 20, 2000L)
    val s2 = st.deleteWhere("t", col("id") <= 40, 3000L)
    // second commit deletes only the 20 still-live rows in range
    assert(s2.summary("position-deletes") == "20")
    assert(st.read("t").count() == 60)
    assert(st.recordCountAsOf("t", None).contains(60L))
    // time travel between the two deletes
    assert(st.read("t", Some(2000L)).count() == 80)
  }

  test("file whose rows are all deleted drops out of the snapshot") {
    val st = newStore()
    morTable(st)
    val snap = st.deleteWhere("t", lit(true), 2000L)
    assert(snap.recordCount == 0)
    assert(st.dataFilesAsOf("t", None).isEmpty)
    assert(st.read("t").count() == 0)
    assert(st.read("t", Some(1000L)).count() == 100) // history intact
  }

  test("MOR update: delete+insert decomposition, row count unchanged") {
    val st = newStore()
    morTable(st)
    val filesBefore = st.dataFilesAsOf("t", None).map(_.path).toSet
    val snap = st.updateWhere("t",
      Seq("name" -> lit("updated")), Some(col("id") <= 10), 2000L)
    assert(snap.operation == "update")
    assert(snap.summary("merge-on-read") == "true")
    assert(st.read("t").count() == 100)
    assert(st.read("t").filter(col("name") === "updated").count() == 10)
    // original files all still referenced (dirty), plus the appended
    // post-image files
    val after = st.dataFilesAsOf("t", None).map(_.path).toSet
    assert(filesBefore.subsetOf(after) && after.size > filesBefore.size)
    // pre-update images visible via time travel
    assert(st.read("t", Some(1000L))
      .filter(col("name") === "updated").count() == 0)
  }

  test("MOR update evaluates SET against the PRE-update row") {
    val st = newStore()
    morTable(st, 1 to 10)
    st.updateWhere("t", Seq("id" -> (col("id") + 100L)),
      Some(col("id") <= 5), 2000L)
    assert(st.read("t").select("id").as[Long].collect().sorted.toSeq ==
      Seq(6L, 7L, 8L, 9L, 10L, 101L, 102L, 103L, 104L, 105L))
  }

  test("COW rewrite after MOR delete does not resurrect deleted rows") {
    val st = newStore()
    morTable(st)
    st.deleteWhere("t", col("id") <= 20, 2000L)
    // a COPY-ON-WRITE update (mode off for update) rewrites matched files
    st.setTableProperties("t",
      Map(TableStore.UpdateModeProp -> "copy-on-write"))
    st.updateWhere("t", Seq("name" -> lit("x")), Some(col("id") <= 50), 3000L)
    assert(st.read("t").count() == 80)
    assert(st.read("t").agg(min("id")).head().getLong(0) == 21L)
    assert(st.read("t").filter(col("name") === "x").count() == 30)
    // the rewritten files are clean again
    assert(st.read("t").filter(col("id") <= 50).count() == 30)
  }

  test("OPTIMIZE materializes position deletes into clean files") {
    val st = newStore()
    morTable(st)
    st.deleteWhere("t", col("id") % 2 === 0, 2000L)
    assert(st.read("t").count() == 50)
    val snap = st.compact("t")
    assert(snap.summary(TableStore.RowsPreservedKey) == "true")
    assert(st.dataFilesAsOf("t", None).forall(_.deletes.isEmpty))
    assert(st.read("t").count() == 50)
    assert(st.read("t").filter(col("id") % 2 === 0).count() == 0)
  }

  test("expire + vacuum reclaim delete files once no snapshot needs them") {
    val st = newStore()
    morTable(st)
    st.deleteWhere("t", col("id") <= 20, 2000L)
    st.compact("t") // refs gone from the CURRENT snapshot
    val dir = new HPath(st.root, "t/" + TableStore.DeletesDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(dir) && fs.listStatus(dir).nonEmpty)
    // the delete-commit snapshot still references the delete file: a
    // vacuum now must NOT reclaim it
    st.vacuum("t", System.currentTimeMillis() + 100000L)
    assert(fs.listStatus(dir).nonEmpty)
    assert(st.read("t", Some(2500L)).count() == 80) // history still right
    // expire everything but the latest → refs die → vacuum reclaims
    st.expire("t", System.currentTimeMillis() + 100000L)
    st.vacuum("t", System.currentTimeMillis() + 100000L)
    assert(!fs.exists(dir) || fs.listStatus(dir).isEmpty)
    assert(st.read("t").count() == 80)
  }

  test("change feed: MOR commits diff exactly without stored files") {
    val st = newStore()
    morTable(st)
    st.deleteWhere("t", col("id") <= 3, 2000L)
    st.updateWhere("t", Seq("name" -> lit("u")), Some(col("id") === 10L), 3000L)
    val ch = st.readChanges("t", 1L)
      .select("id", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, Long)].collect().toSet
    assert(ch == Set(
      (1L, "delete", 2L), (2L, "delete", 2L), (3L, "delete", 2L),
      (10L, "delete", 3L), (10L, "insert", 3L)))
  }

  test("change feed: stored change files serve MOR commits when enabled") {
    val st = newStore()
    morTable(st)
    st.setChangeFeed("t", enabled = true)
    val snap = st.deleteWhere("t", col("id") <= 3, 2000L)
    assert(snap.summary.contains(TableStore.CdcDirKey))
    val ch = st.readChanges("t", 1L)
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(ch == Set((1L, "delete"), (2L, "delete"), (3L, "delete")))
  }

  test("streaming change plan raises on an unstored MOR commit") {
    val st = newStore()
    morTable(st)
    val s = st.deleteWhere("t", col("id") <= 3, 2000L)
    val e = intercept[IllegalStateException] {
      st.changeFilePlan("t", 1L, s.id)
    }
    assert(e.getMessage.contains("ENABLE CHANGE FEED"))
  }

  test("incremental append read raises across a MOR delete") {
    val st = newStore()
    morTable(st)
    val s = st.deleteWhere("t", col("id") <= 3, 2000L)
    val e = intercept[IllegalArgumentException] {
      st.readIncremental("t", 1L, Some(s.id)).count()
    }
    assert(e.getMessage.contains("non-append"))
  }

  test("metadata COUNT stays exact over dirty files; MIN/MAX declines") {
    val st = newStore()
    morTable(st)
    st.deleteWhere("t", col("id") <= 20, 2000L)
    // records on every entry is the LIVE count
    assert(st.dataFilesAsOf("t", None).map(_.records).sum == 80L)
    // a scan MIN agrees with the (declined-to-scan) engine answer
    assert(st.read("t").agg(min("id")).head().getLong(0) == 21L)
  }

  test("predicate pruning still sound on dirty files (bounds conservative)") {
    val st = newStore()
    morTable(st)
    st.deleteWhere("t", col("id") <= 20, 2000L)
    // stats say the file spans 1..100; querying the deleted range
    // returns nothing but must not error or mis-prune the live range
    assert(st.readWhere("t", col("id") <= 20).count() == 0)
    assert(st.readWhere("t", col("id") > 90).count() == 10)
  }

  test("MOR survives schema evolution: rename then delete then read") {
    val st = newStore()
    morTable(st)
    st.renameColumn("t", "name", "label")
    st.deleteWhere("t", col("id") <= 10, 2000L)
    val out = st.read("t")
    assert(out.schema.fieldNames.contains("label"))
    assert(out.count() == 90)
    assert(out.filter(col("label").startsWith("name-")).count() == 90)
  }

  test("rewrite_position_delete_files consolidates stacked refs without " +
      "touching data files") {
    val st = newStore()
    val df = (1 to 100).map(i => (i.toLong, s"name-$i", i % 10))
      .toDF("id", "name", "grp").coalesce(1) // ONE data file → refs stack
    st.create("t", df.schema)
    st.setTableProperties("t", Map(
      TableStore.DeleteModeProp -> TableStore.MergeOnRead,
      TableStore.UpdateModeProp -> TableStore.MergeOnRead))
    st.append("t", df, 1000L)
    // three stacked MOR deletes → the one dirty file carries 3 refs
    st.deleteWhere("t", col("id") <= 10, 2000L)
    st.deleteWhere("t", col("id").between(11, 20), 3000L)
    st.deleteWhere("t", col("id").between(21, 30), 4000L)
    val before = st.dataFilesAsOf("t", None)
    val dirtyBefore = before.filter(_.deletes.nonEmpty)
    assert(dirtyBefore.exists(_.deletes.size == 3))
    val rowsBefore = st.read("t").orderBy("id").collect().toSeq
    val snap = st.rewritePositionDeleteFiles("t", 5000L)
    assert(snap.summary("rewritten-delete-files").toInt == 3)
    assert(snap.summary("added-delete-files") == "1")
    val after = st.dataFilesAsOf("t", None)
    // data-file path set identical — only the delete side moved
    assert(after.map(_.path).toSet == before.map(_.path).toSet)
    val dirtyAfter = after.filter(_.deletes.nonEmpty)
    assert(dirtyAfter.forall(_.deletes.size == 1))
    // the consolidated ref covers every stacked position
    assert(dirtyAfter.flatMap(_.deletes).map(_.records).sum == 30L)
    // reads bit-identical; live counts maintained
    assert(st.read("t").orderBy("id").collect().toSeq == rowsBefore)
    assert(st.recordCountAsOf("t", None).contains(70L))
    // time travel to the pre-consolidation snapshot still anti-joins
    // the OLD refs
    assert(st.read("t", Some(3000L)).count() == 80)
    // no-op on an already-consolidated table still commits (visible
    // maintenance), changing nothing
    val noop = st.rewritePositionDeleteFiles("t", 6000L)
    assert(noop.summary("rewritten-delete-files") == "0")
    assert(st.read("t").count() == 70)
  }

  test("needle MERGE probe consults the bloom tier on an unsorted " +
      "high-cardinality key") {
    val st = newStore()
    // bijective scramble: 1000 distinct keys, interleaved across 4
    // files so every file's min/max covers nearly the whole domain —
    // the range tier admits everything, only blooms discriminate
    val df = (0 until 1000).map(i => ((i * 7919L) % 1000, i))
      .toDF("id", "payload")
    st.create("t", df.schema)
    st.setBloomColumns("t", Seq("id"))
    (0 until 4).foreach(b => st.append("t",
      df.filter(pmod(col("payload"), lit(4)) === b).coalesce(1), 1000L + b))
    assert(st.currentFiles("t").size == 4)
    val needle = (5L * 7919L) % 1000 // payload 5 → file b = 1
    val bloomAdmitted =
      st.prunedFiles("t", col("id").isin(needle)).map(_.path).toSet
    assert(bloomAdmitted.size < 4, "blooms must rule out at least one file")
    // the key-probe needle tier must admit exactly the bloom set
    val probe = st.keyProbeCandidates("t", st.dataFilesAsOf("t", None),
      Seq(needle).toDF("id"), Seq("id"))
    assert(probe.map(_.path).toSet == bloomAdmitted)
    // end to end: the upsert rewrites no more files than blooms admit
    val snap = st.upsert("t", Seq((needle, -1)).toDF("id", "payload"),
      Seq("id"), 5000L)
    assert(snap.summary("rewritten-files").toInt <= bloomAdmitted.size)
    assert(st.read("t").count() == 1000)
    assert(st.read("t").filter(col("id") === needle)
      .select("payload").head().getInt(0) == -1)
  }
}
