package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Change-data-feed scan ([[TableStore.readChanges]]) — the row-level
  * changelog Iceberg's changelog scan / Delta's CDF expose over a
  * snapshot range. The feed must:
  *  - deliver appends as 'insert' rows tagged with their commit,
  *  - recover COW deletes/updates as net delete/insert pairs from ONLY
  *    the files the commit touched,
  *  - skip layout-only rewrites (compaction/sort/z-order) entirely,
  *  - replay a table exactly: base rows + feed = final rows.
  */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def newStore(): TableStore =
    new TableStore(new HPath(Files.createTempDirectory("graft-cdc").toUri), spark)

  private def changes(st: TableStore, table: String, from: Long = 0L,
      to: Option[Long] = None): Seq[(Int, String, Long)] =
    st.readChanges(table, from, to)
      .select(col("id"), col("_change_type"), col("_commit_snapshot_id"))
      .as[(Int, String, Long)].collect().toSeq.sorted

  test("appends surface as insert rows tagged with their commit") {
    val st = newStore()
    st.create("t", Seq(1).toDF("id").schema)
    st.append("t", Seq(1, 2).toDF("id"), 1000L)
    st.append("t", Seq(3).toDF("id"), 2000L)
    assert(changes(st, "t") ==
      Seq((1, "insert", 1L), (2, "insert", 1L), (3, "insert", 2L)))
    // fromId is exclusive: resuming after snapshot 1 sees only commit 2
    assert(changes(st, "t", from = 1L) == Seq((3, "insert", 2L)))
    // commit timestamp rides along
    val ts = st.readChanges("t", 1L).select(col("_commit_timestamp"))
      .as[java.sql.Timestamp].head()
    assert(ts.getTime == 2000L)
  }

  test("COW delete yields delete rows for exactly the removed rows") {
    val st = newStore()
    st.create("t", Seq(1).toDF("id").schema)
    st.append("t", (1 to 6).toDF("id"), 1000L)
    st.deleteWhere("t", col("id") % 2 === 0, 2000L)
    val feed = changes(st, "t", from = 1L)
    assert(feed == Seq((2, "delete", 2L), (4, "delete", 2L), (6, "delete", 2L)))
  }

  test("COW update yields a delete+insert pair per changed row, carried rows silent") {
    val st = newStore()
    st.create("t", Seq((1, 10.0)).toDF("id", "v").schema)
    st.append("t", Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("id", "v"), 1000L)
    st.updateWhere("t", Seq("v" -> (col("v") + 1)), Some(col("id") === 2), 2000L)
    val feed = st.readChanges("t", 1L)
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Int, Double, String)].collect().toSeq.sorted
    // rows 1 and 3 were rewritten into the new file unchanged (same file
    // as row 2) but must NOT appear: the diff nets them out
    assert(feed == Seq((2, 20.0, "delete"), (2, 21.0, "insert")))
  }

  test("merge upsert nets to its true row-level effect") {
    val st = newStore()
    st.create("t", Seq((1, "a")).toDF("id", "s").schema)
    st.append("t", Seq((1, "a"), (2, "b")).toDF("id", "s"), 1000L)
    // upsert: update id=2, insert id=3
    st.upsert("t", Seq((2, "B"), (3, "c")).toDF("id", "s"), Seq("id"), 2000L)
    val feed = st.readChanges("t", 1L)
      .select(col("id"), col("s"), col("_change_type"))
      .as[(Int, String, String)].collect().toSeq.sorted
    assert(feed == Seq((2, "B", "insert"), (2, "b", "delete"),
      (3, "c", "insert")))
  }

  test("compaction / sort / z-order rewrites emit nothing") {
    val st = newStore()
    st.create("t", Seq(1).toDF("id").schema)
    st.append("t", (1 to 10).toDF("id").repartition(4), 1000L)
    st.append("t", (11 to 20).toDF("id").repartition(4), 2000L)
    val preCompact = st.currentSnapshotId("t").get
    st.compact("t")
    st.sortRewrite("t", Seq("id"))
    st.zorder("t", Seq("id"))
    // whole-range feed: only the two appends
    assert(changes(st, "t").map(_._2).forall(_ == "insert"))
    assert(changes(st, "t").size == 20)
    // post-compaction range: empty, and answered from metadata alone
    assert(st.readChanges("t", preCompact).count() == 0)
  }

  test("an unmarked replace (overwrite load) diffs to its net change") {
    val st = newStore()
    st.create("t", Seq(1).toDF("id").schema)
    st.append("t", Seq(1, 2, 3).toDF("id"), 1000L)
    st.overwrite("t", Seq(3, 4).toDF("id"), 2000L) // op = "replace", no marker
    val feed = changes(st, "t", from = 1L)
    assert(feed == Seq((1, "delete", 2L), (2, "delete", 2L), (4, "insert", 2L)))
  }

  test("feed replay reconstructs the table: base + inserts - deletes = final") {
    val st = newStore()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.append("t", (1 to 50).map(i => (i, i.toDouble)).toDF("id", "v"), 1000L)
    val base = st.currentSnapshotId("t").get
    st.append("t", (51 to 60).map(i => (i, i.toDouble)).toDF("id", "v"), 2000L)
    st.deleteWhere("t", col("id") <= 5, 3000L)
    st.updateWhere("t", Seq("v" -> lit(0.0)), Some(col("id") > 55), 4000L)
    st.compact("t")
    val feed = st.readChanges("t", base)
    val baseDf = st.readVersion("t", base).select("id", "v")
    val replayed = baseDf
      .unionByName(feed.filter(col("_change_type") === "insert").select("id", "v"))
      .exceptAll(feed.filter(col("_change_type") === "delete").select("id", "v"))
    val fin = st.read("t").select("id", "v")
    assert(replayed.exceptAll(fin).isEmpty && fin.exceptAll(replayed).isEmpty)
  }

  test("feed crossing ADD COLUMN renders old rows under the final schema") {
    val st = newStore()
    st.create("t", Seq(1).toDF("id").schema)
    st.append("t", Seq(1).toDF("id"), 1000L)
    st.addColumns("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType))))
    st.append("t", Seq((2, "x")).toDF("id", "tag"), 2000L)
    val feed = st.readChanges("t", 0L)
      .select(col("id"), col("tag"), col("_change_type"))
      .as[(Int, Option[String], String)].collect().toSeq.sortBy(_._1)
    assert(feed == Seq((1, None, "insert"), (2, Some("x"), "insert")))
  }

  test("map-typed schema rejects a COW diff loudly but serves appends") {
    val st = newStore()
    val mdf = Seq((1, Map("a" -> 1))).toDF("id", "m")
    st.create("t", mdf.schema)
    st.append("t", mdf, 1000L)
    assert(st.readChanges("t", 0L).count() == 1) // appends fine
    st.deleteWhere("t", col("id") === 1, 2000L)
    val e = intercept[IllegalArgumentException](st.readChanges("t", 0L))
    assert(e.getMessage.contains("MAP"))
  }

  test("binpack compaction rewrites ONLY under-sized files; compliant files carry") {
    val st = newStore()
    st.create("t", Seq(1).toDF("id").schema)
    st.append("t", (1 to 5000).toDF("id").coalesce(1), 1000L)   // "big" file
    st.append("t", Seq(5001).toDF("id"), 2000L)                 // small
    st.append("t", Seq(5002).toDF("id"), 3000L)                 // small
    val files = st.currentSnapshotId("t")
      .map(_ => st.currentFiles("t")).get
    assert(files.size == 3)
    val bigPath = files.maxBy(p => st.metaFs.getFileStatus(
      new org.apache.hadoop.fs.Path(p)).getLen)
    val bigLen = st.metaFs.getFileStatus(
      new org.apache.hadoop.fs.Path(bigPath)).getLen
    // target below the big file's size: only the two small files rewrite
    st.compact("t", targetBytes = bigLen)
    val after = st.currentFiles("t")
    assert(after.contains(bigPath), "compliant file must carry by reference")
    assert(after.size == 2, s"two small files must binpack into one: $after")
    assert(st.read("t").count() == 5002)
    // compact again: nothing under-sized left → metadata-only commit
    val before2 = st.currentFiles("t").toSet
    st.compact("t", targetBytes = 10L)
    assert(st.currentFiles("t").toSet == before2)
  }

  test("bounds validate like the incremental scan") {
    val st = newStore()
    st.create("t", Seq(1).toDF("id").schema)
    st.append("t", Seq(1).toDF("id"), 1000L)
    intercept[IllegalArgumentException](st.readChanges("t", 99L))
    intercept[IllegalArgumentException](st.readChanges("missing", 0L))
  }
}
