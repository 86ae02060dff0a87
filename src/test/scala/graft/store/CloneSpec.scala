package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Delta-style SHALLOW CLONE: one metadata commit referencing the
  * source's data files relatively — no data copied, full independence
  * afterwards (clone writes land in the clone's dirs; source writes
  * never appear in the clone).
  */
class CloneSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def newStore(): TableStore =
    new TableStore(new HPath(Files.createTempDirectory("graft-clone").toUri),
      spark)

  private def seed(st: TableStore, rows: Int = 100): Unit = {
    val df = (1 to rows).map(i => (i.toLong, s"v$i", i % 7))
      .toDF("id", "name", "grp")
    st.create("src", df.schema, sortBy = Seq("id"))
    st.append("src", df.filter($"id" <= 50), 1000L)
    st.append("src", df.filter($"id" > 50), 2000L)
  }

  test("clone reads the source snapshot without copying a single file") {
    val st = newStore()
    seed(st)
    val snap = st.shallowClone("c", "src", timestampMs = 3000L)
    assert(snap.operation == "clone")
    assert(snap.summary("shallow-clone") == "true")
    assert(snap.summary("source-table") == "src")
    assert(st.read("c").orderBy("id").collect().toSeq ==
      st.read("src").orderBy("id").collect().toSeq)
    // the clone's own data dir is EMPTY — zero bytes copied
    val fs = st.tableDir("c")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(new HPath(st.tableDir("c"), "data")).isEmpty)
    // entry metadata (per-file stats) traveled: a point predicate still
    // prunes to a strict subset of the sorted files
    val pruned = st.prunedFiles("c", col("id") === 7L)
    assert(pruned.nonEmpty &&
      pruned.size < st.dataFilesAsOf("c", None).size)
  }

  test("clone and source evolve independently after the clone") {
    val st = newStore()
    seed(st)
    st.shallowClone("c", "src", timestampMs = 3000L)
    // clone-side mutation: COW delete rewrites into the CLONE's dirs
    st.deleteWhere("c", $"id" <= 10, 4000L)
    assert(st.read("c").count() == 90)
    assert(st.read("src").count() == 100)
    // source-side append: invisible to the clone
    st.append("src", Seq((999L, "x", 0)).toDF("id", "name", "grp"), 5000L)
    assert(st.read("src").count() == 101)
    assert(st.read("c").count() == 90)
    // time travel on the clone's own chain still works
    assert(st.read("c", Some(3000L)).count() == 100)
  }

  test("VERSION AS OF clones a historical snapshot") {
    val st = newStore()
    seed(st)
    val snap = st.shallowClone("c1", "src", asOfVersion = Some(1L),
      timestampMs = 3000L)
    assert(snap.summary("source-snapshot-id") == "1")
    assert(st.read("c1").count() == 50)
    assertThrows[IllegalArgumentException](
      st.shallowClone("c9", "src", asOfVersion = Some(99L)))
  }

  test("cloning a merge-on-read source carries the delete refs") {
    val st = newStore()
    val df = (1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "grp")
      .coalesce(1)
    st.create("src", df.schema)
    st.setTableProperties("src",
      Map(TableStore.DeleteModeProp -> TableStore.MergeOnRead))
    st.append("src", df, 1000L)
    st.deleteWhere("src", $"id" <= 20, 2000L)
    st.shallowClone("c", "src", timestampMs = 3000L)
    assert(st.read("c").count() == 80)
    assert(st.read("c").agg(min("id")).head().getLong(0) == 21L)
    assert(st.dataFilesAsOf("c", None).exists(_.deletes.nonEmpty))
  }

  test("clone carries identifier fields and the change-feed toggle") {
    val st = newStore()
    seed(st)
    st.setIdentifierFields("src", Seq("id"))
    st.setChangeFeed("src", enabled = true)
    st.shallowClone("c", "src", timestampMs = 3000L)
    assert(st.identifierFields("c") == Seq("id"))
    assert(st.changeFeedEnabled("c"))
    // the declaration is live, not just copied text: a keys-less
    // equality upsert into the clone resolves it, and the clone's own
    // writes materialize change files
    val snap = st.equalityUpsert("c",
      Seq((1L, "v1b", 1)).toDF("id", "name", "grp"),
      st.identifierFields("c"), 4000L)
    assert(snap.summary.contains(TableStore.CdcDirKey))
    assert(st.read("c").filter($"id" === 1L)
      .select("name").as[String].head() == "v1b")
  }

  test("clone refuses an existing target and a missing source") {
    val st = newStore()
    seed(st)
    assertThrows[IllegalArgumentException](st.shallowClone("c", "nope"))
    st.shallowClone("c", "src")
    assertThrows[IllegalArgumentException](st.shallowClone("c", "src"))
  }

  test("SQL surface: CREATE TABLE … SHALLOW CLONE, AS OF, cross-db guard") {
    val cat = new graft.catalog.GraftCatalog(
      Files.createTempDirectory("graft-clone-sql"), spark)
    cat.createDatabase("default")
    cat.createDatabase("otherdb")
    val eng = new graft.sql.Engine(cat)
    eng.sql("CREATE TABLE s (id INT, v STRING)")
    eng.sql("INSERT INTO s VALUES (1, 'a'), (2, 'b')")
    eng.sql("INSERT INTO s VALUES (3, 'c')")
    eng.sql("CREATE TABLE c SHALLOW CLONE s")
    assert(eng.run("SELECT count(*) AS n FROM c") == "[(3,)]")
    eng.sql("CREATE TABLE c1 SHALLOW CLONE s VERSION AS OF 1")
    assert(eng.run("SELECT count(*) AS n FROM c1") == "[(2,)]")
    // idempotent spelling
    eng.sql("CREATE TABLE IF NOT EXISTS c SHALLOW CLONE s")
    assert(eng.run("SELECT count(*) AS n FROM c") == "[(3,)]")
    // independence through SQL DML
    eng.sql("DELETE FROM c WHERE id = 1")
    assert(eng.run("SELECT count(*) AS n FROM c") == "[(2,)]")
    assert(eng.run("SELECT count(*) AS n FROM s") == "[(3,)]")
    assertThrows[IllegalArgumentException](
      eng.sql("CREATE TABLE otherdb.x SHALLOW CLONE s"))
  }
}
