package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Branches (Iceberg's writable refs): invisible multi-commit staging
  * forked from main, readable as a unit by name, published by
  * fast-forward under the ancestor rule.
  */
class BranchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fixture(): (graft.catalog.GraftCatalog, graft.sql.Engine) = {
    val cat = new graft.catalog.GraftCatalog(
      Files.createTempDirectory("graft-branch"), spark)
    cat.createDatabase("default")
    (cat, new graft.sql.Engine(cat))
  }

  test("branch writes are invisible on main, readable by name, fast-forwarded in order") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE b (id INT, v STRING)")
    eng.sql("INSERT INTO b VALUES (1, 'main')")
    eng.sql("ALTER TABLE b CREATE BRANCH audit")
    // two commits on the branch via the session conf
    spark.conf.set(graft.sql.SqlDdl.BranchConf, "audit")
    try {
      eng.sql("INSERT INTO b VALUES (2, 'br')")
      eng.sql("INSERT INTO b VALUES (3, 'br')")
    } finally spark.conf.unset(graft.sql.SqlDdl.BranchConf)
    // main untouched; the branch reads fork + both commits
    assert(eng.run("SELECT COUNT(*) FROM b") == "[(1,)]")
    assert(eng.run("SELECT COUNT(*) FROM b FOR SYSTEM_VERSION AS OF 'audit'")
      == "[(3,)]")
    val shown = eng.sql("SHOW BRANCHES IN b").collect()
    assert(shown.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq(("audit", 1L, 2)))
    // fast-forward: each branch commit replays as its own snapshot
    eng.sql("CALL fast_forward(table => 'b', branch => 'audit')")
    assert(eng.run("SELECT COUNT(*) FROM b") == "[(3,)]")
    assert(st.branches("b").isEmpty)
    val hist = st.history("b").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq.sortBy(_._1)
    assert(hist == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    // branch-published snapshots carry the branch stamp
    assert(st.snapshotsMetadata("b")
      .where("summary['branch'] = 'audit'").count() == 2)
  }

  test("fast-forward refuses a moved main (ancestor rule)") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE m (id INT)")
    eng.sql("INSERT INTO m VALUES (1)")
    eng.sql("ALTER TABLE m CREATE BRANCH b1")
    st.appendToBranch("m", Seq(2).toDF("id"), "b1")
    eng.sql("INSERT INTO m VALUES (9)") // main moves past the fork
    val e = intercept[IllegalStateException](st.fastForward("m", "b1"))
    assert(e.getMessage.contains("fork"))
    // the branch still reads its own consistent lineage (fork + entry)
    assert(eng.run("SELECT COUNT(*) FROM m FOR SYSTEM_VERSION AS OF 'b1'")
      == "[(2,)]")
  }

  test("tags and branches share one ref namespace; unknown refs stay loud") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE r (id INT)")
    eng.sql("INSERT INTO r VALUES (1)")
    st.createTag("r", "v1")
    assert(intercept[IllegalArgumentException](st.createBranch("r", "v1"))
      .getMessage.contains("tag"))
    st.createBranch("r", "dev")
    assert(intercept[IllegalArgumentException](st.createTag("r", "dev"))
      .getMessage.contains("branch"))
    assertThrows[IllegalArgumentException](
      eng.sql("SELECT * FROM r FOR SYSTEM_VERSION AS OF 'nope'").collect())
  }

  test("branch reads reconcile schema evolution; fast-forward still lands") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE se (id INT)")
    eng.sql("INSERT INTO se VALUES (1)")
    eng.sql("ALTER TABLE se CREATE BRANCH dev")
    st.appendToBranch("se", Seq(2).toDF("id"), "dev")
    // metadata-only evolution does NOT move the snapshot head, so the
    // branch stays fast-forwardable; its pre-ALTER files null-fill the
    // new column exactly like main's do
    eng.sql("ALTER TABLE se ADD COLUMN v STRING")
    val br = st.readBranch("se", "dev")
    assert(br.columns.toSeq == Seq("id", "v"))
    assert(br.count() == 2 && br.where("v IS NULL").count() == 2)
    st.fastForward("se", "dev")
    assert(eng.run("SELECT COUNT(*) FROM se") == "[(2,)]")
    eng.sql("INSERT INTO se VALUES (3, 'x')")
    assert(eng.run("SELECT COUNT(*) FROM se WHERE v = 'x'") == "[(1,)]")
  }

  test("vacuum keeps branch files until dropBranch; expire keeps the fork point") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE vb (id INT)")
    eng.sql("INSERT INTO vb VALUES (1)")           // snapshot 1 (fork)
    st.createBranch("vb", "keepme")
    st.appendToBranch("vb", Seq(2).toDF("id"), "keepme")
    eng.sql("INSERT INTO vb VALUES (3)")           // snapshot 2
    st.vacuum("vb", System.currentTimeMillis() + 3600000L)
    assert(st.readBranch("vb", "keepme").count() == 2,
      "vacuum ate branch files")
    // expire everything old: the fork point must survive for the branch
    st.expire("vb", System.currentTimeMillis() + 3600000L)
    assert(st.readBranch("vb", "keepme").count() == 2,
      "expire dropped the branch's fork point")
    st.dropBranch("vb", "keepme")
    st.vacuum("vb", System.currentTimeMillis() + 3600000L)
    assert(st.read("vb").count() == 2) // main data intact (rows 1, 3)
    assertThrows[IllegalArgumentException](st.readBranch("vb", "keepme"))
  }
}
