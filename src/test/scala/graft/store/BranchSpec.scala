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

  test("branch-scoped UPDATE/DELETE/MERGE: COW on the branch, invisible " +
      "on main, fast-forward publishes the row-changing commits") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE bd (id INT, v DOUBLE, tag STRING)")
    eng.sql("INSERT INTO bd VALUES (1, 10.0, 'a'), (2, 20.0, 'b'), " +
      "(3, 30.0, 'c'), (4, 40.0, 'd')")
    eng.sql("ALTER TABLE bd CREATE BRANCH fix")
    spark.conf.set(graft.sql.SqlDdl.BranchConf, "fix")
    try {
      eng.sql("INSERT INTO bd VALUES (5, 50.0, 'e')")
      eng.sql("UPDATE bd SET v = v * 2 WHERE id <= 2")
      eng.sql("DELETE FROM bd WHERE id = 3")
      eng.sql("MERGE INTO bd t USING " +
        "(SELECT 4 AS id, 99.0 AS v UNION ALL SELECT 6, 60.0) s " +
        "ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.id, s.v, 'new')")
    } finally spark.conf.unset(graft.sql.SqlDdl.BranchConf)
    // main never saw any of it
    assert(eng.run("SELECT COUNT(*) FROM bd") == "[(4,)]")
    assert(eng.run("SELECT ROUND(SUM(v), 1) FROM bd") == "[(100.0,)]")
    // the branch reads the composed effect of all four entries
    assert(eng.run("SELECT id, v FROM bd FOR SYSTEM_VERSION AS OF 'fix' " +
      "ORDER BY id") ==
      "[(1, 20.0), (2, 40.0), (4, 99.0), (5, 50.0), (6, 60.0)]")
    // fast-forward replays each entry as a real commit of its operation
    eng.sql("CALL fast_forward(table => 'bd', branch => 'fix')")
    assert(eng.run("SELECT id, v FROM bd ORDER BY id") ==
      "[(1, 20.0), (2, 40.0), (4, 99.0), (5, 50.0), (6, 60.0)]")
    val hist = st.history("bd").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(hist.map(_._2) ==
      Seq("append", "append", "update", "delete", "merge"))
    // running record counts track the replayed deltas
    assert(hist.map(_._3) == Seq(4L, 5L, 5L, 4L, 5L))
    // time travel through the published chain sees each stage
    assert(eng.run("SELECT COUNT(*) FROM bd FOR SYSTEM_VERSION AS OF 3")
      == "[(5,)]")
    assert(eng.run("SELECT ROUND(SUM(v), 1) FROM bd " +
      "FOR SYSTEM_VERSION AS OF 4") == "[(150.0,)]")
  }

  test("the change feed serves fast-forwarded branch COW commits via " +
      "the diff path") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE bf (id INT, v DOUBLE)")
    eng.sql("INSERT INTO bf VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    eng.sql("ALTER TABLE bf CREATE BRANCH wip")
    spark.conf.set(graft.sql.SqlDdl.BranchConf, "wip")
    try {
      eng.sql("DELETE FROM bf WHERE id = 2")
      eng.sql("UPDATE bf SET v = v + 10 WHERE id = 3")
    } finally spark.conf.unset(graft.sql.SqlDdl.BranchConf)
    st.fastForward("bf", "wip")
    // replayed COW commits carry no stored change files — the batch
    // feed recovers their row-level effect from the file diff
    val feed = st.readChanges("bf", 1).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSeq.sorted
    assert(feed == Seq((2, 2.0, "delete"), (3, 3.0, "delete"),
      (3, 13.0, "insert")))
  }

  test("PROPERTY: a branch op-sequence fast-forwarded equals the same " +
      "ops applied directly to main") {
    val (cat, eng) = fixture()
    val st = cat.store()
    for (seed <- Seq(1, 7)) {
      val ctl = s"ctl_$seed"
      val br = s"brt_$seed"
      def seedRows(n: Int) = (0 until n)
        .map(i => (i, i * 1.5, s"g${i % 5}")).toDF("id", "v", "g")
      for (t <- Seq(ctl, br)) {
        cat.createTable(t, seedRows(1).schema)
        cat.append(t, seedRows(40), 1000L)
      }
      eng.sql(s"ALTER TABLE $br CREATE BRANCH work")
      // deterministic pseudo-random op sequence, applied to the control
      // directly and to the branch via the conf
      def ops(t: String): Unit = {
        val rnd = new scala.util.Random(seed)
        for (step <- 0 until 6) {
          val k = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(k)
          rnd.nextInt(3) match {
            case 0 => eng.sql(
              s"INSERT INTO $t VALUES (${100 + seed * 10 + step}, " +
                s"${step * 2.5}, 'gNew')")
            case 1 => eng.sql(
              s"UPDATE $t SET v = v + $step WHERE id % $k = $r")
            case 2 => eng.sql(s"DELETE FROM $t WHERE id % $k = $r AND id < 30")
          }
        }
      }
      ops(ctl)
      spark.conf.set(graft.sql.SqlDdl.BranchConf, "work")
      try ops(br) finally spark.conf.unset(graft.sql.SqlDdl.BranchConf)
      // vacuum must not eat branch-staged COW rewrites pre-publish
      st.vacuum(br, System.currentTimeMillis() + 3600000L)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy($"id", $"v").collect().toSeq
      assert(rows(st.readBranch(br, "work")) == rows(st.read(ctl)),
        s"branch view diverged (seed $seed)")
      st.fastForward(br, "work")
      assert(rows(st.read(br)) == rows(st.read(ctl)),
        s"published state diverged (seed $seed)")
    }
  }

  test("branch DML conflicts: unknown branch loud, WAP id rejected") {
    val (cat, eng) = fixture()
    eng.sql("CREATE TABLE bc (id INT)")
    eng.sql("INSERT INTO bc VALUES (1)")
    spark.conf.set(graft.sql.SqlDdl.BranchConf, "nope")
    try assertThrows[IllegalArgumentException](
      eng.sql("DELETE FROM bc WHERE id = 1"))
    finally spark.conf.unset(graft.sql.SqlDdl.BranchConf)
    spark.conf.set(graft.sql.SqlDdl.WapIdConf, "w1")
    try assertThrows[IllegalArgumentException](
      eng.sql("UPDATE bc SET id = 2 WHERE id = 1"))
    finally spark.conf.unset(graft.sql.SqlDdl.WapIdConf)
    // TRUNCATE / RESTORE change MAIN's contents: both refuse while a
    // branch (or WAP id) conf routes writes elsewhere
    eng.sql("ALTER TABLE bc CREATE BRANCH b1")
    spark.conf.set(graft.sql.SqlDdl.BranchConf, "b1")
    try {
      assertThrows[IllegalArgumentException](eng.sql("TRUNCATE TABLE bc"))
      assertThrows[IllegalArgumentException](
        eng.sql("RESTORE TABLE bc TO VERSION AS OF 1"))
    } finally spark.conf.unset(graft.sql.SqlDdl.BranchConf)
    // nothing leaked onto main
    assert(eng.run("SELECT COUNT(*) FROM bc") == "[(1,)]")
  }
}
