package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Write-audit-publish (Iceberg's WAP workflow): staged appends are
  * invisible until an explicit publish, auditable in place, and
  * discardable without ever having touched the live snapshot chain —
  * the gate that keeps a bad batch out of a production table.
  */
class WapSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fixture(): (graft.catalog.GraftCatalog, graft.sql.Engine) = {
    val cat = new graft.catalog.GraftCatalog(
      Files.createTempDirectory("graft-wap"), spark)
    cat.createDatabase("default")
    (cat, new graft.sql.Engine(cat))
  }

  test("staged append is invisible to reads, visible to audit, atomic on publish") {
    val (cat, _) = fixture()
    val st = cat.store()
    val base = Seq((1, "a"), (2, "b")).toDF("id", "v")
    cat.createTable("t", base.schema)
    cat.append("t", base, 1000L)
    st.stageWap("t", Seq((3, "c"), (4, "d")).toDF("id", "v"), "batch-7", 2000L)
    // readers stay pinned to the committed snapshot
    assert(st.read("t").count() == 2)
    assert(st.history("t").count() == 1)
    assert(st.recordCountAsOf("t", None).contains(2L))
    // the staged set is listed and auditable in place
    assert(st.wapEntries("t").map(e => (e.wapId, e.recordCount)) ==
      Seq(("batch-7", 2L)))
    assert(st.auditWap("t", "batch-7").count() == 4)
    // publish: one atomic append commit, stamped with the wap id
    val snap = st.publishWap("t", "batch-7", 3000L)
    assert(snap.summary.get("wap.id").contains("batch-7"))
    assert(st.read("t").count() == 4)
    assert(st.wapEntries("t").isEmpty)
    // time travel sees the pre-publish state at the staging timestamp —
    // staging never entered the snapshot chain
    assert(st.read("t", Some(2500L)).count() == 2)
  }

  test("double publish and unknown ids raise; duplicate staging raises") {
    val (cat, _) = fixture()
    val st = cat.store()
    val df = Seq((1, "a")).toDF("id", "v")
    cat.createTable("t", df.schema)
    cat.append("t", df)
    st.stageWap("t", Seq((2, "b")).toDF("id", "v"), "w1")
    assert(intercept[IllegalArgumentException](
      st.stageWap("t", Seq((3, "c")).toDF("id", "v"), "w1"))
      .getMessage.contains("already staged"))
    st.publishWap("t", "w1")
    assert(intercept[IllegalStateException](st.publishWap("t", "w1"))
      .getMessage.contains("already published"))
    assert(intercept[IllegalArgumentException](st.publishWap("t", "nope"))
      .getMessage.contains("no staged"))
    assert(intercept[IllegalArgumentException](st.auditWap("t", "w1"))
      .getMessage.contains("no staged"))
  }

  test("publish cherry-picks onto a head that moved after staging") {
    val (cat, _) = fixture()
    val st = cat.store()
    cat.createTable("t", Seq((1, "a")).toDF("id", "v").schema)
    cat.append("t", Seq((1, "a")).toDF("id", "v"))
    st.stageWap("t", Seq((10, "staged")).toDF("id", "v"), "w1")
    // the table advances while the audit runs
    cat.append("t", Seq((2, "b")).toDF("id", "v"))
    st.publishWap("t", "w1")
    assert(st.read("t").select("id").as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 10))
  }

  test("staged files survive vacuum; discarded files are reclaimed") {
    val (cat, _) = fixture()
    val st = cat.store()
    cat.createTable("t", Seq((1, "a")).toDF("id", "v").schema)
    cat.append("t", Seq((1, "a")).toDF("id", "v"))
    st.stageWap("t", Seq((2, "b")).toDF("id", "v"), "w1")
    val staged = st.wapEntries("t").head.files.map(_.path)
    assert(staged.nonEmpty)
    // vacuum with an unlimited grace window must NOT touch staged files
    st.vacuum("t", System.currentTimeMillis() + 3600000L)
    assert(st.auditWap("t", "w1").count() == 2, "vacuum ate staged files")
    // discard: the entry goes now, the files become ordinary debris
    st.discardWap("t", "w1")
    assert(st.wapEntries("t").isEmpty)
    st.vacuum("t", System.currentTimeMillis() + 3600000L)
    val dataDir = new org.apache.hadoop.fs.Path(
      cat.store().tableDir("t"), "data")
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val remaining = fs.listStatus(dataDir).map(_.getPath.getName).toSet
    staged.foreach(p => assert(
      !remaining(p.split("/").last), s"discarded file $p not reclaimed"))
    assert(st.read("t").count() == 1) // committed data untouched
  }

  test("concurrent stages, appends, and publishes serialize — nothing lost") {
    val (cat, _) = fixture()
    val st = cat.store()
    cat.createTable("c", Seq((0, "x")).toDF("id", "v").schema)
    cat.append("c", Seq((0, "base")).toDF("id", "v"))
    // 4 threads: two stage+publish distinct WAP ids, two append directly;
    // the table lock must serialize every metadata mutation — final
    // count = base + 2 staged + 2 direct, history intact
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        if (i <= 2) {
          st.stageWap("c", Seq((i, s"wap$i")).toDF("id", "v"), s"w$i")
          st.publishWap("c", s"w$i")
        } else {
          st.append("c", Seq((i, s"direct$i")).toDF("id", "v"))
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(st.read("c").count() == 5)
    assert(st.wapEntries("c").isEmpty)
    val hist = st.history("c").collect()
    assert(hist.length == 5) // create-append + 2 publishes + 2 appends
    // cumulative record counts are strictly increasing — no lost commit
    val counts = hist.map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1)
    assert(counts.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("SQL surface: conf-gated INSERT staging + CALL publish_changes") {
    val (cat, engine) = fixture()
    engine.run("CREATE TABLE w (id INT, v STRING) STORED AS ICEBERG")
    engine.run("INSERT INTO w (id, v) VALUES (1, 'a')")
    spark.conf.set(graft.sql.SqlDdl.WapIdConf, "etl-42")
    try {
      engine.run("INSERT INTO w (id, v) VALUES (2, 'staged'), (3, 'staged')")
      // the INSERT staged: readers see only the committed row
      assert(engine.run("SELECT COUNT(*) FROM w") == "[(1,)]")
      assert(cat.store().wapEntries("w").map(_.wapId) == Seq("etl-42"))
    } finally spark.conf.unset(graft.sql.SqlDdl.WapIdConf)
    engine.run("CALL publish_changes(table => 'w', wap_id => 'etl-42')")
    assert(engine.run("SELECT COUNT(*) FROM w") == "[(3,)]")
    assert(cat.store().wapEntries("w").isEmpty)
  }
}
