package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.catalog.GraftCatalog

/** Partition pruning through the PLAIN SQL path: a WHERE over a
  * partitioned table must scan only the surviving files — the behavior a
  * production user of the reference's warehouse gets from Iceberg, here
  * without asking for `tableWhere` explicitly. */
class EnginePruningSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def fixture(): (GraftCatalog, Engine) = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft-prune"), spark)
    cat.createDatabase("default")
    val eng = new Engine(cat)
    eng.sql("CREATE TABLE ev (id INT, d DATE, v DOUBLE) " +
      "PARTITIONED BY SPEC (month(d)) STORED AS ICEBERG")
    eng.sql("INSERT INTO ev VALUES (1, '2024-01-05', 1.0), (2, '2024-01-20', 2.0)")
    eng.sql("INSERT INTO ev VALUES (3, '2024-02-03', 3.0)")
    eng.sql("INSERT INTO ev VALUES (4, '2024-03-15', 4.0)")
    (cat, eng)
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation =>
        lr.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
    }.sum

  test("WHERE on the partition source column scans only matching files") {
    val (_, eng) = fixture()
    val all = scannedFiles(eng.sql("SELECT * FROM ev"))
    assert(all >= 3) // at least one file per month
    val pruned = eng.sql(
      "SELECT id FROM ev WHERE d >= DATE'2024-02-01' AND d < DATE'2024-03-01'")
    assert(scannedFiles(pruned) < all)
    assert(pruned.collect().map(_.getInt(0)).toSeq == Seq(3))
    // results identical to the unpruned path
    assert(eng.run("SELECT id FROM ev WHERE d >= DATE'2024-02-01' " +
      "AND d < DATE'2024-03-01' ORDER BY id") == "[(3,)]")
  }

  test("aliased and unprunable predicates fall back to the full scan, correctly") {
    val (_, eng) = fixture()
    // predicate on a non-partition column: no pruning, right answer
    assert(eng.run("SELECT id FROM ev WHERE v > 2.5 ORDER BY id") ==
      "[(3,), (4,)]")
    // table alias with qualified refs: conservative fallback, right answer
    assert(eng.run("SELECT e.id FROM ev e WHERE e.d = DATE'2024-03-15'") ==
      "[(4,)]")
    // join with a filter elsewhere: unchanged semantics
    assert(eng.run("SELECT COUNT(*) FROM ev a JOIN ev b ON a.id = b.id " +
      "WHERE a.d >= DATE'2024-01-01'") == "[(4,)]")
  }

  test("table alias with UNQUALIFIED refs still prunes under the alias") {
    val (_, eng) = fixture()
    val pruned = eng.sql("SELECT id FROM ev e WHERE d = DATE'2024-03-15'")
    // qualified e.d falls back (see previous test); bare d analyzes
    // against the table schema and prunes under the alias
    val all = scannedFiles(eng.sql("SELECT * FROM ev"))
    assert(scannedFiles(pruned) < all)
    assert(pruned.collect().map(_.getInt(0)).toSeq == Seq(4))
    // alias-qualified projection over the spliced relation still resolves
    assert(eng.run("SELECT e.id FROM ev e WHERE d = DATE'2024-03-15'") == "[(4,)]")
  }

  test("a CTE named like the partitioned table is not spliced") {
    val (_, eng) = fixture()
    assert(eng.run("WITH ev AS (SELECT 99 AS id) " +
      "SELECT id FROM ev WHERE id > 0") == "[(99,)]")
  }

  test("AS OF time travel also prunes partitioned tables by the filter") {
    val (cat, eng) = fixture()
    val s = graft.SharedSpark.spark
    // controlled commit times: months 01/02/03 at t=1000, extra March
    // row at t=5000 — AS-OF t=4000 must not see the second snapshot
    cat.createTable("evt", cat.store().schema("ev"),
      Some(graft.store.PartitionSpec("d", "month")))
    // CAST the v literals: ANSI VALUES types 1.0 as DECIMAL(2,1), and
    // the store (rightly) rejects decimal frames against a DOUBLE column
    cat.append("evt", s.sql(
      "SELECT id, d, CAST(v AS DOUBLE) AS v FROM VALUES " +
        "(1, DATE'2024-01-05', 1.0), " +
        "(2, DATE'2024-02-03', 2.0), (4, DATE'2024-03-15', 4.0) " +
        "AS t(id, d, v)"), 1000L)
    cat.append("evt", s.sql(
      "SELECT 5 AS id, DATE'2024-03-20' AS d, CAST(9.0 AS DOUBLE) AS v"), 5000L)
    val asOfAll = eng.sql(
      "SELECT * FROM evt FOR SYSTEM_TIME AS OF '1970-01-01 00:00:04'")
    val asOfPruned = eng.sql(
      "SELECT id FROM evt FOR SYSTEM_TIME AS OF '1970-01-01 00:00:04' " +
        "WHERE d >= DATE'2024-03-01'")
    assert(scannedFiles(asOfPruned) < scannedFiles(asOfAll))
    // pinned correctly: only the pre-append March row
    assert(asOfPruned.collect().map(_.getInt(0)).toSeq == Seq(4))
    // latest sees both March rows, still pruned
    assert(eng.run("SELECT COUNT(*) FROM evt WHERE d >= DATE'2024-03-01'") ==
      "[(2,)]")
  }

  test("DELETE on a partitioned table through SQL stays file-granular") {
    val (cat, eng) = fixture()
    val before = cat.store().dataFilesAsOf("ev", None)
    eng.sql("DELETE FROM ev WHERE d = DATE'2024-02-03'")
    val snap = graft.store.SnapshotLog
      .resolve(org.apache.hadoop.fs.FileSystem.getLocal(
        new org.apache.hadoop.conf.Configuration()),
        cat.store().tableDir("ev"), None).get
    assert(snap.summary("rewritten-files") == "1")
    assert(snap.files.size >= before.size - 1)
    assert(eng.run("SELECT COUNT(*) FROM ev") == "[(3,)]")
  }
}
