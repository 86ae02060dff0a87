package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** CHECK constraints (Delta parity): ADD validates existing rows, every
  * later write — append, SQL INSERT, COW UPDATE — enforces the
  * expression per row INSIDE the write job (a violating write fails
  * before any commit, leaving the table untouched), NULL passes per the
  * SQL standard, and schema evolution cannot dangle a constraint.
  */
class CheckConstraintSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fixture(): (graft.catalog.GraftCatalog, graft.sql.Engine) = {
    val cat = new graft.catalog.GraftCatalog(
      Files.createTempDirectory("graft-ck"), spark)
    cat.createDatabase("default")
    (cat, new graft.sql.Engine(cat))
  }

  test("violating append fails before commit; table state unchanged") {
    val (cat, _) = fixture()
    val st = cat.store()
    st.create("acct", Seq((1, 10.0)).toDF("id", "balance").schema)
    st.addCheckConstraint("acct", "positive_balance", "balance >= 0")
    cat.append("acct", Seq((1, 10.0), (2, 0.0)).toDF("id", "balance"), 1000L)
    val snapBefore = st.currentSnapshotId("acct")
    val e = intercept[Exception](
      cat.append("acct", Seq((3, -5.0)).toDF("id", "balance"), 2000L))
    assert(e.getMessage.contains("positive_balance") ||
      Option(e.getCause).exists(_.getMessage.contains("positive_balance")))
    assert(st.currentSnapshotId("acct") == snapBefore) // nothing committed
    assert(st.read("acct").count() == 2)
  }

  test("NULL evaluates as pass (SQL CHECK semantics); omitted columns are NULL") {
    val (cat, _) = fixture()
    val st = cat.store()
    st.create("t", Seq((1, java.lang.Double.valueOf(1.0)))
      .toDF("id", "v").schema)
    st.addCheckConstraint("t", "v_pos", "v > 0")
    cat.append("t", Seq((1, java.lang.Double.valueOf(1.0)),
      (2, null.asInstanceOf[java.lang.Double])).toDF("id", "v"), 1000L)
    // frame omitting v entirely: constraint sees NULL → passes
    cat.append("t", Seq(3).toDF("id"), 2000L)
    assert(st.read("t").count() == 3)
  }

  test("ADD validates existing rows and refuses a born-broken constraint") {
    val (cat, _) = fixture()
    val st = cat.store()
    st.create("t", Seq((1, -1.0)).toDF("id", "v").schema)
    cat.append("t", Seq((1, -1.0)).toDF("id", "v"), 1000L)
    val e = intercept[IllegalArgumentException](
      st.addCheckConstraint("t", "v_pos", "v >= 0"))
    assert(e.getMessage.contains("existing row"))
    assert(st.checkConstraints("t").isEmpty)
  }

  test("COW UPDATE into a violating state fails; valid update passes") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE acct (id INT, balance DOUBLE)")
    eng.sql("INSERT INTO acct VALUES (1, 50.0), (2, 10.0)")
    eng.sql("ALTER TABLE acct ADD CONSTRAINT positive CHECK (balance >= 0)")
    intercept[Exception](
      eng.sql("UPDATE acct SET balance = balance - 100 WHERE id = 2"))
    assert(st.read("acct").filter(col("balance") < 0).count() == 0)
    eng.sql("UPDATE acct SET balance = balance - 5 WHERE id = 2")
    assert(st.read("acct").filter(col("id") === 2)
      .head().getDouble(1) == 5.0)
  }

  test("SQL surface: ADD/DROP CONSTRAINT; SHOW CREATE round-trips; " +
      "violating INSERT caught; post-DROP write accepted") {
    val (cat, eng) = fixture()
    eng.sql("CREATE TABLE p (id INT, qty INT)")
    eng.sql("ALTER TABLE p ADD CONSTRAINT qty_range CHECK (qty BETWEEN 0 AND 100)")
    val ddl = eng.sql("SHOW CREATE TABLE p").head().getString(0)
    assert(ddl.contains("ADD CONSTRAINT qty_range CHECK (qty BETWEEN 0 AND 100)"))
    eng.sql("INSERT INTO p VALUES (1, 5)")
    intercept[Exception](eng.sql("INSERT INTO p VALUES (2, 500)"))
    assert(cat.store().read("p").count() == 1)
    eng.sql("ALTER TABLE p DROP CONSTRAINT qty_range")
    eng.sql("INSERT INTO p VALUES (2, 500)")
    assert(cat.store().read("p").count() == 2)
    // duplicate / unknown names fail loudly
    intercept[IllegalArgumentException](
      eng.sql("ALTER TABLE p DROP CONSTRAINT qty_range"))
  }

  test("schema evolution guards: dropping or renaming a constrained column is rejected") {
    val (cat, eng) = fixture()
    val st = cat.store()
    eng.sql("CREATE TABLE t (id INT, v DOUBLE, free STRING)")
    eng.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val e1 = intercept[IllegalArgumentException](st.dropColumn("t", "v"))
    assert(e1.getMessage.contains("v_pos"))
    val e2 = intercept[IllegalArgumentException](st.renameColumn("t", "v", "w"))
    assert(e2.getMessage.contains("v_pos"))
    // unconstrained columns still evolve freely
    st.dropColumn("t", "free")
    // constraint on an unknown column is rejected at ADD
    intercept[IllegalArgumentException](
      st.addCheckConstraint("t", "bad", "nope > 0"))
  }

  test("MERGE INTO enforces constraints on both update and insert arms") {
    val (cat, eng) = fixture()
    eng.sql("CREATE TABLE m (id INT, qty INT)")
    eng.sql("INSERT INTO m VALUES (1, 5)")
    eng.sql("ALTER TABLE m ADD CONSTRAINT qty_pos CHECK (qty >= 0)")
    // violating UPDATE arm fails before commit
    intercept[Exception](eng.sql(
      "MERGE INTO m t USING (VALUES (1)) s(id) ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET qty = -1"))
    assert(cat.store().read("m").count() == 1)
    // violating INSERT arm fails too
    intercept[Exception](eng.sql(
      "MERGE INTO m t USING (VALUES (2, -7)) s(id, q) ON t.id = s.id " +
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.q)"))
    assert(cat.store().read("m").count() == 1)
    // a clean merge passes
    eng.sql("MERGE INTO m t USING (VALUES (2, 7)) s(id, q) ON t.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.q)")
    assert(cat.store().read("m").count() == 2)
  }

  test("constraints survive compaction and COW deletes (row-preserving paths)") {
    val (cat, _) = fixture()
    val st = cat.store()
    st.create("t", Seq((1, 1.0)).toDF("id", "v").schema)
    st.addCheckConstraint("t", "v_pos", "v >= 0")
    cat.append("t", (1 to 20).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(3), 1000L)
    st.compact("t")       // rewrite of valid rows passes the guard
    st.deleteWhere("t", col("id") <= 5)
    assert(st.read("t").count() == 15)
    assert(st.checkConstraints("t") == Seq(("v_pos", "v >= 0")))
  }
}
