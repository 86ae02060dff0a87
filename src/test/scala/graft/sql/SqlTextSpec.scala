package graft.sql

import org.scalatest.funsuite.AnyFunSuite

class SqlTextSpec extends AnyFunSuite {

  test("replaces whole-word table names case-insensitively") {
    assert(SqlText.replaceTableName("SELECT * FROM Nation JOIN region", "nation", "n_v") ==
      "SELECT * FROM n_v JOIN region")
  }

  test("does not replace partial-word matches") {
    assert(SqlText.replaceTableName("SELECT * FROM nation_v", "nation", "x") ==
      "SELECT * FROM nation_v")
    assert(SqlText.replaceTableName("SELECT internation FROM t", "nation", "x") ==
      "SELECT internation FROM t")
  }

  test("does not replace inside string literals") {
    assert(SqlText.replaceTableName(
      "SELECT * FROM nation WHERE name = 'nation'", "nation", "v") ==
      "SELECT * FROM v WHERE name = 'nation'")
  }

  test("handles doubled-quote and backslash escapes inside literals") {
    assert(SqlText.replaceTableName(
      "SELECT 'it''s nation' FROM nation", "nation", "v") ==
      "SELECT 'it''s nation' FROM v")
    assert(SqlText.replaceTableName(
      "SELECT 'a\\' nation' FROM nation", "nation", "v") ==
      "SELECT 'a\\' nation' FROM v")
  }

  test("referencesTable sees only unquoted whole-word occurrences") {
    assert(SqlText.referencesTable("SELECT * FROM orders o", "orders"))
    assert(!SqlText.referencesTable("SELECT * FROM orders_v", "orders"))
    assert(!SqlText.referencesTable("SELECT 'orders' FROM t", "orders"))
  }

  test("splitTopLevel ignores commas inside parens and literals") {
    assert(SqlText.splitTopLevel("a INT, b DECIMAL(10,2), c STRING") ==
      Seq("a INT", " b DECIMAL(10,2)", " c STRING"))
    assert(SqlText.splitTopLevel("name = 'a, b', fee = 2") ==
      Seq("name = 'a, b'", " fee = 2"))
    assert(SqlText.splitTopLevel("x = \"a, b\"") == Seq("x = \"a, b\""))
    assert(SqlText.splitTopLevel(" , ,") == Seq.empty)
  }

  test("splitFirstTopLevel splits at the real keyword, not quoted ones") {
    assert(SqlText.splitFirstTopLevel(
      "note = 'see WHERE docs' WHERE id = 1", "WHERE") ==
      ("note = 'see WHERE docs' ", Some(" id = 1")))
    // parenthesized (subquery) keywords are not top-level
    assert(SqlText.splitFirstTopLevel(
      "a = (SELECT max(x) FROM t WHERE y = 1) WHERE id = 2", "WHERE")._2 ==
      Some(" id = 2"))
    assert(SqlText.splitFirstTopLevel("a = 1, b = 2", "WHERE") ==
      ("a = 1, b = 2", None))
    // word boundary: WHEREABOUTS is not WHERE
    assert(SqlText.splitFirstTopLevel("a = whereabouts WHERE b = 1", "WHERE") ==
      ("a = whereabouts ", Some(" b = 1")))
  }
}
