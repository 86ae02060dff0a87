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
}
