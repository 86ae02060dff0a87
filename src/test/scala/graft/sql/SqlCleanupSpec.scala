package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral cases from the reference's cleanup
  * (`/root/reference/app-gradio.py:149-155`): fence stripping, prefix
  * stripping, first-semicolon truncation — plus the quote-awareness the
  * string-level original lacks.
  */
class SqlCleanupSpec extends AnyFunSuite {

  test("plain statement passes through trimmed") {
    assert(SqlCleanup.clean("  SELECT 1  ") == "SELECT 1")
  }

  test("markdown sql fence is stripped") {
    assert(SqlCleanup.clean("```sql\nSELECT COUNT(*) FROM customers\n```") ==
      "SELECT COUNT(*) FROM customers")
  }

  test("bare fence is stripped") {
    assert(SqlCleanup.clean("```\nSELECT 1\n```") == "SELECT 1")
  }

  test("unbalanced fence markers are removed") {
    assert(SqlCleanup.clean("```sql SELECT 1") == "SELECT 1")
  }

  test("SQLQuery prefix is stripped (case-insensitive)") {
    assert(SqlCleanup.clean("SQLQuery: SELECT 1") == "SELECT 1")
    assert(SqlCleanup.clean("sqlquery: SELECT 1") == "SELECT 1")
    assert(SqlCleanup.clean("SQL: SELECT 1") == "SELECT 1")
  }

  test("statement truncates at first semicolon (prompt rule 2)") {
    assert(SqlCleanup.clean("SELECT 1; DROP TABLE x;") == "SELECT 1")
  }

  test("semicolon inside single-quoted literal is data, not separator") {
    assert(SqlCleanup.clean("SELECT 'a;b' FROM t; trailing") ==
      "SELECT 'a;b' FROM t")
  }

  test("doubled-quote escape does not end the literal") {
    assert(SqlCleanup.clean("SELECT 'it''s; quoted' FROM t; x") ==
      "SELECT 'it''s; quoted' FROM t")
  }

  test("backslash escape does not end the literal") {
    assert(SqlCleanup.clean("SELECT 'a\\';b' FROM t; x") ==
      "SELECT 'a\\';b' FROM t")
  }

  test("semicolon inside double-quoted identifier is preserved") {
    assert(SqlCleanup.clean("SELECT \"a;b\" FROM t; x") ==
      "SELECT \"a;b\" FROM t")
  }

  test("null input yields empty string") {
    assert(SqlCleanup.clean(null) == "")
  }

  test("fence + prefix + semicolon combined") {
    assert(SqlCleanup.clean("```sql\nSQLQuery: SELECT a FROM t;\n```") ==
      "SELECT a FROM t")
  }
}
