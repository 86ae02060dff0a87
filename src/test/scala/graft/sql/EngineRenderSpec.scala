package graft.sql

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden renders for the result-string contract: the reference's
  * downstream stages key off the exact Python-repr tuple-list shape —
  * `[(131,)]` (`/root/reference/README.md:84`), empty `"[]"`
  * (`/root/reference/app-gradio.py:176-181`).
  */
class EngineRenderSpec extends AnyFunSuite {

  test("scalar count renders as [(131,)]") {
    assert(Engine.render(Array(Row(131))) == "[(131,)]")
  }

  test("empty result renders as []") {
    assert(Engine.render(Array.empty[Row]) == "[]")
    assert(Engine.render(Array.empty[Row]) == SqlCleanup.EmptyResult)
  }

  test("multi-column row renders as a tuple") {
    assert(Engine.render(Array(Row("Postpaid", 42))) == "[('Postpaid', 42)]")
  }

  test("multiple rows are comma-joined") {
    assert(Engine.render(Array(Row(1), Row(2))) == "[(1,), (2,)]")
  }

  test("date renders as datetime.date") {
    assert(Engine.renderValue(Date.valueOf("2025-08-19")) ==
      "datetime.date(2025, 8, 19)")
  }

  test("timestamp renders as datetime.datetime, micros only when nonzero") {
    assert(Engine.renderValue(Timestamp.valueOf("2025-08-19 10:20:30")) ==
      "datetime.datetime(2025, 8, 19, 10, 20, 30)")
    val t = Timestamp.valueOf("2025-08-19 10:20:30.5")
    assert(Engine.renderValue(t) ==
      "datetime.datetime(2025, 8, 19, 10, 20, 30, 500000)")
  }

  test("null renders as None, booleans as True/False") {
    assert(Engine.renderValue(null) == "None")
    assert(Engine.renderValue(true) == "True")
    assert(Engine.renderValue(false) == "False")
  }

  test("integral doubles keep a .0 suffix like Python repr") {
    assert(Engine.renderValue(5.0d) == "5.0")
    assert(Engine.renderValue(5.25d) == "5.25")
    assert(Engine.renderValue(5.0f) == "5.0")
  }

  test("strings are quoted with escapes") {
    assert(Engine.renderValue("it's") == "'it\\'s'")
    assert(Engine.renderValue("a\\b") == "'a\\\\b'")
  }

  test("arrays render as Python lists") {
    assert(Engine.renderValue(Seq(1, 2)) == "[1, 2]")
  }
}
