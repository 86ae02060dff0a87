package graft.translate

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic translator over the reference's own demo questions
  * (`/root/reference/README.md:74-79,113-117`, `app-gradio.py:114`).
  */
class RuleTranslatorSpec extends AnyFunSuite {
  private val t = new RuleTranslator()

  test("SQL questions pass through untranslated") {
    assert(t.toSql("SELECT 1 FROM x", "") == "SELECT 1 FROM x")
    assert(t.toSql("WITH a AS (SELECT 1) SELECT * FROM a", "")
      .startsWith("WITH a"))
  }

  test("the flagship postpaid question emits the README's query with top_k") {
    val sql = t.toSql("How many customers are subscribed to postpaid plans?", "", topK = 5)
    assert(sql.contains("JOIN subscriptions"))
    assert(sql.contains("IN (SELECT plan_id FROM plans WHERE plan_type = 'Postpaid')"))
    assert(sql.endsWith("LIMIT 5"))
  }

  test("captured dates flow into the emitted predicate, not a demo literal") {
    val sql = t.toSql("customers registered since 2024-03-15?", "", topK = 50)
    assert(sql.contains("registration_date >= '2024-03-15'"))
    assert(sql.endsWith("LIMIT 50"))
  }

  test("revenue comparison maps to the 3-table grouped join") {
    val sql = t.toSql("Compare total revenue between prepaid and postpaid plans", "")
    assert(sql.contains("GROUP BY p.plan_type"))
    assert(sql.contains("JOIN plans"))
  }

  test("unmatched questions fail loudly instead of guessing") {
    val e = intercept[IllegalArgumentException](
      t.toSql("what is the meaning of life", ""))
    assert(e.getMessage.contains("no rule"))
  }
}
