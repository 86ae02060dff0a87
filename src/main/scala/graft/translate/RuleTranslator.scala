package graft.translate

/** Deterministic offline translator: pattern-matches the question shapes
  * the reference demonstrates (`README.md:75-79,113-117`,
  * `app-gradio.py:114`) so end-to-end tests run with zero network.
  *
  * Not a general NL→SQL system — a rule table keyed on the reference's own
  * demo questions plus a passthrough for questions that already are SQL.
  */
final class RuleTranslator(rules: Seq[(String, String)] = RuleTranslator.defaults)
    extends QueryTranslator {

  override def toSql(question: String, tableInfo: String, topK: Int = 50): String = {
    val q = question.toLowerCase
    if (q.trim.startsWith("select ") || q.trim.startsWith("with ")) return question
    rules.view.flatMap { case (pat, sql) =>
      pat.r.findFirstMatchIn(q).map { m =>
        // $1..$9 in the SQL template substitute the pattern's capture
        // groups, so e.g. the date in "registered since 2025-08-19" lands
        // in the emitted predicate instead of a hard-coded demo literal.
        val withGroups = (1 to m.groupCount).foldLeft(sql) { (acc, i) =>
          acc.replace(s"$$$i", Option(m.group(i)).getOrElse(""))
        }
        withGroups.replace("{top_k}", topK.toString)
      }
    }.headOption.getOrElse(
      throw new IllegalArgumentException(s"RuleTranslator has no rule for: $question"))
  }
}

object RuleTranslator {

  /** Golden questions from the reference's own logs/UI. */
  val defaults: Seq[(String, String)] = Seq(
    // README.md:74-79 flagship
    ("how many customers.*postpaid",
      "SELECT COUNT(*) FROM customers JOIN subscriptions ON customers.customer_id" +
      " = subscriptions.customer_id WHERE subscriptions.plan_id IN" +
      " (SELECT plan_id FROM plans WHERE plan_type = 'Postpaid') LIMIT {top_k}"),
    // README.md:113-117 — the captured date flows into the predicate
    ("registered since (\\d{4}-\\d{2}-\\d{2})",
      "SELECT COUNT(*) FROM customers WHERE registration_date >= '$1' LIMIT {top_k}"),
    // app-gradio.py:114 placeholder question
    ("compare total revenue between prepaid and postpaid",
      "SELECT p.plan_type, SUM(r.amount) AS total_revenue FROM recharges r" +
      " JOIN subscriptions s ON r.customer_id = s.customer_id" +
      " JOIN plans p ON s.plan_id = p.plan_id GROUP BY p.plan_type LIMIT {top_k}"),
    ("max.*customer",
      "SELECT MAX(customer_id) FROM customers"),
    ("how many customers",
      "SELECT COUNT(*) FROM customers")
  )
}
