package graft.app

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.catalog.GraftCatalog
import graft.ingest.TelcoDataGen
import graft.present.Introspector
import graft.sql.Engine
import graft.translate.{QueryTranslator, RuleTranslator}

/** Golden end-to-end transcript of the composed predict() lifecycle,
  * replaying the reference's README flagship interaction
  * (`/root/reference/README.md:68-86`): NL question → generated SQL with
  * join + IN-subquery + LIMIT → `[(N,)]` scalar render → extracted prose
  * answer — with the staged status messages in the reference's exact
  * order (`app-gradio.py:119-284`).
  */
class PredictorSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private lazy val fixture: (GraftCatalog, Predictor) = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft-pred"), spark)
    cat.createDatabase("telco"); cat.use("telco")
    val gen = new TelcoDataGen(spark)
    cat.createTable("customers", TelcoDataGen.customersSchema)
    cat.createTable("plans", TelcoDataGen.plansSchema)
    cat.createTable("subscriptions", TelcoDataGen.subscriptionsSchema)
    cat.append("customers", gen.customers(200), 1000L)
    cat.append("plans", gen.plans(), 1000L)
    cat.append("subscriptions", gen.subscriptions(1 to 200), 1000L)
    val p = new Predictor(new Engine(cat), new RuleTranslator(),
      new Introspector(cat), topK = 5)
    (cat, p)
  }

  private val FlagshipSql =
    "SELECT COUNT(*) FROM customers JOIN subscriptions ON " +
      "customers.customer_id = subscriptions.customer_id WHERE " +
      "subscriptions.plan_id IN (SELECT plan_id FROM plans WHERE " +
      "plan_type = 'Postpaid') LIMIT 5"

  test("flagship interaction: golden staged transcript") {
    val (_, predictor) = fixture
    val emitted = Seq.newBuilder[String]
    val r = predictor.predict(
      "How many customers are subscribed to postpaid plans?", emitted += _)
    // the staged transcript, verbatim and in order
    assert(r.stages == Seq(
      "🤔 Thinking...",
      s"🏃 Running query...\n```sql\n$FlagshipSql\n```",
      "✍️ Summarizing the results...",
      "The answer to your question is: 110."))
    // emit saw exactly the same sequence as it happened
    assert(emitted.result() == r.stages)
    assert(r.sql.contains(FlagshipSql))
    assert(r.rendered.contains("[(110,)]")) // the `[(131,)]` shape, README.md:84
    assert(r.answer == "The answer to your question is: 110.")
    assert(r.plot.isEmpty) // single scalar is not plottable
    assert(!r.failed)
  }

  test("empty result short-circuits with the fixed no-records answer") {
    val (_, predictor) = fixture
    val r = predictor.predict(
      "SELECT customer_id FROM customers WHERE customer_id < 0")
    assert(r.answer ==
      "The query ran successfully but found no matching records in the database.")
    assert(r.rendered.contains("[]"))
    assert(r.stages.size == 3) // thinking, running, no-records — no summary stage
    assert(r.plot.isEmpty && !r.failed)
  }

  test("plottable result carries the plot decision into the final answer") {
    val (_, predictor) = fixture
    val r = predictor.predict(
      "SELECT plan_type, COUNT(*) AS cnt FROM plans GROUP BY plan_type ORDER BY plan_type")
    assert(r.plot.isDefined)
    assert(r.plot.get.chartType == "bar")
    assert(r.stages.exists(_.startsWith("✍️")))
    assert(!r.failed)
  }

  test("translation failure yields the SQL-generation error and stops") {
    val (_, predictor) = fixture
    val r = predictor.predict("what is the meaning of life?")
    assert(r.failed)
    assert(r.answer.startsWith("❌ **Error during SQL generation:**"))
    assert(r.sql.isEmpty && r.rendered.isEmpty)
    assert(r.stages.last == r.answer)
  }

  test("rejected query yields the database error with the SQL inline") {
    val (cat, _) = fixture
    val failing = new Predictor(new Engine(cat),
      new QueryTranslator {
        override def toSql(q: String, info: String, topK: Int): String =
          "SELECT no_such_column FROM customers"
      },
      new Introspector(cat))
    val r = failing.predict("anything")
    assert(r.failed)
    assert(r.answer.startsWith("❌ **Error during database query:**"))
    assert(r.answer.contains("SELECT no_such_column FROM customers"))
    assert(r.sql.isDefined && r.rendered.isEmpty)
  }

  test("ChatSession: multi-turn history with in-place assistant updates") {
    val (_, predictor) = fixture
    val session = new ChatSession(predictor)
    val states = Seq.newBuilder[Seq[ChatMessage]]
    val r1 = session.ask(
      "How many customers are subscribed to postpaid plans?", states += _)
    // generator contract: [user, thinking] then the SAME slot rewritten
    val s1 = states.result()
    assert(s1.head.map(_.role) == Seq("user", "assistant"))
    assert(s1.head.last.content == "\ud83e\udd14 Thinking...")
    assert(s1.forall(_.size == 2), "stages must rewrite history[-1], not append")
    assert(s1.last.last.content == r1.answer)
    assert(session.history.size == 2)
    // second turn appends a new pair; the first pair is untouched
    val r2 = session.ask(
      "SELECT customer_id FROM customers WHERE customer_id < 0")
    assert(session.history.size == 4)
    assert(session.history(1).content == r1.answer)
    assert(session.history(3).content == r2.answer)
    assert(session.history.map(_.role) ==
      Seq("user", "assistant", "user", "assistant"))
    assert(session.visiblePlot.isEmpty) // empty result: pane hidden
    // plottable turn shows the pane; clear hides it and empties the chat
    session.ask("SELECT plan_type, COUNT(*) AS cnt FROM plans " +
      "GROUP BY plan_type ORDER BY plan_type")
    assert(session.visiblePlot.isDefined)
    session.clear()
    assert(session.history.isEmpty && session.visiblePlot.isEmpty)
  }
}
