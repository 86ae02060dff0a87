package graft.app

import scala.util.control.NonFatal

import graft.present.{Introspector, PlotDecider, PlotDecision, Summarizer}
import graft.sql.{Engine, SqlCleanup}
import graft.translate.QueryTranslator

/** Outcome of one full predict() lifecycle. `stages` is the ordered
  * transcript of assistant-visible status messages — the same sequence the
  * reference's generator yields into the chat UI. */
final case class PredictResult(
    sql: Option[String],
    rendered: Option[String],
    plot: Option[PlotDecision],
    answer: String,
    stages: Seq[String]) {
  def failed: Boolean = answer.startsWith(Predictor.ErrorMark)
}

/** The reference's core product, composed: one function from NL question
  * to staged answer, wiring translator → engine → empty-check → plot
  * decision → summary exactly in the order of `app-gradio.py:119-284`.
  *
  * Stage yields (each also passed to `emit` as it happens, so a UI can
  * stream like the reference's Gradio generator):
  *   1. "🤔 Thinking..."                                (`app-gradio.py:125`)
  *   2. "🏃 Running query...\n```sql\n…\n```"          (`app-gradio.py:167`)
  *   3. empty result → fixed no-records answer, stop   (`app-gradio.py:176-181`)
  *   4. "✍️ Summarizing the results..."                 (`app-gradio.py:259`)
  *   5. the final summary (with the plot decision attached)
  *
  * Error contract mirrors the reference: a translation failure or a
  * rejected query produces a "❌ …" answer and stops the pipeline — it
  * never fabricates a summary over a failed query
  * (`app-gradio.py:160-165,183-188`).
  */
final class Predictor(
    engine: Engine,
    translator: QueryTranslator,
    introspector: Introspector,
    topK: Int = 50,
    maxRows: Int = 1000) {

  import Predictor._

  def predict(question: String, emit: String => Unit = _ => ()): PredictResult = {
    val stages = Seq.newBuilder[String]
    def stage(msg: String): Unit = { stages += msg; emit(msg) }

    stage(Thinking)

    // --- Step 1: NL → SQL over the schema context -----------------------
    val sql =
      try SqlCleanup.clean(translator.toSql(question, introspector.tableInfo, topK))
      catch {
        case NonFatal(e) =>
          val msg = s"$ErrorMark **Error during SQL generation:**\n\n" +
            s"I encountered an issue creating the SQL query. (${e.getMessage})"
          stage(msg)
          return PredictResult(None, None, None, msg, stages.result())
      }
    stage(s"$Running\n```sql\n$sql\n```")

    // --- Step 2: execute ------------------------------------------------
    val (rendered, schema, rowCount) =
      try {
        val df = engine.sql(sql)
        val rows = df.take(maxRows)
        (Engine.render(rows), df.schema, rows.length.toLong)
      } catch {
        case NonFatal(e) =>
          val msg = s"$ErrorMark **Error during database query:**\n\n" +
            s"The database rejected the following query:\n```sql\n$sql\n```\n" +
            s"**Error Details:**\n`${e.getMessage}`"
          stage(msg)
          return PredictResult(Some(sql), None, None, msg, stages.result())
      }
    if (engine.isEmpty(rendered)) {
      stage(NoRecords)
      return PredictResult(Some(sql), Some(rendered), None, NoRecords, stages.result())
    }

    // --- Step 2.5: plot decision (failure here never kills the answer,
    // `app-gradio.py:254-257`) -------------------------------------------
    val plot =
      try {
        val d = PlotDecider.decide(schema, rowCount, question)
        if (d.plottable) Some(d) else None
      } catch { case NonFatal(_) => None }

    stage(Summarizing)

    // --- Step 3: summarize ----------------------------------------------
    val answer = Summarizer.summarize(question, rendered)
    stage(answer)
    PredictResult(Some(sql), Some(rendered), plot, answer, stages.result())
  }
}

object Predictor {
  val Thinking = "🤔 Thinking..."
  val Running = "🏃 Running query..."
  val Summarizing = "✍️ Summarizing the results..."
  val NoRecords =
    "The query ran successfully but found no matching records in the database."
  val ErrorMark = "❌"
}
