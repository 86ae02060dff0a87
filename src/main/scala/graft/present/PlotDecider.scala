package graft.present

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{NumericType, StructType}

/** Deterministic form of the reference's plot-decision stage.
  *
  * The reference round-trips result + question through the LLM and parses
  * `{plottable, chart_type: bar|pie, title, x_label, y_label}` with a
  * true/False fix-up + `ast.literal_eval` (`app-gradio.py:195-217`), then
  * truncates to the first two columns (`app-gradio.py:224-228`). We encode
  * the decision it converges to as a rule: ≥2 rows × ≥2 columns with a
  * numeric second column is plottable; few-category results suit a pie.
  */
final case class PlotDecision(
    plottable: Boolean,
    chartType: String, // "bar" | "pie" | "none"
    title: String,
    xLabel: String,
    yLabel: String)

object PlotDecider {

  val MaxPieCategories = 6

  def decide(schema: StructType, rowCount: Long, question: String): PlotDecision = {
    val plottable = rowCount >= 2 && schema.length >= 2 &&
      schema.fields(1).dataType.isInstanceOf[NumericType]
    if (!plottable)
      PlotDecision(plottable = false, "none", "", "", "")
    else {
      val x = schema.fields(0).name
      val y = schema.fields(1).name
      val chart =
        if (rowCount <= MaxPieCategories &&
            (question.toLowerCase.contains("share") ||
             question.toLowerCase.contains("proportion") ||
             question.toLowerCase.contains("compare"))) "pie"
        else "bar"
      PlotDecision(plottable = true, chart, question.trim.stripSuffix("?"), x, y)
    }
  }

  /** 2-column truncation before plotting (`app-gradio.py:224-228`). */
  def truncateForPlot(df: DataFrame): DataFrame =
    if (df.columns.length <= 2) df
    else df.select(df.columns.take(2).toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)

  /** Serializable plot-spec (chart building itself is presentation, out of
    * engine scope — `app-gradio.py:230-252` maps 1:1 from this). */
  def toJson(d: PlotDecision): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"plottable": ${d.plottable}, "chart_type": ${q(d.chartType)}, """ +
      s""""title": ${q(d.title)}, "x_label": ${q(d.xLabel)}, "y_label": ${q(d.yLabel)}}"""
  }
}
