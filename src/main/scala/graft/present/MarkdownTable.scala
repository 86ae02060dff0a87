package graft.present

import org.apache.spark.sql.{DataFrame, Row}

/** Aligned pipe-table renderer (the reference formats DESCRIBE output into
  * a Markdown table for the chat UI, `all_in_one_PC.py:117-135`).
  */
object MarkdownTable {

  def render(df: DataFrame, maxRows: Int = 100): String =
    render(df.columns, df.take(maxRows))

  def render(columns: Array[String], rows: Array[Row]): String = {
    val cells: Array[Array[String]] =
      rows.map(r => (0 until r.length).map(i =>
        Option(r.get(i)).map(_.toString).getOrElse("NULL")).toArray)
    val widths = columns.indices.map { i =>
      (columns(i).length +: cells.map(_(i).length).toSeq).max
    }
    def line(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("| ", " | ", " |")
    (line(columns.toSeq) +: sep +: cells.map(c => line(c.toSeq)).toSeq).mkString("\n")
  }
}
