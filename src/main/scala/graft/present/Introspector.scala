package graft.present

import org.apache.spark.sql.Row

import graft.catalog.GraftCatalog

/** Schema-context assembly for the translation prompt.
  *
  * The reference feeds the LLM `{table_info}` = CREATE TABLE DDL + 10
  * sample rows per allow-listed table (`SQLDatabase.from_uri(...,
  * include_tables=…, sample_rows_in_table_info=10)`, `app-gradio.py:86-87`,
  * `README.md:11-12`). Tables outside the allow-list stay invisible.
  */
final class Introspector(
    catalog: GraftCatalog,
    includeTables: Option[Seq[String]] = None,
    sampleRows: Int = 10) {

  def tables: Seq[String] = {
    val all = catalog.listTables()
    includeTables.map(inc => all.filter(inc.contains(_))).getOrElse(all)
  }

  /** One table's context block: DDL + sample rows (tab-separated, the
    * LangChain table_info shape). */
  def tableInfo(name: String): String = {
    val df = catalog.table(name)
    val ddlCols = df.schema.fields
      .map(f => s"  ${f.name} ${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}")
      .mkString(",\n")
    val ddl = s"CREATE TABLE $name (\n$ddlCols\n)"
    val sample = df.limit(sampleRows).collect()
    val header = df.columns.mkString("\t")
    val rows = sample.map(renderSampleRow).mkString("\n")
    s"""$ddl
       |
       |/*
       |$sampleRows rows from $name table:
       |$header
       |$rows
       |*/""".stripMargin
  }

  def tableInfo: String = tables.map(tableInfo).mkString("\n\n")

  private def renderSampleRow(r: Row): String =
    (0 until r.length).map { i =>
      val v = r.get(i)
      if (v == null) "None" else v.toString
    }.mkString("\t")
}
