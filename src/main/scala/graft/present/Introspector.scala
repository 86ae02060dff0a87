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
    * LangChain table_info shape). When `COMPUTE STATS` has run, a
    * compact per-column stats line rides along — row counts, NDV, and
    * value ranges ground the LLM's join-key and filter choices the same
    * way they ground Impala's planner, at zero extra scan cost (the
    * stats are read from the table's persisted `stats.json`). */
  def tableInfo(name: String): String = {
    val df = catalog.table(name)
    val ddlCols = df.schema.fields
      .map(f => s"  ${f.name} ${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}")
      .mkString(",\n")
    val ddl = s"CREATE TABLE $name (\n$ddlCols\n)"
    val sample = df.limit(sampleRows).collect()
    val header = df.columns.mkString("\t")
    val rows = sample.map(renderSampleRow).mkString("\n")
    val stats = graft.store.TableStats.readStats(catalog.store(), name)
      .map { s =>
        val cols = s.cols.map { c =>
          val range = (c.min, c.max) match {
            case (Some(lo), Some(hi)) => s" range=[$lo, $hi]"
            case _ => ""
          }
          s"${c.column}: ndv=${c.ndv} nulls=${c.nullCount}$range"
        }.mkString("\n")
        s"\n\n/*\nstats (${s.rowCount} rows):\n$cols\n*/"
      }.getOrElse("")
    s"""$ddl
       |
       |/*
       |$sampleRows rows from $name table:
       |$header
       |$rows
       |*/""".stripMargin + stats
  }

  def tableInfo: String = tables.map(tableInfo).mkString("\n\n")

  private def renderSampleRow(r: Row): String =
    (0 until r.length).map { i =>
      val v = r.get(i)
      if (v == null) "None" else v.toString
    }.mkString("\t")
}
