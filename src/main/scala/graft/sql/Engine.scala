package graft.sql

import java.sql.{Date, Timestamp}
import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, Row}

import graft.catalog.GraftCatalog

/** Executes one SQL statement against the catalog and renders the result
  * in the exact string shape the reference's downstream stages consume.
  *
  * Replaces `QuerySQLDataBaseTool(db).invoke(sql)` (`app-gradio.py:172-173`):
  * rows render as a Python-repr list of tuples — scalar `[(131,)]`
  * (`README.md:84`), empty `"[]"` (`app-gradio.py:176-181`) — because the
  * empty-check and the summarizer prompt key off that format
  * (`app-gradio.py:265-266`).
  */
final class Engine(catalog: GraftCatalog) {

  /** Parse-time hook order: cleanup → DDL/DML intercept → time-travel
    * rewrite → spark.sql. */
  def sql(raw: String): DataFrame = {
    val cleaned = SqlCleanup.clean(raw)
    SqlDdl.tryExecute(catalog, cleaned).getOrElse {
      val TimeTravelRewriter.Rewritten(stmt, asOf, version) =
        TimeTravelRewriter.rewrite(cleaned)
      (asOf, version) match {
        case (Some(ms), _)  => pinnedQuery(stmt, catalog.table(_, Some(ms)))
        case (_, Some(id))  => pinnedQuery(stmt, catalog.tableVersion(_, id))
        case _              => catalog.spark.sql(stmt)
      }
    }
  }

  /** Rule 3 applies the clause to *every* table (`app-gradio.py:138`).
    * Only the tables the statement references get pinned — via
    * `pinnedRead` (timestamp- or version-resolved snapshot) — each under
    * a per-query unique view name: two concurrent AS-OF queries at
    * different snapshots cannot see each other's pins, and nothing is
    * cached or eagerly materialized. Dropping the views right after
    * analysis is safe — the resolved plan holds the pinned snapshot's
    * concrete file set, which old snapshots keep (until `expire`).
    */
  private def pinnedQuery(stmt: String, pinnedRead: String => DataFrame): DataFrame = {
    val referenced = catalog.listTables().filter(SqlText.referencesTable(stmt, _))
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val views = referenced.map(t => t -> s"${t}_asof_$suffix")
    try {
      views.foreach { case (t, v) =>
        pinnedRead(t).createOrReplaceTempView(v)
      }
      val rewritten = views.foldLeft(stmt) { case (s, (t, v)) =>
        SqlText.replaceTableName(s, t, v)
      }
      catalog.spark.sql(rewritten) // analysis resolves the pinned views here
    } finally views.foreach { case (_, v) =>
      catalog.spark.catalog.dropTempView(v)
    }
  }

  /** `run` = execute + render; max `maxRows` rows are rendered (the
    * reference bounds results via injected LIMIT, `app-gradio.py:140`). */
  def run(raw: String, maxRows: Int = 1000): String =
    Engine.render(sql(raw).take(maxRows))

  def isEmpty(rendered: String): Boolean = rendered == SqlCleanup.EmptyResult
}

object Engine {

  /** Python-repr rendering of a result set: `[(v1, v2), (…)]`. */
  def render(rows: Array[Row]): String =
    if (rows.isEmpty) SqlCleanup.EmptyResult
    else rows.map(renderRow).mkString("[", ", ", "]")

  def renderRow(row: Row): String = {
    val vals = (0 until row.length).map(i => renderValue(row.get(i)))
    if (vals.length == 1) s"(${vals.head},)" else vals.mkString("(", ", ", ")")
  }

  /** Matches Python-repr of DBAPI values: None / ints / floats / quoted
    * strings / datetime.date / datetime.datetime. */
  def renderValue(v: Any): String = v match {
    case null => "None"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case d: Date =>
      val ld = d.toLocalDate
      s"datetime.date(${ld.getYear}, ${ld.getMonthValue}, ${ld.getDayOfMonth})"
    case t: Timestamp =>
      val dt = t.toInstant.atOffset(ZoneOffset.UTC)
      val micro = dt.getNano / 1000
      val base = s"datetime.datetime(${dt.getYear}, ${dt.getMonthValue}, " +
        s"${dt.getDayOfMonth}, ${dt.getHour}, ${dt.getMinute}, ${dt.getSecond}"
      if (micro == 0) base + ")" else base + s", $micro)"
    case f: Float => renderDouble(f.toDouble)
    case d: Double => renderDouble(d)
    case b: Boolean => if (b) "True" else "False"
    case a: Seq[_] => a.map(renderValue).mkString("[", ", ", "]")
    case other => other.toString
  }

  private def renderDouble(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e16) s"${d.toLong}.0"
    else d.toString
}
