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
    * The statement is PARSED and each [[UnresolvedRelation]] naming a
    * catalog table is replaced by the pinned snapshot's (already
    * analyzed) plan under a [[SubqueryAlias]] carrying the original
    * name — so `tbl.col` references and output column names resolve
    * unchanged, and a column or alias that merely *spells* like a table
    * name is never touched (the failure mode of the previous text-level
    * rewrite). No temp views, no shared session state: two concurrent
    * AS-OF queries at different snapshots cannot observe each other.
    */
  private def pinnedQuery(stmt: String, pinnedRead: String => DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    val spark = catalog.spark
    val byLower = catalog.listTables().map(t => t.toLowerCase -> t).toMap
    val pinned = scala.collection.mutable.HashMap.empty[String, LogicalPlan]
    val rewritten = GraftSqlShim.parsePlan(spark, stmt).transformUp {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 &&
          byLower.contains(u.multipartIdentifier.head.toLowerCase) =>
        val t = byLower(u.multipartIdentifier.head.toLowerCase)
        val plan = pinned.getOrElseUpdate(t, pinnedRead(t).queryExecution.analyzed)
        SubqueryAlias(u.multipartIdentifier.head, plan)
    }
    GraftSqlShim.ofRows(spark, rewritten)
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
