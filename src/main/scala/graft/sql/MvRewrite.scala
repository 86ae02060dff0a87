package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.store.MaterializedView
import graft.store.MaterializedView.{AggSpec, MvDef}

/** Aggregate navigation: answer a GROUP BY query from a FRESH
  * materialized view instead of scanning the base table — the query
  * rewrite every warehouse pairs with its MVs (Impala/Oracle "query
  * rewrite", Calcite's aggregate-materialization rule). The reference's
  * dashboard questions are exactly this shape (`README.md:74-85`), so at
  * 100 TB the rewrite turns its hottest query class from a full scan
  * into a read of a view that is typically MBs.
  *
  * Soundness gates, all of which must hold or the query falls through to
  * the scan path untouched:
  *   - the statement parses to the restricted shape
  *     `SELECT items FROM t [WHERE pred] GROUP BY cols [ORDER BY cols]`
  *     (single bare relation, no HAVING/LIMIT/joins);
  *   - a materialized view on `t` is FRESH (its recorded base snapshot
  *     IS the base's current snapshot — a stale view never answers);
  *   - the query's group columns are a subset of the view's (re-grouping
  *     coarser is a merge of mergeable state — the roll-up property);
  *   - every aggregate derives from the view's state: count(*)/count(x)
  *     and sum(x) re-sum their state column, min/max re-extremize,
  *     avg(x) re-derives from its (sum, count) state pair;
  *   - the WHERE predicate references only the view's GROUP BY columns
  *     (group-level filters commute with the re-aggregation; a filter on
  *     any other column would need base rows the state no longer has).
  */
object MvRewrite {

  private val Shape =
    ("(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+`?([A-Za-z_]\\w*)`?" +
      "(?:\\s+WHERE\\s+(.+?))?" +
      "\\s+GROUP\\s+BY\\s+(.+?)" +
      "(?:\\s+ORDER\\s+BY\\s+(.+?))?\\s*$").r
  private val AggItem =
    "(?is)^\\s*(count|sum|min|max|avg)\\s*\\(\\s*(\\*|`?[A-Za-z_]\\w*`?)\\s*\\)\\s+AS\\s+`?([A-Za-z_]\\w*)`?\\s*$".r
  private val BareItem = "(?is)^\\s*`?([A-Za-z_]\\w*)`?\\s*$".r
  private val OrderItem =
    "(?is)^\\s*`?([A-Za-z_]\\w*)`?(?:\\s+(ASC|DESC))?\\s*$".r

  /** One SELECT item, in query order. */
  private sealed trait Item
  private final case class GroupItem(col: String) extends Item
  private final case class AggItemSpec(spec: AggSpec) extends Item

  /** Try to answer `stmt` from a fresh materialized view of the session
    * catalog's current database. None = not rewritable; run the scan. */
  def tryRewrite(catalog: GraftCatalog, stmt: String): Option[DataFrame] =
    stmt match {
      case Shape(items, table, whereOpt, groupBy, orderOpt) =>
        for {
          parsed <- parseItems(items, groupBy)
          (queryGroups, queryAggs) = split(parsed)
          whereCols <- Option(whereOpt) match {
            case None => Some(Seq.empty[String])
            case Some(c) => whereRefs(catalog, c)
          }
          sortKeys <- parseOrder(Option(orderOpt), parsed)
          (mvName, d) <- candidates(catalog, table).find { case (_, d) =>
            derivable(d, queryGroups, queryAggs, whereCols)
          }
        } yield answer(catalog, mvName, d, parsed,
          Option(whereOpt), sortKeys)
      case _ => None
    }

  /** ORDER BY items must be output columns of the query (anything else
    * cannot resolve over the rewritten frame — fall through). None =
    * unsupported shape; Some(Seq.empty) = no ORDER BY. */
  private def parseOrder(order: Option[String],
      items: Seq[Item]): Option[Seq[Column]] = {
    val outNames = items.map {
      case GroupItem(c) => c.toLowerCase
      case AggItemSpec(a) => a.alias.toLowerCase
    }
    order match {
      case None => Some(Seq.empty)
      case Some(o) =>
        val parsed = o.split(",").toSeq.map(_.trim).map {
          case OrderItem(c, dir) if outNames.contains(c.toLowerCase) =>
            Some(if (dir != null && dir.equalsIgnoreCase("DESC")) col(c).desc
              else col(c).asc)
          case _ => None
        }
        if (parsed.forall(_.isDefined)) Some(parsed.flatten) else None
    }
  }

  // ---- parsing ----------------------------------------------------

  private def parseItems(items: String,
      groupBy: String): Option[Seq[Item]] = {
    val groupCols = groupBy.split(",").toSeq.map(_.trim
      .stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
    if (!groupCols.forall(_.matches("[A-Za-z_]\\w*"))) return None
    val parsed = SqlText.splitTopLevel(items).map {
      case AggItem(f, arg, alias) =>
        val in = arg.trim.stripPrefix("`").stripSuffix("`")
        Some(AggItemSpec(AggSpec(f.toLowerCase,
          if (in == "*") None else Some(in), alias)))
      case BareItem(c) if groupCols.exists(_.equalsIgnoreCase(c)) =>
        Some(GroupItem(c))
      case _ => None
    }
    // every GROUP BY column must be selected, or the rewrite's output
    // columns could not line up with the scan's
    if (parsed.forall(_.isDefined) &&
        groupCols.forall(g => parsed.flatten.exists {
          case GroupItem(c) => c.equalsIgnoreCase(g)
          case _ => false
        }))
      Some(parsed.flatten)
    else None
  }

  private def split(items: Seq[Item]): (Seq[String], Seq[AggSpec]) =
    (items.collect { case GroupItem(c) => c },
      items.collect { case AggItemSpec(a) => a })

  // ---- candidate views --------------------------------------------

  private def candidates(catalog: GraftCatalog,
      table: String): Seq[(String, MvDef)] = {
    val store = catalog.store()
    catalog.listTables()
      .filter(t => MaterializedView.isMaterializedView(store, t))
      .map(t => t -> MaterializedView.definition(store, t))
      .filter { case (name, d) =>
        d.base.equalsIgnoreCase(table) &&
          store.exists(d.base) &&
          // freshness: the state covers exactly the base's current
          // snapshot; anything else must scan
          store.currentSnapshotId(d.base).contains(
            MaterializedView.watermark(store, name))
      }
  }

  /** Column names a parsed WHERE predicate references. None = the
    * predicate didn't parse (never rewrite on a guess). */
  private def whereRefs(catalog: GraftCatalog,
      cond: String): Option[Seq[String]] =
    try {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      val e = catalog.spark.sessionState.sqlParser.parseExpression(cond)
      Some(e.collect { case a: UnresolvedAttribute => a.name }.toSeq)
    } catch { case _: Exception => None }

  private def derivable(d: MvDef, queryGroups: Seq[String],
      queryAggs: Seq[AggSpec], whereCols: Seq[String]): Boolean = {
    def hasGroup(c: String) = d.groupCols.exists(_.equalsIgnoreCase(c))
    queryGroups.forall(hasGroup) &&
      queryAggs.forall(a => stateSource(d, a).isDefined) &&
      whereCols.forall(hasGroup)
  }

  /** The view agg whose state answers query agg `a`, if any. */
  private def stateSource(d: MvDef, a: AggSpec): Option[AggSpec] =
    d.aggs.find(m => m.func == a.func &&
      m.input.map(_.toLowerCase) == a.input.map(_.toLowerCase))

  // ---- answering --------------------------------------------------

  private def answer(catalog: GraftCatalog, mvName: String, d: MvDef,
      items: Seq[Item], where: Option[String],
      sortKeys: Seq[Column]): DataFrame = {
    val store = catalog.store()
    val state = store.read(mvName)
    val filtered = where.fold(state)(c => state.filter(expr(c)))
    val groups = items.collect { case GroupItem(c) => c }
    val aggCols: Seq[Column] = items.collect { case AggItemSpec(a) =>
      val src = stateSource(d, a).get
      a.func match {
        case "count" => sum(col(src.alias)).cast("long").as(a.alias)
        case "sum" => sum(col(src.alias)).as(a.alias)
        case "min" => min(col(src.alias)).as(a.alias)
        case "max" => max(col(src.alias)).as(a.alias)
        case "avg" =>
          (sum(col(s"__mv_sum_${src.alias}")) /
            sum(col(s"__mv_cnt_${src.alias}"))).as(a.alias)
      }
    }
    val grouped = filtered.groupBy(groups.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    // re-project to the query's item order
    val out = grouped.select(items.map {
      case GroupItem(c) => col(c)
      case AggItemSpec(a) => col(a.alias)
    }: _*)
    if (sortKeys.isEmpty) out else out.orderBy(sortKeys: _*)
  }
}
