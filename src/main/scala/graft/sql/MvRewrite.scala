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
  *     `SELECT items FROM t [WHERE pred] GROUP BY cols [HAVING pred]
  *     [ORDER BY cols] [LIMIT n]` (single bare relation, no joins) —
  *     LIMIT matters because the reference's prompt appends "Limit the
  *     number of results to {top_k}" to every question
  *     (`app-gradio.py:134-141`), so top-k dashboards are the hottest
  *     emitted shape; HAVING folds aggregate calls that repeat a SELECT
  *     item onto that item's alias, then must reference only output
  *     columns;
  *   - a materialized view on `t` is FRESH (its recorded base snapshot
  *     IS the base's current snapshot — a stale view never answers);
  *   - the query's group columns are a subset of the view's (re-grouping
  *     coarser is a merge of mergeable state — the roll-up property);
  *   - every aggregate derives from the view's state: count(*)/count(x)
  *     and sum(x) re-sum their state column, min/max re-extremize,
  *     avg(x) re-derives from its (sum, count) state pair;
  *   - the WHERE predicate references only the view's GROUP BY columns
  *     (group-level filters commute with the re-aggregation; a filter on
  *     any other column would need base rows the state no longer has) —
  *     EXCEPT against a PARTIAL view, where the query's WHERE must spell
  *     the view's own stored filter (already baked into the state).
  */
object MvRewrite {

  // GROUP BY is optional: a global `SELECT sum(x) AS s FROM t` merges
  // the WHOLE state — the ungrouped dashboard total the metadata tier
  // cannot answer (it covers only COUNT/MIN/MAX)
  private val Shape =
    ("(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+`?([A-Za-z_]\\w*)`?" +
      "(?:\\s+WHERE\\s+(.+?))?" +
      "(?:\\s+GROUP\\s+BY\\s+(.+?))?" +
      "(?:\\s+HAVING\\s+(.+?))?" +
      "(?:\\s+ORDER\\s+BY\\s+(.+?))?" +
      "(?:\\s+LIMIT\\s+(\\d+))?\\s*$").r
  private val AggItem =
    ("(?is)^\\s*(count|sum|min|max|avg|approx_count_distinct)\\s*\\(\\s*" +
      "(\\*|`?[A-Za-z_]\\w*`?)\\s*\\)\\s+AS\\s+`?([A-Za-z_]\\w*)`?\\s*$").r
  // COUNT(DISTINCT x) where x is one of the VIEW's group columns is
  // exactly derivable: the state holds one row per live group
  // combination, so the distinct x's inside any coarser group are the
  // distinct x's over those state rows — no distinct-state sketch needed
  private val CountDistinctItem =
    "(?is)^\\s*count\\s*\\(\\s*DISTINCT\\s+`?([A-Za-z_]\\w*)`?\\s*\\)\\s+AS\\s+`?([A-Za-z_]\\w*)`?\\s*$".r
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
      case Shape(items, table, whereOpt, groupBy, havingOpt, orderOpt,
          limitOpt) =>
        for {
          parsed <- parseItems(items, Option(groupBy).getOrElse(""))
          (queryGroups, queryAggs) = split(parsed)
          whereCols <- Option(whereOpt) match {
            case None => Some(Seq.empty[String])
            case Some(c) => whereRefs(catalog, c)
          }
          having <- parseHaving(catalog, Option(havingOpt), parsed)
          sortKeys <- parseOrder(Option(orderOpt), parsed)
          (mvName, d, residual) <- candidates(catalog, table)
            .iterator.flatMap { case (n, d) =>
              if (derivable(d, queryGroups, queryAggs))
                stateFilter(d, Option(whereOpt), whereCols)
                  .map(res => (n, d, res))
              else None
            }.nextOption()
        } yield answer(catalog, mvName, d, parsed, residual,
          having, sortKeys, Option(limitOpt).map(_.toInt))
      case _ => None
    }

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim

  /** Whether this view can satisfy the query's WHERE, and with what
    * residual filter over the STATE. Unfiltered view: any predicate on
    * view group columns applies to state (it commutes with the merge).
    * PARTIAL view (stored filter f): the query must spell the same
    * predicate — the filter is already baked into the state, so the
    * residual is empty; any other predicate (or none — the view is a
    * subset of the base) cannot be answered. None = incompatible. */
  private def stateFilter(d: MvDef, where: Option[String],
      whereCols: Seq[String]): Option[Option[String]] = {
    def onGroups = whereCols.forall(c =>
      d.groupCols.exists(_.equalsIgnoreCase(c)))
    d.filter match {
      case None => if (onGroups) Some(where) else None
      case Some(f) => where match {
        case Some(w) if norm(w) == norm(f) => Some(None)
        case _ => None
      }
    }
  }

  /** HAVING over the rewritten frame: aggregate calls that textually
    * repeat a SELECT item fold to that item's alias (the common
    * `HAVING count(*) > 5` spelling), then every remaining column
    * reference must be an output column. None = unsupported; Some(None)
    * = no HAVING. */
  private def parseHaving(catalog: GraftCatalog, having: Option[String],
      items: Seq[Item]): Option[Option[String]] = having match {
    case None => Some(None)
    case Some(h) =>
      val folded = items.foldLeft(h) {
        case (acc, AggItemSpec(a)) =>
          val arg = a.input.map(java.util.regex.Pattern.quote)
            .getOrElse("\\*")
          val callPat =
            if (a.func == "count_distinct")
              s"count\\s*\\(\\s*DISTINCT\\s+$arg\\s*\\)"
            else s"${a.func}\\s*\\(\\s*$arg\\s*\\)"
          acc.replaceAll(s"(?i)\\b$callPat", a.alias)
        case (acc, _) => acc
      }
      val outNames = items.map {
        case GroupItem(c) => c.toLowerCase
        case AggItemSpec(a) => a.alias.toLowerCase
      }.toSet
      // after folding, the predicate must be function-free over output
      // columns — a residual aggregate call (e.g. HAVING count(*) when
      // count(*) is not a SELECT item) cannot run over the rewritten
      // frame and must fall through to the scan
      try {
        import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
        val e = catalog.spark.sessionState.sqlParser.parseExpression(folded)
        val hasFunc = e.collectFirst { case f: UnresolvedFunction => f }.isDefined
        val refs = e.collect { case a: UnresolvedAttribute => a.name }
        if (!hasFunc && refs.forall(r => outNames(r.toLowerCase)))
          Some(Some(folded))
        else None
      } catch { case _: Exception => None }
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
      case CountDistinctItem(in, alias) =>
        Some(AggItemSpec(AggSpec("count_distinct", Some(in), alias)))
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
      queryAggs: Seq[AggSpec]): Boolean = {
    def isGroup(c: String) = d.groupCols.exists(_.equalsIgnoreCase(c))
    queryGroups.forall(isGroup) &&
      queryAggs.forall {
        case AggSpec("count_distinct", Some(in), _) => isGroup(in)
        case a => stateSource(d, a).isDefined
      }
  }

  /** The view agg whose state answers query agg `a`, if any. */
  private def stateSource(d: MvDef, a: AggSpec): Option[AggSpec] =
    d.aggs.find(m => m.func == a.func &&
      m.input.map(_.toLowerCase) == a.input.map(_.toLowerCase))

  // ---- answering --------------------------------------------------

  private def answer(catalog: GraftCatalog, mvName: String, d: MvDef,
      items: Seq[Item], where: Option[String], having: Option[String],
      sortKeys: Seq[Column], limit: Option[Int]): DataFrame = {
    val store = catalog.store()
    val state = store.read(mvName)
    val filtered = where.fold(state)(c => state.filter(expr(c)))
    val groups = items.collect { case GroupItem(c) => c }
    val aggCols: Seq[Column] = items.collect { case AggItemSpec(a) =>
      if (a.func == "count_distinct")
        countDistinct(col(a.input.get)).as(a.alias)
      else {
      val src = stateSource(d, a).get
      a.func match {
        // coalesce: a GLOBAL merge over an empty state must render 0
        // like the scan's COUNT would, not sum's NULL
        case "count" =>
          coalesce(sum(col(src.alias)), lit(0L)).cast("long").as(a.alias)
        case "sum" =>
          // retraction-era state keeps a non-null input count beside
          // each sum: a group whose non-null inputs were all retracted
          // must render NULL (the scan's sum), not the zeroed state
          if (state.columns.exists(_.equalsIgnoreCase(s"__mv_cnt_${src.alias}")))
            when(sum(col(s"__mv_cnt_${src.alias}")) > 0,
              sum(col(src.alias))).otherwise(lit(null)).as(a.alias)
          else sum(col(src.alias)).as(a.alias)
        case "min" => min(col(src.alias)).as(a.alias)
        case "max" => max(col(src.alias)).as(a.alias)
        case "avg" =>
          (sum(col(s"__mv_sum_${src.alias}")) /
            sum(col(s"__mv_cnt_${src.alias}"))).as(a.alias)
        // HLL sketches of the view's (finer) groups union into the
        // sketch of any coarser group — same mergeability the refresh
        // path relies on. CONTRACT NOTE: the rewritten answer comes from
        // a DataSketches HLL sketch while the unrewritten plan uses
        // Spark's native HLL++ — beyond the sketches' exact range the
        // two estimates can differ for the same data. Acceptable for an
        // explicitly approximate function (both honor their own error
        // bounds), but callers comparing rewritten vs direct plans
        // should expect estimate drift, not bit-equality.
        case "approx_count_distinct" =>
          // coalesce: a GLOBAL union over an empty state renders 0 like
          // the scan's APPROX_COUNT_DISTINCT, not null
          coalesce(hll_sketch_estimate(hll_union_agg(col(src.alias))),
            lit(0L)).as(a.alias)
      }
      }
    }
    val grouped = filtered.groupBy(groups.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    // re-project to the query's item order
    val projected = grouped.select(items.map {
      case GroupItem(c) => col(c)
      case AggItemSpec(a) => col(a.alias)
    }: _*)
    val afterHaving = having.fold(projected)(h => projected.filter(expr(h)))
    val sorted =
      if (sortKeys.isEmpty) afterHaving else afterHaving.orderBy(sortKeys: _*)
    limit.fold(sorted)(sorted.limit)
  }
}
