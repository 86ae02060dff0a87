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
  // Impala/Spark EXPLAIN parity: render the plan the engine would run —
  // through EVERY tier (time travel, metadata-answered aggregates,
  // materialized-view navigation), so EXPLAIN shows when a query is
  // answered from a view or metadata instead of a scan.
  private val ExplainStmt =
    "(?is)^\\s*EXPLAIN\\s+(?:(EXTENDED|FORMATTED|CODEGEN|COST)\\s+)?((?:SELECT|WITH)\\b.+)$".r

  def sql(raw: String): DataFrame = {
    val cleaned = SqlCleanup.clean(raw)
    cleaned match {
      case ExplainStmt(mode, inner) =>
        val planned = sql(inner)
        val m = org.apache.spark.sql.execution.ExplainMode.fromString(
          if (mode == null) "simple" else mode.toLowerCase)
        import catalog.spark.implicits._
        Seq(planned.queryExecution.explainString(m)).toDF("plan")
      case _ => runStatement(cleaned)
    }
  }

  private def runStatement(raw0: String): DataFrame =
    SqlDdl.tryExecute(catalog, raw0).getOrElse {
      val cleaned = rewriteTableChanges(rewriteMetaTables(raw0))
      registerReferencedViews(cleaned, Set.empty)
      val TimeTravelRewriter.Rewritten(stmt, asOf, version, tag) =
        TimeTravelRewriter.rewrite(cleaned)
      (asOf, version, tag) match {
        case (Some(ms), _, _)  =>
          metadataAgg(stmt,
            (db, t) => catalog.store(db).snapshotMetaAsOf(t, Some(ms)))
            .getOrElse(pinnedQuery(stmt, (db, t, cond) => {
              val (df, files) = pinnedPruned(db, t, cond, Some(ms))
              (df, Some(files))
            }))
        case (_, Some(id), _)  =>
          metadataAgg(stmt,
            (db, t) => catalog.store(db).snapshotMetaVersion(t, id))
            .getOrElse(pinnedQuery(stmt, (db, t, _) => {
              val (df, files) = catalog.store(db).readVersionWithFiles(t, id)
              (df, Some(files))
            }))
        case (_, _, Some(tg))  =>
          // ref → resolved PER TABLE (table-scoped metadata; unknown
          // names fail loudly in resolveTag, never fall back). A BRANCH
          // name reads fork-point + branch commits as a unit; the
          // namespaces are disjoint by construction (create-time check).
          metadataAgg(stmt,
            (db, t) =>
              if (catalog.store(db).branchExists(t, tg)) None
              else catalog.store(db).snapshotMetaVersion(t,
                catalog.store(db).resolveTag(t, tg)))
            .getOrElse(pinnedQuery(stmt,
              (db, t, _) =>
                if (catalog.store(db).branchExists(t, tg))
                  // branch file set = fork point + staged entries; its
                  // size is not a snapshot-log line item — unscaled
                  (catalog.store(db).readBranch(t, tg), None)
                else {
                  val (df, files) = catalog.store(db).readVersionWithFiles(
                    t, catalog.store(db).resolveTag(t, tg))
                  (df, Some(files))
                }))
        case _                 =>
          // metadata-answered first (O(1)), then aggregate navigation
          // over a FRESH materialized view (O(view)), then the scan —
          // each tier falls through when its soundness gates fail
          metadataAgg(stmt,
            (db, t) => catalog.store(db).snapshotMetaAsOf(t, None))
            .orElse(MvRewrite.tryRewrite(catalog, stmt))
            .getOrElse(prunedQuery(stmt))
      }
    }

  // Iceberg-style METADATA TABLES, SQL-composable: `` `t$files` ``,
  // `` `t$history` ``, `` `t$snapshots` ``, `` `t$partitions` `` (backticks
  // optional; Impala spells these tbl$files, Spark-Iceberg t.files). The
  // SHOW statements render the same data as fixed result sets; the $-form
  // joins/filters/aggregates like any relation — the warehouse-ops shape
  // ("total bytes per partition", "commits that added the most rows").
  private val MetaTableRef =
    ("(?i)`?((?:[A-Za-z_]\\w*\\.)?[A-Za-z_]\\w*)" +
      "\\$(delete_files|files|history|snapshots|partitions|refs|manifests)`?").r

  /** Replace metadata-table references with registered temp views built
    * from snapshot-log metadata (no data I/O; `$files` stats file sizes
    * on the bounded parallel pool). No-op for statements without `$`. */
  private def rewriteMetaTables(stmt: String): String = {
    if (!stmt.contains("$")) return stmt
    MetaTableRef.replaceAllIn(stmt, m => {
      val (cat, t) = SqlDdl.resolved(catalog, m.group(1))
      require(cat.store().exists(t), s"table not found: ${m.group(1)}")
      val kind = m.group(2).toLowerCase
      val spark = catalog.spark
      import spark.implicits._
      val df = kind match {
        case "files" => cat.store().filesMetadata(t)
          .toDF("file_path", "record_count", "partition", "size_bytes")
        case "delete_files" => cat.store().deleteFilesMetadata(t)
          .toDF("file_path", "kind", "record_count",
            "referencing_data_files", "equality_cols", "size_bytes")
        case "history"   => cat.store().history(t)
        case "snapshots" => cat.store().snapshotsMetadata(t)
        case "partitions" => cat.store().partitionSummary(t)
          .toDF("partition", "n_files", "n_records")
        case "refs" => cat.store().refsMetadata(t)
          .toDF("name", "type", "snapshot_id", "staged_commits")
        case "manifests" => cat.store().manifestsMetadata(t)
          .toDF("path", "length", "added_snapshot_id", "data_files_count")
      }
      val view = s"${t}__meta_$kind"
      df.createOrReplaceTempView(view)
      java.util.regex.Matcher.quoteReplacement(view)
    })
  }

  // Delta's `table_changes` as a table-valued RELATION: the CALL form
  // returns the raw feed; this form lets arbitrary SQL compose over it —
  // `SELECT _change_type, count(*) FROM table_changes('t', 1) GROUP BY 1`.
  // Positional bounds: snapshot ids, or TIMESTAMP literals with the CALL
  // form's semantics (start = commits at-or-after the instant, end =
  // at-or-before).
  private val TcBound = "(?:(\\d+)|TIMESTAMP\\s+'([^']+)')"
  private val TableChangesRef =
    ("(?i)\\btable_changes\\s*\\(\\s*'([^']+)'\\s*" +
      s"(?:,\\s*$TcBound\\s*(?:,\\s*$TcBound\\s*)?)?\\)").r

  /** Replace `table_changes('t'[, start[, end]])` relations with temp
    * views over [[graft.store.TableStore.readChanges]] — a lazy plan,
    * no job until the enclosing query runs. No-op without the name.
    * Matches inside quoted string literals are left alone (the text is
    * data, not a relation), and the registered view name carries a
    * per-call unique suffix so two Engine instances over different
    * catalogs in one SparkSession cannot clobber each other's view
    * between registration and execution. */
  private def rewriteTableChanges(stmt: String): String = {
    if (!stmt.toLowerCase.contains("table_changes")) return stmt
    TableChangesRef.replaceAllIn(stmt, m => {
      // the table name itself is a quoted literal, so "is this match in
      // a string?" means: the `t` of table_changes sits inside an open
      // quoted region begun earlier in the statement — single-quoted
      // data, or double-quoted text (a string literal under Spark's
      // default dialect; an identifier can't hold the phrase anyway)
      if (insideQuoted(stmt, m.start))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
        val (cat, t) = SqlDdl.resolved(catalog, m.group(1))
        val st = cat.store()
        require(st.exists(t), s"table not found: ${m.group(1)}")
        val from = (Option(m.group(2)), Option(m.group(3))) match {
          // start EXCLUSIVE: commits strictly before the instant are the
          // baseline, at-or-after are the feed (the CALL form's rule)
          case (_, Some(ts)) => st.snapshotIdAtOrBefore(t,
            TimeTravelRewriter.parseTimestampMs(ts) - 1).getOrElse(0L)
          case (Some(id), _) => id.toLong
          case _ => 0L
        }
        val to = (Option(m.group(4)), Option(m.group(5))) match {
          case (_, Some(ts)) => Some(st.snapshotIdAtOrBefore(t,
            TimeTravelRewriter.parseTimestampMs(ts)).getOrElse(
              throw new IllegalArgumentException(
                s"table_changes: no commit of $t at or before '$ts'")))
          case (Some(id), _) => Some(id.toLong)
          case _ => None
        }
        val view = s"${t}__changes_${from}_${to.getOrElse("cur")}_" +
          java.util.UUID.randomUUID().toString.replace("-", "").take(8)
        st.readChanges(t, from, to).createOrReplaceTempView(view)
        java.util.regex.Matcher.quoteReplacement(view)
      }
    })
  }

  /** True when offset `at` falls inside a quoted region — same quote
    * rules as [[SqlCleanup.firstSemicolonOutsideQuotes]] (doubled `''`
    * and backslash escapes inside single quotes). */
  private def insideQuoted(s: String, at: Int): Boolean = {
    var i = 0
    var inSingle = false
    var inDouble = false
    while (i < at && i < s.length) {
      val c = s.charAt(i)
      if (inSingle) {
        if (c == '\\') i += 1
        else if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
          else inSingle = false
        }
      } else if (inDouble) {
        if (c == '"') inDouble = false
      } else c match {
        case '\'' => inSingle = true
        case '"'  => inDouble = true
        case _    =>
      }
      i += 1
    }
    inSingle || inDouble
  }

  /** Logical-view expansion: for every stored view whose name appears in
    * `stmt`, (re-)evaluate its SELECT text through the full engine seam
    * and register the result as a temp view — so the plan always reads
    * the CURRENT base snapshot (the stored artifact is text, never a
    * pinned file list), and views-over-views resolve by recursion
    * (`visiting` breaks definition cycles; Spark then raises its own
    * not-found on the truly unresolvable name). Word-boundary matching
    * over-approximates harmlessly: registering a view the query does not
    * use costs one lazy plan, no job. */
  private def registerReferencedViews(stmt: String,
      visiting: Set[String]): Unit = {
    val vs = catalog.views()
    vs.foreach { case (name, defn) =>
      val mentioned = java.util.regex.Pattern
        .compile("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b")
        .matcher(stmt).find()
      if (mentioned && !visiting(name.toLowerCase)) {
        registerReferencedViews(defn, visiting + name.toLowerCase)
        val TimeTravelRewriter.Rewritten(body, asOf, version, tag) =
          TimeTravelRewriter.rewrite(defn)
        val df = (asOf, version, tag) match {
          case (None, None, None) => prunedQuery(body)
          case (Some(ms), _, _) =>
            pinnedQuery(body, (db, t, cond) => {
              val (d, files) = pinnedPruned(db, t, cond, Some(ms))
              (d, Some(files))
            })
          case (_, Some(id), _) =>
            pinnedQuery(body, (db, t, _) => {
              val (d, files) = catalog.store(db).readVersionWithFiles(t, id)
              (d, Some(files))
            })
          case (_, _, Some(tg)) =>
            pinnedQuery(body, (db, t, _) => {
              val (d, files) = catalog.store(db).readVersionWithFiles(t,
                catalog.store(db).resolveTag(t, tg))
              (d, Some(files))
            })
        }
        df.createOrReplaceTempView(name)
      }
    }
  }

  /** `SELECT COUNT(*) | MIN(c) | MAX(c) [, …] FROM t` (bare relation, no
    * WHERE/GROUP BY, optional aliases and LIMIT ≥ 1) answers from snapshot
    * metadata alone — the Iceberg/Impala stats-answered aggregate. COUNT
    * comes from the snapshot entry's record count (O(1), no manifest
    * hydration — the reference's own demo question `README.md:113-117`);
    * MIN/MAX fold the per-file column bounds the log captured at promote
    * time, so the reference's max-id continuation query
    * (`append_iceberg.py:116`) costs log metadata, not a 100 TB scan.
    *
    * MIN/MAX is answered ONLY when every live file logged bounds for the
    * column and the column is integral/date/timestamp: float/double stats
    * are unsound in the presence of NaN (Spark orders NaN above all
    * values; Parquet stats ignore that), and string bounds can be dropped
    * by the log's length cap. Anything unanswerable — including a single
    * stats-less legacy file — returns None and takes the scan path, so
    * this is an optimization, never a semantics change. Output names,
    * types, and nullability come from analyzing the SAME projection over
    * an empty relation with the snapshot's schema (driver-only, no job) —
    * the answer is byte-identical to what the scan would render.
    */
  private def metadataAgg(stmt: String,
      metaFor: (String, String) => Option[(org.apache.spark.sql.types.StructType,
        Long, () => Seq[graft.store.DataFile])]): Option[DataFrame] = {
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.types._
    val spark = catalog.spark
    val caseSensitive = spark.sessionState.conf.caseSensitiveAnalysis
    def norm(s: String): String = if (caseSensitive) s else s.toLowerCase

    def unwrapLimit(p: LogicalPlan): LogicalPlan = p match {
      case GlobalLimit(Literal(n: Int, _), LocalLimit(_, child)) if n >= 1 => child
      case _ => p
    }
    def isCountAll(f: UnresolvedFunction): Boolean =
      !f.isDistinct && f.filter.isEmpty && (f.arguments match {
        case Seq(s: UnresolvedStar) => s.target.isEmpty
        case Seq(Literal(v, _))     => v != null
        case _                      => false
      })

    // What one projection item asks for; None = not metadata-answerable.
    sealed trait Spec
    case object CountStar extends Spec
    final case class MinMax(isMin: Boolean, col: String) extends Spec
    def classify(e: Expression): Option[Spec] = {
      val fn = e match {
        case UnresolvedAlias(f: UnresolvedFunction, _) => Some(f)
        case Alias(f: UnresolvedFunction, _)           => Some(f)
        case _                                         => None
      }
      fn.flatMap { f =>
        // function names resolve case-insensitively regardless of
        // spark.sql.caseSensitive
        f.nameParts.map(_.toLowerCase) match {
          case Seq("count") if isCountAll(f) => Some(CountStar)
          case Seq(mm @ ("min" | "max")) if !f.isDistinct && f.filter.isEmpty =>
            f.arguments match {
              case Seq(a: UnresolvedAttribute) if a.nameParts.size == 1 =>
                Some(MinMax(mm == "min", a.nameParts.head))
              case _ => None
            }
          case _ => None
        }
      }
    }

    val statsTypes: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType, DateType,
        TimestampType, TimestampNTZType)
    def external(dt: DataType, v: Long): Any = dt match {
      case ByteType     => v.toByte
      case ShortType    => v.toShort
      case IntegerType  => v.toInt
      case LongType     => v
      case DateType     =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(v.toInt)
      case TimestampType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(v)
      case TimestampNTZType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .microsToLocalDateTime(v)
      case other => sys.error(s"unreachable stats type $other")
    }

    // a bare name (current database), or one qualified with ANY existing
    // database — the catalog is keyed by (db, table), per the reference's
    // own multi-database layout (`iceberg-PC.py:97`)
    def tableRef(u: UnresolvedRelation): Option[(String, String)] =
      u.multipartIdentifier match {
        case Seq(one) =>
          catalog.listTables().find(t => norm(t) == norm(one))
            .map(catalog.database -> _)
        case Seq(db, tbl) =>
          catalog.listDatabases().find(d => norm(d) == norm(db))
            .flatMap(realDb => catalog.listTablesIn(realDb)
              .find(t => norm(t) == norm(tbl)).map(realDb -> _))
        case _ => None
      }

    def answer(node: LogicalPlan, items: Seq[Expression],
        u: UnresolvedRelation, cond: Option[Expression]): Option[DataFrame] =
      tableRef(u)
        .flatMap { case (db, t) => metaFor(db, t).map((db, t, _)) }
        .flatMap { case (db, t, (sch, recordCount, filesThunk)) =>
          // files hydrate at most once, and never for an unfiltered COUNT
          lazy val files = filesThunk()
          // with a WHERE: only when the predicate exactly partitions the
          // file population (partition-aligned — every file all-match or
          // no-match) can counts and bounds fold over the matching files;
          // any partial file, or an unanalyzable condition, declines to
          // the scan path
          lazy val included: Option[Seq[graft.store.DataFile]] = cond match {
            case None => Some(files)
            case Some(c) => scala.util.Try(catalog.store(db)
                .exactMatchFiles(t, files, GraftSqlShim.column(c)))
              .toOption.flatten
          }
          for {
            specs <- { val cs = items.map(classify)
                       if (cs.forall(_.isDefined)) Some(cs.flatten) else None }
            values <- traverse(specs) {
              // recordCount < 0 = equality deletes live (upper bound
              // only) or a pre-counting log: decline to the scan
              case CountStar if cond.isEmpty =>
                if (recordCount >= 0) Some(recordCount: Any) else None
              case CountStar => included.flatMap { inc =>
                // every matching file needs a logged row count (-1 =
                // pre-counting log entry) AND no equality-delete refs
                // (records is then an upper bound): decline, never guess
                if (inc.forall(f => f.records >= 0 &&
                    !f.deletes.exists(_.isEquality)))
                  Some(inc.map(_.records).sum: Any)
                else None
              }
              case MinMax(isMin, colName) =>
                for {
                  field <- sch.fields.find(f => norm(f.name) == norm(colName))
                  if statsTypes.contains(field.dataType)
                  inc <- included
                  folded <- {
                    // a renamed column's old files logged their bounds
                    // under the physical name of their time — fold over
                    // the whole alias chain, like the read path does
                    val st = catalog.store(db)
                    val names = (field.name +:
                      st.aliasesOf(st.renameEvents(t), field.name))
                      .map(_.toLowerCase)
                    foldBounds(inc, names, isMin)
                  }
                } yield folded.map(external(field.dataType, _)).orNull
            }
            // names/types/nullability from the real analyzer over an empty
            // relation with the snapshot's schema — never from guesswork
            probe <- scala.util.Try {
              val emptyRel = SubqueryAlias(u.multipartIdentifier,
                spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  sch).queryExecution.analyzed)
              val child = cond.map(Filter(_, emptyRel)).getOrElse(emptyRel)
              GraftSqlShim.ofRows(spark, node.withNewChildren(Seq(child))).schema
            }.toOption
            if probe.length == values.length
          } yield {
            import scala.jdk.CollectionConverters._
            spark.createDataFrame(
              Seq(org.apache.spark.sql.Row(values: _*)).asJava, probe)
          }
        }

    unwrapLimit(GraftSqlShim.parsePlan(spark, stmt)) match {
      // the parser emits Project(aggs, rel); GROUP-BY-less aggregation
      // only becomes Aggregate during analysis (GlobalAggregates) —
      // match both for robustness. A Filter between the projection and
      // the relation is the partition-aligned-WHERE case.
      case p @ Project(items, u: UnresolvedRelation)
          if tableRef(u).isDefined && items.nonEmpty =>
        answer(p, items, u, None)
      case p @ Project(items, Filter(c, u: UnresolvedRelation))
          if tableRef(u).isDefined && items.nonEmpty =>
        answer(p, items, u, Some(c))
      case a @ Aggregate(Seq(), items, u: UnresolvedRelation, _)
          if tableRef(u).isDefined && items.nonEmpty =>
        answer(a, items, u, None)
      case a @ Aggregate(Seq(), items, Filter(c, u: UnresolvedRelation), _)
          if tableRef(u).isDefined && items.nonEmpty =>
        answer(a, items, u, Some(c))
      case _ => None
    }
  }

  /** Fold one side of the logged per-file bounds. Outer None = cannot
    * answer (a file without bounds for the column); inner None = SQL NULL
    * (no non-null values in any file — MIN/MAX ignore nulls). All-null
    * files contribute nothing, exactly like the scan would. */
  private def foldBounds(files: Seq[graft.store.DataFile],
      namesLc: Seq[String], isMin: Boolean): Option[Option[Long]] = {
    var acc: Option[Long] = None
    for (f <- files) {
      // merge-on-read position deletes: the logged bounds remain valid
      // for PRUNING but the extreme value may itself be deleted — a
      // metadata MIN/MAX over such a file would answer wrongly. COUNT
      // stays exact (records is the live count); MIN/MAX declines to
      // the scan path.
      if (f.deletes.nonEmpty) return None
      namesLc.iterator.flatMap(f.stats.get).nextOption() match {
        case None => return None
        case Some(b) =>
          val r = graft.store.Pruning.fromBounds(b)
          if (!r.allNulls) {
            (if (isMin) r.min else r.max) match {
              case Some(v: Long) =>
                acc = Some(acc.fold(v)(a =>
                  if (isMin) math.min(a, v) else math.max(a, v)))
              case _ => return None
            }
          }
      }
    }
    Some(acc)
  }

  /** Seq-of-Option traversal (all-or-nothing). */
  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = Seq.newBuilder[B]
    for (x <- xs) f(x) match {
      case Some(b) => out += b
      case None    => return None
    }
    Some(out.result())
  }

  /** Time-travel read of `t`, partition-pruned by the enclosing filter
    * when one exists and the table is partitioned — AS-OF queries over a
    * day-partitioned table scan the day, not the snapshot. Any analysis
    * hiccup falls back to the unpruned pinned read (the filter stays on
    * top, so pruning can only drop provably-unmatchable files). Returns
    * the scanned file list too, so the pin attaches statistics scaled
    * to the snapshot's (or the pruned subset's) OWN logged rows/bytes —
    * a 10×-smaller historical version, or a one-partition leg, must not
    * plan at the current full-table size. */
  private def pinnedPruned(db: String, t: String,
      cond: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      asOfMs: Option[Long]): (DataFrame, Seq[graft.store.DataFile]) =
    cond.filter(_ => catalog.store(db).partitionSpec(t).isDefined)
      .flatMap(c => scala.util.Try(catalog.store(db).readPrunedWithFiles(t,
        org.apache.spark.sql.GraftSqlShim.column(c), asOfMs)).toOption)
      .getOrElse(catalog.store(db).readWithFiles(t, asOfMs))

  /** Rule 3 applies the clause to *every* table (`app-gradio.py:138`).
    * The statement is PARSED and each [[UnresolvedRelation]] naming a
    * catalog table is replaced by the pinned snapshot's (already
    * analyzed) plan under a [[SubqueryAlias]] carrying the original
    * name — so `tbl.col` references and output column names resolve
    * unchanged, and a column or alias that merely *spells* like a table
    * name is never touched (the failure mode of the previous text-level
    * rewrite). No temp views, no shared session state: two concurrent
    * AS-OF queries at different snapshots cannot observe each other.
    *
    * The walk is a hand-rolled recursion rather than `transformUp` for
    * three reasons: (a) relations inside expression subqueries
    * (`IN (SELECT …)`, `EXISTS`, scalar subqueries) must be pinned too,
    * so every node's [[SubqueryExpression]]s recurse; (b) a CTE name
    * shadows the base table for references *after* its definition
    * (`WITH items AS (…) SELECT … FROM items` reads the CTE), while the
    * definition body itself still reads — and pins — the base table;
    * (c) a qualified name resolves against ITS database — the current one
    * (`db.items` after `USE db`, the reference's own style,
    * `append_iceberg.py:176`) or any other existing database (the
    * reference keeps its PC schema in a separate db, `iceberg-PC.py:97`)
    * — while a name under a database that does not exist fails fast
    * instead of silently reading the current snapshot while the rest of
    * the query is pinned.
    */
  private def pinnedQuery(stmt: String,
      pinnedRead: (String, String,
        Option[org.apache.spark.sql.catalyst.expressions.Expression])
        => (DataFrame, Option[Seq[graft.store.DataFile]]))
      : DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.{Expression, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias, UnresolvedWith}
    val spark = catalog.spark
    // Name matching/shadowing follows the session's resolution mode:
    // with spark.sql.caseSensitive=true a CTE named ITEMS must NOT
    // shadow table items (and ITEMS itself is not a catalog reference).
    val caseSensitive = spark.sessionState.conf.caseSensitiveAnalysis
    def norm(s: String): String = if (caseSensitive) s else s.toLowerCase
    val byName = catalog.listTables().map(t => norm(t) -> t).toMap
    val pinned = scala.collection.mutable.HashMap.empty[String, LogicalPlan]

    def go(plan: LogicalPlan, shadowed: Set[String]): LogicalPlan = plan match {
      case w: UnresolvedWith =>
        // Non-recursive WITH: each definition sees only the CTEs defined
        // before it; the main body sees all of them. A RECURSIVE CTE's
        // own name is in scope inside its definition — the self-reference
        // must be left for Spark's recursion resolution, not rewired to a
        // catalog table that happens to share the name.
        var inScope = shadowed
        val defs = w.cteRelations.map { case (name, defn, colAliases) =>
          val defScope = if (w.allowRecursion) inScope + norm(name) else inScope
          val r = go(defn, defScope).asInstanceOf[SubqueryAlias]
          inScope += norm(name)
          (name, r, colAliases)
        }
        w.copy(child = go(w.child, inScope), cteRelations = defs)
      case f: Filter =>
        // a filter directly over a relation lets the pinned read prune
        // partitioned tables by the condition
        val child = f.child match {
          case u: UnresolvedRelation => pinRel(u, shadowed, Some(f.condition))
          case sa @ SubqueryAlias(_, u: UnresolvedRelation) =>
            sa.copy(child = pinRel(u, shadowed, Some(f.condition)))
          case other => go(other, shadowed)
        }
        f.copy(child = child).transformExpressionsUp {
          case se: SubqueryExpression => se.withNewPlan(go(se.plan, shadowed))
        }
      case u: UnresolvedRelation => pinRel(u, shadowed, None)
      case other =>
        other.mapChildren(go(_, shadowed)).transformExpressionsUp {
          case se: SubqueryExpression => se.withNewPlan(go(se.plan, shadowed))
        }
    }

    def pinRel(u: UnresolvedRelation, shadowed: Set[String],
        cond: Option[Expression]): LogicalPlan = {
      // only the UNPRUNED pin is cached — a condition-pruned plan is a
      // file subset and must never serve another reference. Pinned
      // relations carry the table's catalog statistics SCALED to the
      // pinned snapshot's (or pruned subset's) own logged rows/bytes —
      // NDV/bounds still ride the latest COMPUTE STATS pass (the best
      // available estimate for a historical version, and stats only
      // shape plans, never rows; bounds re-validate per leaf against
      // the pinned relation's historical attribute types).
      def withStats(db: String, t: String,
          r: (DataFrame, Option[Seq[graft.store.DataFile]])): LogicalPlan =
        catalog.forDatabase(db).withTableStats(t, r._1, prunedTo = r._2)
          .queryExecution.analyzed
      def pin(db: String, t: String): LogicalPlan = cond match {
        case Some(c) => withStats(db, t, pinnedRead(db, t, Some(c)))
        case None => pinned.getOrElseUpdate(s"$db.$t",
          withStats(db, t, pinnedRead(db, t, None)))
      }
      u.multipartIdentifier match {
        case Seq(one) if !shadowed(norm(one)) && byName.contains(norm(one)) =>
          SubqueryAlias(one, pin(catalog.database, byName(norm(one))))
        // CTE names are single-part, so a qualified reference is never
        // shadowed; a qualified name resolves against ITS database —
        // current or foreign — and the alias keeps both parts so
        // `db.table.col` references work
        case Seq(db, tbl) =>
          catalog.listDatabases().find(d => norm(d) == norm(db))
            .flatMap(realDb => catalog.listTablesIn(realDb)
              .find(t => norm(t) == norm(tbl)).map(realDb -> _)) match {
            case Some((realDb, t)) =>
              SubqueryAlias(Seq(db, tbl), pin(realDb, t))
            case None if byName.contains(norm(tbl)) =>
              throw new IllegalArgumentException(
                s"time travel cannot pin qualified name '$db.$tbl': " +
                  s"database '$db' does not exist or has no such table")
            case None => u
          }
        case parts if parts.size > 1 && byName.contains(norm(parts.last)) =>
          throw new IllegalArgumentException(
            s"time travel cannot pin qualified name '${parts.mkString(".")}': " +
              s"'${parts.init.mkString(".")}' is not a known database")
        case _ => u
      }
    }
    GraftSqlShim.ofRows(spark, go(GraftSqlShim.parsePlan(spark, stmt), Set.empty))
  }

  /** Partition pruning for the PLAIN SQL path: a `WHERE` sitting directly
    * on a partitioned catalog table is spliced so the relation scans only
    * the files the snapshot log's partition values cannot rule out — SQL
    * users get the same file pruning as [[GraftCatalog.tableWhere]]. The
    * original Filter stays on top (pruning is conservative), so a failed
    * or impossible prune degrades to the full scan, never to wrong rows.
    * CTE shadowing and expression subqueries follow the same scoping as
    * the time-travel walk.
    */
  private def prunedQuery(stmt: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.{Expression, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias, UnresolvedWith}
    val spark = catalog.spark
    val caseSensitive = spark.sessionState.conf.caseSensitiveAnalysis
    def norm(s: String): String = if (caseSensitive) s else s.toLowerCase
    lazy val byName = catalog.listTables().map(t => norm(t) -> t).toMap

    // The catalog table a relation refers to: a bare unshadowed name in
    // the current database, or a name qualified with ANY existing
    // database (CTE names are single-part, so a qualified reference is
    // never shadowed).
    def resolveTable(u: UnresolvedRelation,
        shadowed: Set[String]): Option[(String, String)] =
      u.multipartIdentifier match {
        case Seq(one) if !shadowed(norm(one)) =>
          byName.get(norm(one)).map(catalog.database -> _)
        case Seq(db, tbl) =>
          catalog.listDatabases().find(d => norm(d) == norm(db))
            .flatMap(realDb => catalog.listTablesIn(realDb)
              .find(t => norm(t) == norm(tbl)).map(realDb -> _))
        case _ => None
      }

    // Some(pruned analyzed plan) only for a partitioned catalog table
    // whose filter analyzes against its schema; anything else → None →
    // the relation resolves through its temp view as usual. The pruned
    // relation re-attaches the table's catalog statistics (the splice
    // bypasses the stats-bearing temp view) SCALED TO THE KEPT SUBSET's
    // own logged rows/bytes — a leg pruned to one partition must not be
    // estimated at full-table size, or it loses the broadcast that plain
    // file-size estimation would have chosen.
    def pruned(db: String, t: String, cond: Expression): Option[LogicalPlan] = {
      val store = catalog.store(db)
      // one log read serves both the prunability check and the prune
      val files = store.dataFilesAsOf(t, None)
      val prunable = store.partitionSpec(t).isDefined ||
        files.exists(_.stats.nonEmpty)
      if (!prunable) None
      else scala.util.Try {
        val kept = store.prunedSubset(t, files, GraftSqlShim.column(cond))
        catalog.forDatabase(db).withTableStats(t,
            store.readFromFileList(t, kept), prunedTo = Some(kept))
          .queryExecution.analyzed
      }.toOption
    }

    // A current-db qualified relation resolves through its bare temp
    // view, aliased with both parts so `db.table.col` references work; a
    // FOREIGN-db one has no temp view, so the latest snapshot's analyzed
    // plan is spliced in directly.
    def plainRel(u: UnresolvedRelation, shadowed: Set[String]): LogicalPlan =
      u.multipartIdentifier match {
        case Seq(db, tbl) if norm(db) == norm(catalog.database) &&
            byName.contains(norm(tbl)) =>
          SubqueryAlias(Seq(db, tbl), u.copy(multipartIdentifier = Seq(tbl)))
        case Seq(db, tbl) =>
          resolveTable(u, shadowed) match {
            case Some((realDb, t)) => SubqueryAlias(Seq(db, tbl),
              catalog.store(realDb).read(t, None).queryExecution.analyzed)
            case None => u
          }
        case _ => u
      }

    def go(plan: LogicalPlan, shadowed: Set[String]): LogicalPlan = plan match {
      case w: UnresolvedWith =>
        var inScope = shadowed
        val defs = w.cteRelations.map { case (name, defn, colAliases) =>
          val defScope = if (w.allowRecursion) inScope + norm(name) else inScope
          val r = go(defn, defScope).asInstanceOf[SubqueryAlias]
          inScope += norm(name)
          (name, r, colAliases)
        }
        w.copy(child = go(w.child, inScope), cteRelations = defs)
      case f: Filter =>
        val child = f.child match {
          case u: UnresolvedRelation =>
            resolveTable(u, shadowed)
              .flatMap { case (db, t) => pruned(db, t, f.condition) }
              .map(SubqueryAlias(u.multipartIdentifier, _))
              .getOrElse(plainRel(u, shadowed))
          case sa @ SubqueryAlias(_, u: UnresolvedRelation) =>
            resolveTable(u, shadowed)
              .flatMap { case (db, t) => pruned(db, t, f.condition) }
              .map(p => sa.copy(child =
                SubqueryAlias(u.multipartIdentifier, p)))
              .getOrElse(sa.copy(child = plainRel(u, shadowed)))
          case other => go(other, shadowed)
        }
        f.copy(child = child).transformExpressionsUp {
          case se: SubqueryExpression => se.withNewPlan(go(se.plan, shadowed))
        }
      case u: UnresolvedRelation => plainRel(u, shadowed)
      case other =>
        other.mapChildren(go(_, shadowed)).transformExpressionsUp {
          case se: SubqueryExpression => se.withNewPlan(go(se.plan, shadowed))
        }
    }
    GraftSqlShim.ofRows(spark, go(GraftSqlShim.parsePlan(spark, stmt), Set.empty))
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
