package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, count, expr, lit}

import graft.catalog.GraftCatalog

/** SQL `MERGE INTO` at the same pre-parse seam as the rest of the DDL/DML
  * surface — the statement Impala/Iceberg users would run instead of the
  * reference's manual max-id-continuation append
  * (`/root/reference/append_iceberg.py:104-123`).
  *
  * Supported shape (the Iceberg/Impala core):
  * {{{
  * MERGE INTO t [AS a] USING <src table | (subquery)> [AS b] ON a.k = b.k [AND …]
  *   WHEN MATCHED THEN UPDATE SET col = expr, …   -- or: WHEN MATCHED THEN DELETE
  *   WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs)  -- or: INSERT *
  *   WHEN NOT MATCHED BY SOURCE THEN DELETE       -- or: UPDATE SET col = expr, …
  * }}}
  *
  * The ON condition must be a conjunction of target-column = source-column
  * equalities (the key join Iceberg's copy-on-write MERGE requires for
  * file-granular rewrites). Execution is FILE-GRANULAR copy-on-write via
  * [[graft.store.TableStore.merge]]: only target files containing a
  * matched key are rewritten; everything else is carried by reference —
  * at 100 TB a 1000-row MERGE touches a handful of files, not the table.
  * A `BY SOURCE` arm forces a full rewrite: its affected rows can live in
  * any file, exactly as in Iceberg's copy-on-write MERGE.
  *
  * Cardinality: when an UPDATE or DELETE matched arm is present and more
  * than one source row matches the same target row, the statement raises
  * a cardinality violation — the Impala/Iceberg contract — instead of
  * silently duplicating the target row. Duplicate source keys that match
  * nothing still insert one row each (standard NOT MATCHED behavior).
  */
object SqlMerge {

  private val Head = "(?is)^\\s*MERGE\\s+INTO\\s+(.+)$".r
  private val NameAlias =
    "(?is)^\\s*`?([A-Za-z_]\\w*)`?(?:\\s+(?:AS\\s+)?`?([A-Za-z_]\\w*)`?)?\\s*$".r

  def tryExecute(catalog: GraftCatalog, stmt: String): Option[DataFrame] =
    stmt match {
      case Head(rest) => execute(catalog, rest); Some(catalog.spark.emptyDataFrame)
      case _          => None
    }

  private final case class Arms(
      updateSet: Option[Seq[(String, String)]], // None = no UPDATE arm
      matchedDelete: Boolean,
      insertCols: Option[Seq[String]],  // None = no INSERT arm
      insertExprs: Option[Seq[String]], // None with insertCols set = INSERT *
      bySourceSet: Option[Seq[(String, String)]] = None,
      bySourceDelete: Boolean = false) {
    def hasBySource: Boolean = bySourceDelete || bySourceSet.isDefined
  }

  private def execute(catalog: GraftCatalog, rest: String): Unit = {
    val (targetClause, afterUsing) = SqlText.splitFirstTopLevel(rest, "USING")
    require(afterUsing.isDefined, "MERGE INTO requires a USING clause")
    val (sourceClause, afterOn) = SqlText.splitFirstTopLevel(afterUsing.get, "ON")
    require(afterOn.isDefined, "MERGE INTO requires an ON clause")
    val (condText, whenTail) = SqlText.splitFirstTopLevel(afterOn.get, "WHEN")
    require(whenTail.isDefined, "MERGE INTO requires at least one WHEN clause")

    val (target, tAlias) = targetClause match {
      case NameAlias(n, a) => (n, Option(a).getOrElse(n))
      case other => throw new IllegalArgumentException(
        s"cannot parse MERGE target: '${other.trim}'")
    }
    require(catalog.store().exists(target), s"table not found: $target")
    val schema = catalog.store().schema(target)

    val (sourceDf, sAlias) = parseSource(catalog, sourceClause)
    val keyPairs = parseOnCondition(condText, tAlias, sAlias)
    val arms = parseWhenClauses(whenTail.get, target)

    val tgt = (c: String) => s"`$tAlias`.`$c`"
    val src = (c: String) => s"`$sAlias`.`$c`"
    val joinCond: Column =
      keyPairs.map { case (tk, sk) => expr(s"${tgt(tk)} = ${src(sk)}") }
        .reduce(_ && _)
    val targetKeyCols = keyPairs.map(_._1)
    // matched-file detection keys, renamed into target column names
    val sourceKeys = sourceDf.select(
      keyPairs.map { case (tk, sk) => col(sk).as(tk) }: _*)

    def alignToSchema(df: DataFrame, colFor: String => Column): DataFrame =
      df.select(schema.fields.toIndexedSeq.map(f =>
        colFor(f.name).cast(f.dataType).as(f.name)): _*)

    catalog.merge(target, sourceKeys, targetKeyCols, { matchedDf =>
      val t = matchedDf.alias(tAlias)
      val s = sourceDf.alias(sAlias)
      val keysDistinct = sourceKeys.select(targetKeyCols.map(col): _*).distinct()
      // Cardinality violation (Impala/Iceberg contract): an UPDATE/DELETE
      // matched arm with several source rows hitting one target row must
      // raise, not duplicate. One aggregation over the source keys, then
      // a semi-join restricted to the rewritten files' rows — a target
      // row matched more than once necessarily lives in a matched file.
      if (arms.updateSet.isDefined || arms.matchedDelete) {
        val dupKeys = sourceKeys.groupBy(targetKeyCols.map(col): _*)
          .agg(count(lit(1)).as("__matches"))
          .filter(col("__matches") > 1).drop("__matches")
        if (!matchedDf.join(dupKeys, targetKeyCols, "left_semi").isEmpty)
          throw new IllegalStateException(
            s"MERGE INTO $target: a target row matches more than one " +
              "source row (cardinality violation)")
      }
      // target rows in rewritten files whose key has no source match:
      // kept as-is, unless a BY SOURCE arm rewrites or drops them
      val notBySource = matchedDf.join(keysDistinct, targetKeyCols, "left_anti")
      val unmatchedKept: Option[DataFrame] =
        if (arms.bySourceDelete) None
        else arms.bySourceSet match {
          case Some(sets) =>
            val byName = sets.map { case (n, v) => n.toLowerCase -> v }.toMap
            Some(alignToSchema(notBySource.alias(tAlias), f =>
              byName.get(f.toLowerCase).map(expr).getOrElse(expr(tgt(f)))))
          case None => Some(alignToSchema(notBySource, col(_)))
        }
      val updated: Option[DataFrame] = arms.updateSet.map { sets =>
        val byName = sets.map { case (n, v) => n.toLowerCase -> v }.toMap
        alignToSchema(t.join(s, joinCond, "inner"), f =>
          byName.get(f.toLowerCase).map(expr).getOrElse(expr(tgt(f))))
      }
      val inserted: Option[DataFrame] = arms.insertCols.map { cols =>
        val notMatched = s.join(t, joinCond, "left_anti")
        arms.insertExprs match {
          case Some(exprs) =>
            val byName = cols.map(_.toLowerCase).zip(exprs).toMap
            alignToSchema(notMatched, f =>
              byName.get(f.toLowerCase).map(expr)
                .getOrElse(lit(null)))
          case None => // INSERT *: source columns align by name
            alignToSchema(notMatched, f => col(f))
        }
      }
      val matchedKept =
        if (arms.matchedDelete) None // matched rows dropped
        else if (arms.updateSet.isEmpty)
          // no matched arm: key-matched rows pass through unchanged
          Some(alignToSchema(
            matchedDf.join(keysDistinct, targetKeyCols, "left_semi"), col(_)))
        else updated
      val parts = Seq(unmatchedKept, matchedKept, inserted).flatten
      if (parts.isEmpty) alignToSchema(matchedDf.limit(0), col(_))
      else parts.reduce(_ unionByName _)
    }, rewriteAll = arms.hasBySource)
    ()
  }

  /** `name [AS a]` or `(subquery) [AS] a [(col, …)]` → (DataFrame, alias). */
  private def parseSource(catalog: GraftCatalog,
      clause: String): (DataFrame, String) = {
    val trimmed = clause.trim
    if (trimmed.startsWith("(")) {
      val close = matchingParen(trimmed, 0)
      val subquery = trimmed.substring(1, close).trim
      val tail = trimmed.substring(close + 1).trim
      val AliasCols =
        "(?is)^(?:AS\\s+)?`?([A-Za-z_]\\w*)`?\\s*(?:\\(([^)]*)\\))?\\s*$".r
      tail match {
        case AliasCols(alias, colsOrNull) =>
          val colsClause = Option(colsOrNull)
            .map(cs => "(" + cs.trim + ")").getOrElse("")
          val df = catalog.spark.sql(
            s"SELECT * FROM ($subquery) AS `$alias`$colsClause")
          (df, alias)
        case _ => throw new IllegalArgumentException(
          s"MERGE source subquery needs an alias: '...$tail'")
      }
    } else trimmed match {
      case NameAlias(n, a) =>
        require(catalog.store().exists(n), s"table not found: $n")
        (catalog.table(n), Option(a).getOrElse(n))
      case other => throw new IllegalArgumentException(
        s"cannot parse MERGE source: '${other.trim}'")
    }
  }

  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '('  => depth += 1
        case ')'  => depth -= 1; if (depth == 0) return i
        case _    =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in MERGE source: $s")
  }

  /** `a.k1 = b.k1 AND a.k2 = b.k2` → Seq((targetCol, sourceCol)). */
  private def parseOnCondition(cond: String, tAlias: String,
      sAlias: String): Seq[(String, String)] = {
    val Eq = "(?is)^\\s*`?([A-Za-z_]\\w*)`?\\.`?([A-Za-z_]\\w*)`?\\s*=\\s*" +
      "`?([A-Za-z_]\\w*)`?\\.`?([A-Za-z_]\\w*)`?\\s*$"
    val EqR = Eq.r
    splitOnAnd(cond).map {
      case EqR(q1, c1, q2, c2) =>
        if (q1.equalsIgnoreCase(tAlias) && q2.equalsIgnoreCase(sAlias)) (c1, c2)
        else if (q1.equalsIgnoreCase(sAlias) && q2.equalsIgnoreCase(tAlias)) (c2, c1)
        else throw new IllegalArgumentException(
          s"MERGE ON condition must join target and source: '$cond'")
      case other => throw new IllegalArgumentException(
        "MERGE ON condition must be AND-ed column equalities " +
          s"(got '${other.trim}')")
    }
  }

  private def splitOnAnd(cond: String): Seq[String] = {
    var rest = cond
    val out = Seq.newBuilder[String]
    var continue = true
    while (continue) {
      SqlText.splitFirstTopLevel(rest, "AND") match {
        case (head, Some(tail)) => out += head; rest = tail
        case (head, None)       => out += head; continue = false
      }
    }
    out.result().filter(_.trim.nonEmpty)
  }

  /** The WHEN … THEN … clauses after the first WHEN keyword. */
  private def parseWhenClauses(tail: String, table: String): Arms = {
    var arms = Arms(None, matchedDelete = false, None, None)
    splitOnWhen(tail).foreach { clause =>
      val Matched = "(?is)^\\s*MATCHED\\s+THEN\\s+(.*)$".r
      val NotMatchedBySource =
        "(?is)^\\s*NOT\\s+MATCHED\\s+BY\\s+SOURCE\\s+THEN\\s+(.*)$".r
      val NotMatched = "(?is)^\\s*NOT\\s+MATCHED\\s+(?:BY\\s+TARGET\\s+)?THEN\\s+(.*)$".r
      clause match {
        case NotMatchedBySource(action) =>
          arms = parseBySource(action, arms, table)
        case NotMatched(action) => arms = parseInsert(action, arms, table)
        case Matched(action)    => arms = parseMatched(action, arms, table)
        case other => throw new IllegalArgumentException(
          s"cannot parse MERGE WHEN clause: 'WHEN ${other.trim}' " +
            "(conditional arms like WHEN MATCHED AND … are not supported)")
      }
    }
    require(arms.updateSet.isDefined || arms.matchedDelete ||
      arms.insertCols.isDefined || arms.hasBySource,
      s"MERGE INTO $table has no effective arm")
    arms
  }

  private val ClauseStart = "(?is)^\\s*(?:NOT\\s+)?MATCHED\\b.*".r.pattern

  /** Split on WHEN keywords, then re-join pieces that do not start a real
    * clause (`MATCHED`/`NOT MATCHED`) back onto their predecessor — the
    * WHEN of a `CASE WHEN … END` inside an UPDATE SET or INSERT arm is
    * expression text, not a clause boundary. */
  private def splitOnWhen(tail: String): Seq[String] = {
    var rest = tail
    val raw = Seq.newBuilder[String]
    var continue = true
    while (continue) {
      SqlText.splitFirstTopLevel(rest, "WHEN") match {
        case (head, Some(t)) => raw += head; rest = t
        case (head, None)    => raw += head; continue = false
      }
    }
    raw.result().filter(_.trim.nonEmpty)
      .foldLeft(Seq.empty[String]) { (acc, piece) =>
        if (acc.isEmpty || ClauseStart.matcher(piece).matches()) acc :+ piece
        else acc.init :+ (acc.last + " WHEN " + piece)
      }
  }

  private def parseMatched(action: String, arms: Arms, table: String): Arms =
    action.trim match {
      case d if d.matches("(?is)^DELETE\\s*$") =>
        require(!arms.matchedDelete && arms.updateSet.isEmpty,
          s"MERGE INTO $table has more than one WHEN MATCHED arm")
        arms.copy(matchedDelete = true)
      case u if u.matches("(?is)^UPDATE\\s+SET\\s+.*$") =>
        require(!arms.matchedDelete && arms.updateSet.isEmpty,
          s"MERGE INTO $table has more than one WHEN MATCHED arm")
        arms.copy(updateSet = Some(parseSetList(
          u.replaceFirst("(?is)^UPDATE\\s+SET\\s+", ""))))
      case other => throw new IllegalArgumentException(
        s"cannot parse WHEN MATCHED action: '$other'")
    }

  /** `WHEN NOT MATCHED BY SOURCE THEN DELETE | UPDATE SET …` — target
    * rows whose key appears nowhere in the source (the Iceberg/Delta
    * surface the reference's users sync dimension tables with). */
  private def parseBySource(action: String, arms: Arms, table: String): Arms = {
    require(!arms.hasBySource,
      s"MERGE INTO $table has more than one WHEN NOT MATCHED BY SOURCE arm")
    action.trim match {
      case d if d.matches("(?is)^DELETE\\s*$") =>
        arms.copy(bySourceDelete = true)
      case u if u.matches("(?is)^UPDATE\\s+SET\\s+.*$") =>
        arms.copy(bySourceSet = Some(parseSetList(
          u.replaceFirst("(?is)^UPDATE\\s+SET\\s+", ""))))
      case other => throw new IllegalArgumentException(
        s"cannot parse WHEN NOT MATCHED BY SOURCE action: '$other'")
    }
  }

  private def parseSetList(setList: String): Seq[(String, String)] = {
    val sets = SqlText.splitTopLevel(setList).map { a =>
      val eq = a.indexOf('=')
      require(eq > 0, s"cannot parse MERGE SET assignment: '$a'")
      val lhs = a.substring(0, eq).trim
      // allow `t.col =` and `col =`
      val name = lhs.substring(lhs.lastIndexOf('.') + 1)
        .trim.stripPrefix("`").stripSuffix("`")
      name -> a.substring(eq + 1).trim
    }
    val dups = sets.map(_._1.toLowerCase).groupBy(identity)
      .collect { case (n, vs) if vs.size > 1 => n }
    require(dups.isEmpty,
      s"duplicate column(s) in MERGE SET: ${dups.mkString(", ")}")
    sets
  }

  private def parseInsert(action: String, arms: Arms, table: String): Arms = {
    require(arms.insertCols.isEmpty,
      s"MERGE INTO $table has more than one WHEN NOT MATCHED arm")
    val Star = "(?is)^INSERT\\s+\\*\\s*$".r
    val Full = "(?is)^INSERT\\s*\\(([^)]*)\\)\\s*VALUES\\s*\\((.*)\\)\\s*$".r
    action.trim match {
      case Star() => arms.copy(insertCols = Some(Seq.empty), insertExprs = None)
      case Full(cols, exprs) =>
        val cs = SqlText.splitTopLevel(cols)
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
        val es = SqlText.splitTopLevel(exprs).map(_.trim)
        require(cs.length == es.length,
          s"MERGE INSERT: ${cs.length} columns but ${es.length} values")
        arms.copy(insertCols = Some(cs), insertExprs = Some(es))
      case other => throw new IllegalArgumentException(
        s"cannot parse WHEN NOT MATCHED action: '$other'")
    }
  }
}
