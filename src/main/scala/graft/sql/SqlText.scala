package graft.sql

import java.util.regex.{Matcher, Pattern}

/** String-level SQL text utilities shared by the pre-parse rewrite seam
  * (the same seam where the reference manipulates SQL text,
  * `app-gradio.py:149-155`): quote-aware scanning so table-name rewrites
  * never touch string literals.
  */
object SqlText {

  /** Apply `f` to every segment of `sql` outside quoted literals; quoted
    * spans pass through verbatim. Single quotes escape by doubling (`''`)
    * and by backslash (Spark's default `escapedStringLiterals=false`
    * behavior accepts `\'`); double quotes delimit strings/identifiers.
    */
  def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var inSingle = false
    var inDouble = false
    def flush(): Unit = { out.append(f(seg.toString)); seg.clear() }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inSingle) {
        out.append(c)
        if (c == '\\' && i + 1 < sql.length) { out.append(sql.charAt(i + 1)); i += 1 }
        else if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            out.append('\''); i += 1
          } else inSingle = false
        }
      } else if (inDouble) {
        out.append(c)
        if (c == '"') inDouble = false
      } else c match {
        case '\'' => flush(); out.append(c); inSingle = true
        case '"'  => flush(); out.append(c); inDouble = true
        case _    => seg.append(c)
      }
      i += 1
    }
    flush()
    out.toString
  }

  private def wordPattern(name: String): Pattern =
    Pattern.compile("(?i)\\b" + Pattern.quote(name) + "\\b")

  /** Replace whole-word, case-insensitive occurrences of `from` with `to`,
    * skipping quoted literals. */
  def replaceTableName(sql: String, from: String, to: String): String = {
    val p = wordPattern(from)
    mapOutsideLiterals(sql)(seg =>
      p.matcher(seg).replaceAll(Matcher.quoteReplacement(to)))
  }

  /** Whether `sql` references `table` as a whole word outside literals. */
  def referencesTable(sql: String, table: String): Boolean = {
    val p = wordPattern(table)
    var found = false
    mapOutsideLiterals(sql) { seg =>
      if (!found && p.matcher(seg).find()) found = true
      seg
    }
    found
  }

  /** Split `sql` on commas that are outside string literals AND outside
    * parentheses — so `DECIMAL(10,2)` and `SET name = 'a, b'` both stay
    * whole. Paren depth carries across literal boundaries.
    */
  def splitTopLevel(sql: String): Seq[String] = {
    var depth = 0
    val marked = mapOutsideLiterals(sql) { seg =>
      val b = new StringBuilder(seg.length)
      seg.foreach {
        case '('              => depth += 1; b.append('(')
        case ')'              => depth -= 1; b.append(')')
        case ',' if depth == 0 => b.append(Sep)
        case c                => b.append(c)
      }
      b.toString
    }
    splitOn(marked, Sep).filter(_.trim.nonEmpty)
  }

  /** Split `sql` at the FIRST whole-word `keyword` outside literals and
    * outside parentheses; returns (before, Some(after)) or (sql, None).
    * Lets `UPDATE t SET note = 'see WHERE docs' WHERE id = 1` split at the
    * real WHERE, not the one inside the literal.
    */
  def splitFirstTopLevel(sql: String, keyword: String): (String, Option[String]) = {
    var depth = 0
    var done = false
    val marked = mapOutsideLiterals(sql) { seg =>
      val b = new StringBuilder(seg.length)
      var i = 0
      while (i < seg.length) {
        val c = seg.charAt(i)
        if (c == '(') { depth += 1; b.append(c); i += 1 }
        else if (c == ')') { depth -= 1; b.append(c); i += 1 }
        else if (!done && depth == 0 &&
            seg.regionMatches(true, i, keyword, 0, keyword.length) &&
            // word boundaries; a segment edge abuts a quote (non-word)
            (i == 0 || !isWordChar(seg.charAt(i - 1))) &&
            (i + keyword.length >= seg.length ||
              !isWordChar(seg.charAt(i + keyword.length)))) {
          done = true
          b.append(Sep)
          i += keyword.length
        } else { b.append(c); i += 1 }
      }
      b.toString
    }
    marked.indexOf(Sep) match {
      case -1 => (sql, None)
      case at => (marked.substring(0, at), Some(marked.substring(at + 1)))
    }
  }

  private val Sep = '\u0000'

  private def isWordChar(c: Char): Boolean =
    c == '_' || Character.isLetterOrDigit(c)

  private def splitOn(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }
}
