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
}
