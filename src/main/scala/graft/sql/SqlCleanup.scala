package graft.sql

/** Normalizes raw LLM output into a single executable SQL statement.
  *
  * Behavioral spec from the reference's cleanup (`app-gradio.py:149-155`,
  * identical in `iceberg-PC.py:161-167` and `all_in_one_PC.py:219-229`):
  * strip Markdown code fences (```sql … ```), strip a leading `SQLQuery:`
  * prefix, truncate at the first `;` (rule 2 of the prompt: exactly one
  * statement, `app-gradio.py:137`), trim whitespace.
  */
object SqlCleanup {

  private val Fence = "(?s)```(?:sql)?\\s*(.*?)```".r

  def clean(raw: String): String = {
    if (raw == null) return ""
    var s = raw.trim
    // Prefer the content of the first code fence if present.
    Fence.findFirstMatchIn(s).foreach(m => s = m.group(1))
    // Remove any stray fence markers that survived (unbalanced fences).
    s = s.replace("```sql", "").replace("```", "")
    s = s.trim
    val prefixes = Seq("SQLQuery:", "SQL Query:", "SQL:", "Query:")
    prefixes.find(p => s.regionMatches(true, 0, p, 0, p.length))
      .foreach(p => s = s.substring(p.length))
    s = s.trim
    val semi = firstSemicolonOutsideQuotes(s)
    if (semi >= 0) s = s.substring(0, semi)
    s.trim
  }

  /** First `;` not inside a quoted literal — a `;` inside `'a;b'` is data,
    * not a statement separator, and truncating there would corrupt valid
    * SQL into an unterminated-quote statement. Single quotes escape by
    * doubling (`''`, the SQL rule) and by backslash (`\'` — Spark's
    * default `escapedStringLiterals=false` accepts it); double quotes
    * delimit identifiers. */
  private[sql] def firstSemicolonOutsideQuotes(s: String): Int = {
    var i = 0
    var inSingle = false
    var inDouble = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inSingle) {
        if (c == '\\') i += 1 // backslash escapes the next char
        else if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1 // escaped ''
          else inSingle = false
        }
      } else if (inDouble) {
        if (c == '"') inDouble = false
      } else c match {
        case '\'' => inSingle = true
        case '"'  => inDouble = true
        case ';'  => return i
        case _    =>
      }
      i += 1
    }
    -1
  }

  /** Empty-result contract: the reference keys "no matching records" off
    * the literal string "[]" (`app-gradio.py:176-181`). */
  val EmptyResult = "[]"
}
