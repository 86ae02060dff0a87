package graft.ext

import graft.functions.BpeTable

/** The SHIPPED BPE merge table — a few thousand ranks of the published
  * GPT-2 merges SHAPE (case-preserving symbols, Ġ space-prefix
  * pretokens, Ċ newline tokens, rank-ordered), learned first-party by
  * [[graft.functions.BpeTable.train]] (Sennrich et al. 2016) over a
  * seed lexicon (`graft/bpe_seed_lexicon.txt`, Zipf-weighted surface
  * forms) merged with the measured pretoken frequencies of the testdata
  * documents corpus. Regenerate with `runMain graft.GenBpeVocab`; the
  * learned table is checked in (`graft/bpe_merges.txt`) so operator,
  * oracle, and history stay deterministic.
  *
  * Also home of the DuckDB ORACLE generators: the verify SQL replays
  * the SAME rank map — merges applied in rank order, one left-to-right
  * non-overlapping `replace` pass each, over sentinel-encoded symbol
  * sequences — which equals the engine's min-rank-first merge loop on
  * any trained table (`BpeExpressions.scala` doc has the argument;
  * `BpeSpec` the differential test). The oracle encodes once per
  * DISTINCT pretoken and joins back (the same Zipf economics the
  * executor-side cache exploits), so verify cost scales with
  * vocabulary, not corpus.
  */
object BpeVocab {

  /** merges.txt format: an optional LEADING `#` comment header closed
    * by one blank line, then `left right` per line in rank order.
    * Comments are positional, not prefix-based — AFTER the header a
    * merge whose left symbol is literally `#` (markdown-heavy corpora
    * learn those) round-trips untouched, because nothing past the
    * header is ever filtered. The one caveat: a HEADERLESS file whose
    * first rank-0 merge itself starts with `#` would be read as a
    * header — the in-repo generator always writes a header, so files
    * it produces are unambiguous. */
  def parseMerges(lines: Iterator[String]): Array[(String, String)] = {
    val all = lines.toArray
    val body =
      if (all.headOption.exists(_.startsWith("#"))) {
        val blank = all.indexWhere(_.trim.isEmpty)
        require(blank >= 0, "comment header must end with a blank line")
        all.drop(blank + 1)
      } else all
    body.filter(_.trim.nonEmpty).map { l =>
      val sp = l.indexOf(' ')
      require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
        s"malformed merge line '$l' (symbols never contain spaces)")
      (l.substring(0, sp), l.substring(sp + 1))
    }
  }

  lazy val merges: Array[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "resource graft/bpe_merges.txt missing")
    try parseMerges(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** The default production-shape table every ranked-tier operator and
    * oracle shares. */
  lazy val Default: BpeTable = new BpeTable(merges)

  // ---------------------------------------------------------------- oracle

  /** The pretokenizer regex as a DuckDB SQL string literal (RE2 reads
    * the same pattern text Java does — the pattern deliberately stays
    * inside the dialect intersection, see BpeTable.PretokenRegex). */
  private def pretokenRegexSql: String =
    "'" + BpeTable.PretokenRegex.replace("'", "''") + "'"

  private def sqlEsc(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")
      .replace("\t", "\\t").replace("\n", "\\n")

  /** DuckDB list literal of the merge table: one element per rank,
    * `pat <US> rep` where pat/rep are the sentinel-encoded pair/merged
    * forms (`\t sym \n` wraps each symbol; symbols never contain
    * whitespace, so the sentinels cannot collide; US = chr(31) never
    * appears in trained symbols). */
  def mergeListSql(table: BpeTable = Default): String =
    table.merges.map { case (a, b) =>
      s"e'\\t${sqlEsc(a)}\\n\\t${sqlEsc(b)}\\n\\x1f\\t${sqlEsc(a)}${sqlEsc(b)}\\n'"
    }.mkString("[", ",", "]")

  private def wsMapSql(e: String): String =
    s"replace(replace(replace(replace(replace($e, ' ', 'Ġ'), e'\\t', 'ĉ'), " +
      s"e'\\n', 'Ċ'), e'\\r', 'č'), e'\\f', 'Č')"

  /** WITH-fragment (a comma-joined CTE chain, to splice after `WITH `)
    * ending in CTE `<p>bpe(<idCol>, toks)` — the full replayed subword
    * stream per row of `docsSel` (any relation or parenthesized
    * subquery with `idCol` + `textCol`). NULL text → NULL toks, empty
    * text → empty list (the operator's null-intolerant contract).
    * `p` prefixes every CTE name so two replays can share a statement. */
  def oracleCtes(docsSel: String, idCol: String = "doc_id",
      textCol: String = "text", p: String = "",
      table: BpeTable = Default): String = {
    val ws = wsMapSql("x.w")
    s"""${p}bd AS (SELECT $idCol AS _bid, $textCol AS _btext,
       |        regexp_extract_all($textCol, $pretokenRegexSql) AS ws
       |      FROM $docsSel),
       |${p}bpre AS (SELECT _bid, x.pos AS pos, $ws AS w
       |      FROM ${p}bd, unnest(list_transform(range(1, len(ws)+1),
       |        i -> {'pos': i, 'w': ws[i]})) t(x)),
       |${p}bdw AS (SELECT DISTINCT w FROM ${p}bpre),
       |${p}benc AS (SELECT w, list_reduce(
       |        list_prepend(regexp_replace(w, '(.)', e'\\t\\\\1\\n', 'g'),
       |          ${mergeListSql(table)}),
       |        (acc, m) -> replace(acc, split_part(m, chr(31), 1),
       |                            split_part(m, chr(31), 2))) AS seq
       |      FROM ${p}bdw),
       |${p}btok AS (SELECT _bid, pos,
       |        list_filter(string_split_regex(e.seq, e'[\\t\\n]'),
       |                    s -> s <> '') AS syms
       |      FROM ${p}bpre JOIN ${p}benc e USING (w)),
       |${p}bagg AS (SELECT _bid, flatten(list(syms ORDER BY pos)) AS toks
       |      FROM ${p}btok GROUP BY _bid),
       |${p}bpe AS (SELECT d._bid AS $idCol,
       |        CASE WHEN d._btext IS NULL THEN NULL
       |             ELSE coalesce(a.toks, []) END AS toks
       |      FROM ${p}bd d LEFT JOIN ${p}bagg a ON a._bid = d._bid)""".stripMargin
  }
}
