package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Text-analysis operators for training-data pipelines (north-star
  * extension, absent from the reference — SURVEY.md §7.1 module 7).
  * Everything is a column expression over the `documents` table shape
  * (doc_id, text, lang, source, n_chars — TESTDATA.md): no UDFs in the
  * per-row hot path except where a tight JVM loop wins (sketches), no
  * driver-side collection — all operators scale with the cluster.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count (the "token counting" baseline; a BPE-ish
    * regex variant is `bpeTokenCount`). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword proxy: word pieces + digits + punctuation as
    * separate tokens (a regex approximation of byte-pair pretokenization;
    * the merge-table-faithful counter is [[bpeTokenCountMerged]]). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** The shipped BPE merge table (Sennrich et al., ACL 2016), in rank
    * order — a hand-curated head of the most frequent English
    * letter-pair merges (the same pairs every public English BPE
    * vocabulary learns first; cf. the published GPT-2 merges head).
    * Kept as the expression-tier teaching form beside the production
    * rank-map tier ([[bpeTokensRanked]] / [[BpeVocab]], whose oracle
    * replays its own table from the same checked-in file). Each merge's
    * sides must already be producible when its rank applies (training
    * order guarantees this for real merge files; curated here). */
  val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n", "o" -> "r",
    "e" -> "s", "s" -> "t", "a" -> "r", "o" -> "u", "a" -> "l",
    "in" -> "g", "i" -> "t", "i" -> "s", "e" -> "d", "a" -> "s",
    "t" -> "o", "l" -> "e", "o" -> "f", "c" -> "h", "s" -> "e",
    "r" -> "o", "l" -> "l", "m" -> "e", "n" -> "d", "an" -> "d",
    "e" -> "l", "u" -> "n", "w" -> "h", "l" -> "o", "m" -> "a",
    "d" -> "e", "c" -> "o", "t" -> "er", "th" -> "at", "er" -> "s",
    "i" -> "on", "at" -> "ion", "es" -> "t", "q" -> "u", "e" -> "a",
    "o" -> "o", "e" -> "e", "s" -> "h", "u" -> "s", "en" -> "t")

  /** TOKENIZER-FAITHFUL BPE token count: pretokenize with the same
    * regex as [[bpeTokenCount]] (letter runs, single digits, single
    * punctuation marks), then apply the [[bpeMerges]] table to each
    * lowercased letter run exactly the way published BPE
    * implementations do — merges in rank order, each rank one
    * left-to-right non-overlapping pass over the symbol sequence
    * (for a ≠ b one pass IS exhaustive: merging (a,b) can only create
    * (x,ab)/(ab,y) adjacencies, never a new (a,b); for a = b the
    * left-to-right pass is precisely the standard greedy pairing).
    * The count is what a shard/context-window budget needs — the
    * regex proxy drifts 10-30% from real merges on code/multilingual
    * text, which is enough to blow a context budget.
    *
    * Implementation is PURE string expressions (encode each symbol as
    * `<sym>`, fold one literal `replace` per merge, count the `<`
    * markers), so it is scan-local and shuffle-free (the lambda
    * wrappers evaluate outside whole-stage codegen like every
    * higher-order-function operator in this module — per-row,
    * distributed work either way). The `<`/`>` sentinels cannot
    * collide: merges apply only to pretokens that are pure letter
    * runs. (This head-50 tier's queries and generated DuckDB oracles
    * moved to the ranked tier — [[BpeVocab.oracleCtes]]; the operator
    * keeps its unit coverage as the teaching form.) */
  def bpeTokenCountMerged(text: Column): Column = {
    val pre = regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))
    val perTok = transform(pre, w =>
      when(w.rlike("^[A-Za-z]"), mergedSymbolCount(w)).otherwise(lit(1)))
    aggregate(perTok, lit(0), (a, x) => a + x)
  }

  private def mergedEncoding(w: Column): Column = {
    val enc = regexp_replace(lower(w), "(.)", "<$1>")
    bpeMerges.foldLeft(enc) { case (s, (a, b)) =>
      replace(s, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }
  }

  private def mergedSymbolCount(w: Column): Column =
    size(split(mergedEncoding(w), "<", -1)) - 1

  /** The actual SUBWORD TOKEN SEQUENCE under [[bpeMerges]] — what a
    * training pipeline feeds a model, not just the count: letter runs
    * lowercase and split into their merged symbols, digits and
    * punctuation pass through as single tokens. Same pure-string-
    * expression machinery as [[bpeTokenCountMerged]] (whose count this
    * equals by construction), so it is scan-local and shuffle-free.
    * Tokens never contain whitespace (the pretokenizer excludes it),
    * so a space-joined stream is unambiguous. */
  def bpeTokens(text: Column): Column = {
    val pre = regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))
    flatten(transform(pre, w =>
      when(w.rlike("^[A-Za-z]"),
        filter(split(mergedEncoding(w), "[<>]"), s => s =!= lit("")))
        .otherwise(array(w))))
  }

  // ------------------------------------------------------- ranked BPE tier

  /** TOKENIZER-FAITHFUL BPE at production vocabulary scale: the full
    * subword stream under a rank-map merge table (default: the shipped
    * [[BpeVocab.Default]], a few-thousand-rank GPT-2-shape vocabulary —
    * case-preserving, Ġ space-prefix, contractions split). Unlike the
    * folded-literal [[bpeTokens]] head-50 tier, plan size, codegen size
    * and JIT cost are INDEPENDENT of merge count (the table travels as
    * one referenced object — `BpePlanSizeSpec`), and per-word cost is
    * the published merge loop amortized by a per-thread cache. Scan-
    * local and shuffle-free like the rest of this module. NULL text →
    * NULL (null-intolerant; the oracle CTEs mirror it). */
  def bpeTokensRanked(text: Column,
      table: graft.functions.BpeTable = BpeVocab.Default): Column =
    graft.functions.GraftFunctions.bpeTokenize(text, table)

  /** Token COUNT under the ranked merge table — the number shard
    * packing / chunking / token-budget mixing route through. */
  def bpeTokenCountRanked(text: Column,
      table: graft.functions.BpeTable = BpeVocab.Default): Column =
    size(bpeTokensRanked(text, table))

  /** Distributed pretoken frequencies — the corpus half of BPE
    * training: explode the (whitespace-mapped, case-preserved)
    * pretokens, ONE map-side-combining count aggregation, top-K by
    * frequency via TakeOrderedAndProject (bounded driver collect —
    * K distinct words, never the corpus; ties broken by word so the
    * result is deterministic). Feed the result to
    * [[graft.functions.BpeTable.train]]. */
  def bpeWordFrequencies(docs: DataFrame, textCol: String,
      topK: Int = 50000): Seq[(String, Long)] = {
    docs
      .select(explode(graft.functions.GraftFunctions.bpePretokenize(
        col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Quality-score components + aggregate score in [0,1]:
    * length score, alpha ratio, punctuation ratio, stopword ratio,
    * mean word length — the standard cheap heuristics used to filter
    * web-scale corpora. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val nTok = tokenCount(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double")
    val stop = size(array_intersect(tokens(text), lit(englishStopwords.toArray))).cast("double")
    val lengthScore = least(len / lit(500.0), lit(1.0))
    val alphaRatio = when(len > 0, alpha / len).otherwise(0.0)
    val punctPenalty = when(len > 0, lit(1.0) - least(punct / len * 10.0, lit(1.0))).otherwise(0.0)
    val stopRatio = when(nTok > 0, least(stop / nTok * 2.0, lit(1.0))).otherwise(0.0)
    round((lengthScore + alphaRatio + punctPenalty + stopRatio) / 4.0, 4)
  }

  /** Language ID by CHARACTER-TRIGRAM profile argmax (the
    * Cavnar–Trenkle n-gram idea reduced to curated boundary-marked
    * profiles), replacing the earlier stopword-argmax: stopword-free
    * documents — code, tables, compound-heavy German, agglutinated
    * technical terms — carry no function words at all, but their
    * morphology ("ung", "ção", "zio", "éch") still votes. The text is
    * letters-only lowercased with word boundaries kept as spaces, so
    * profiles match affixes AND short function words (" th", "der").
    * CJK has no useful trigram inventory to curate; Han-script
    * dominance (≥ half the letters) short-circuits to "zh" — which
    * also fixes the old operator's blind spot that unspaced Chinese
    * tokenized to one giant "word" and matched nothing. Everything is
    * a pure column expression ⇒ distributed, codegen'd, no UDFs. */
  def langId(text: Column): Column = {
    val stripped = trim(regexp_replace(lower(text), "[^\\p{L}]+", " "))
    val padded = concat(lit(" "), stripped, lit(" "))
    val letters = length(regexp_replace(stripped, "\\s", ""))
    val han = length(regexp_replace(stripped, "[^\\p{IsHan}]", ""))
    // bind the padded string as a lambda variable (transform-over-
    // singleton = the expression tier's let): referencing `padded`
    // from the per-trigram substr re-runs lower+regexp_replace per
    // element — O(n²) per document (same fix as Classify.charTrigrams)
    val tris = element_at(transform(array(padded), p => {
      val n = length(p)
      when(n >= 3,
          transform(sequence(lit(1), n - 2), i => p.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))
    }), 1)
    // hits saturate at 999999 — the oracle packs them into a %06d
    // sortable pad, so the operator clamps identically (a real document
    // never gets near 1M profile-trigram hits; this only pins the
    // degenerate case to the same argmax on both engines)
    val scored = trigramProfiles.map { case (lang, grams) =>
      struct(least(size(filter(tris,
          t => array_contains(lit(grams.toArray), t))), lit(999999))
        .as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    // minimum evidence: one stray trigram (" de" inside "def") must not
    // label a document; two profile hits is the classify floor
    when(han > 0 && han * 2 >= letters, lit("zh"))
      .when(best.getField("hits") >= 2, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** DuckDB SQL expression replaying [[langId]] exactly over
    * `textExpr` — generated from the SAME [[trigramProfiles]] literals
    * so the oracle cannot drift from the operator. Trigram hits are
    * zero-padded into sortable strings (this DuckDB lacks struct
    * greatest); RE2 spells the Han class `\p{Han}` where Java uses
    * `\p{IsHan}` — same character set. */
  def langIdOracleSqlExpr(textExpr: String): String = {
    val strip =
      s"trim(regexp_replace(lower($textExpr), '[^\\p{L}]+', ' ', 'g'))"
    val pad = s"(' ' || $strip || ' ')"
    val tris = s"list_transform(range(1, length($pad) - 1), " +
      s"i -> substr($pad, i, 3))"
    def quote(g: String) = "'" + g.replace("'", "''") + "'"
    // least(hits, 999999): a ≥1M-hit document would overflow the fixed
    // %06d pad and misparse the substr split; Spark's greatest() over
    // struct(hits, lang) compares the raw int, and hit counts that
    // large are saturated identically across profiles anyway
    val scored = trigramProfiles.map { case (lang, grams) =>
      s"printf('%06d', least(len(list_filter($tris, t -> list_contains(" +
        grams.map(quote).mkString("[", ",", "]") + s", t))), 999999)) || '$lang'"
    }.mkString("greatest(", ", ", ")")
    val letters = s"length(regexp_replace($strip, '\\s', '', 'g'))"
    val han = s"length(regexp_replace($strip, '[^\\p{Han}]', '', 'g'))"
    s"""CASE WHEN $han > 0 AND $han * 2 >= $letters THEN 'zh'
       |     WHEN substr($scored, 1, 6) >= '000002' THEN substr($scored, 7)
       |     ELSE 'und' END""".stripMargin
  }

  /** Order-sensitive document fingerprint (rolling hash over normalized
    * text); use `GraftFunctions.minhashSignature` for order-insensitive. */
  def fingerprint(text: Column): Column =
    GraftFunctions.rollingHash(normalize(text))

  /** Normalization for fingerprinting/dedup: lowercase, collapse
    * whitespace, strip non-alphanumerics. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Gopher-style repetition signals: fraction of duplicate lines and
    * duplicate words — cheap single-pass filters that catch
    * template/boilerplate-heavy documents at corpus scale. */
  def repetitionStats(text: Column): (Column, Column) = {
    val lines = split(text, "\n")
    val words = tokens(text)
    def dupRatio(arr: Column): Column =
      when(size(arr) <= 1, 0.0)
        .otherwise(round(lit(1.0) -
          size(array_distinct(arr)).cast("double") / size(arr), 4))
    (dupRatio(lines), dupRatio(words))
  }

  private val UrlPattern = "https?://[^\\s]+"
  private val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Scrub URLs and email addresses (the minimum PII pass of a
    * training-data pipeline): returns (scrubbed text, url count,
    * email count) columns. Pure regex column expressions — distributed,
    * no UDFs. */
  def scrubPii(text: Column): (Column, Column, Column) = {
    val noUrls = regexp_replace(text, UrlPattern, "<URL>")
    val scrubbed = regexp_replace(noUrls, EmailPattern, "<EMAIL>")
    (scrubbed,
      size(regexp_extract_all(text, lit(UrlPattern), lit(0))).cast("int"),
      size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("int"))
  }

  // candidate card runs: 13-19 digits, optional single space/dash
  // separators, not embedded in a longer digit run
  private val CardPattern = "(?<![0-9])(?:[0-9][ -]?){12,18}[0-9](?![0-9])"
  // phones need an explicit separator or +country shape — a bare digit
  // run must never match (that's the card/ID space)
  // digit/dash lookarounds: a phone must not be carved out of the
  // middle of a longer digit run (e.g. a non-Luhn card that survived
  // the card pass)
  private val PhonePattern =
    "(?<![0-9-])(?:\\+[0-9]{1,3}[ -])?(?:\\([0-9]{2,4}\\)[ -]?)?" +
      "[0-9]{3}-[0-9]{3,4}(?:-[0-9]{3,4})?(?![0-9-])"
  private val Ipv4Pattern = "(?<![0-9.])(?:[0-9]{1,3}\\.){3}[0-9]{1,3}(?![0-9.])"

  /** Luhn checksum over the digits of `s` — the validity gate that
    * separates a real card number from an arbitrary digit run, as pure
    * column expressions (reverse → positional double → digital-root →
    * sum mod 10). Scrubbing every 16-digit run would eat order ids and
    * ISBNs; scrubbing only Luhn-valid runs is the standard precision
    * fix. */
  def luhnValid(s: Column): Column = {
    val digs = reverse(filter(split(s, ""), c => c.rlike("^[0-9]$")))
    val contrib = zip_with(digs, sequence(lit(0), size(digs) - 1),
      (d, i) => {
        val v = d.cast("int")
        when(i % 2 === 1,
          when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
      })
    size(digs) >= 13 && size(digs) <= 19 &&
      aggregate(contrib, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** Extended PII scrub beyond [[scrubPii]]'s URLs/emails: Luhn-valid
    * card numbers → `<CARD>` (invalid digit runs stay — see
    * [[luhnValid]]), separator-shaped phone numbers → `<PHONE>`, IPv4
    * addresses → `<IP>`. Returns (scrubbed, cards, phones, ips). All
    * pure column expressions; the card pass extracts candidates and
    * folds a literal `replace` over the Luhn-valid ones, since a regex
    * replace cannot consult a checksum. */
  def scrubPiiExtended(text: Column): (Column, Column, Column, Column) = {
    val candidates = regexp_extract_all(text, lit(CardPattern), lit(0))
    val validCards = filter(candidates, c => luhnValid(c))
    val noCards = aggregate(validCards, text,
      (acc, c) => replace(acc, c, lit("<CARD>")))
    val noPhones = regexp_replace(noCards, PhonePattern, "<PHONE>")
    val scrubbed = regexp_replace(noPhones, Ipv4Pattern, "<IP>")
    (scrubbed,
      size(validCards).cast("int"),
      size(regexp_extract_all(noCards, lit(PhonePattern), lit(0))).cast("int"),
      size(regexp_extract_all(noPhones, lit(Ipv4Pattern), lit(0))).cast("int"))
  }

  /** Full stats frame for a documents table. */
  /** Fixed-window token CHUNKING with overlap — the context-length
    * preprocessing step every training/RAG pipeline runs before a
    * tokenizer budget or an embedding model: one row per
    * (document, window) with the window's text and token count.
    *
    * Windows start every `maxTokens - overlap` tokens; a document at or
    * under the budget yields exactly one chunk, and the final window
    * keeps the tail (it may be short — standard sliding-window
    * semantics). Pure built-in expressions (sequence → transform →
    * slice → posexplode), so the whole thing is one codegen'd
    * scan-local projection: no shuffle, no UDF, scales embarrassingly —
    * the output is ~(1/stride)× token volume regardless of corpus size.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int = 512, overlap: Int = 64): DataFrame =
    chunkTokens(docs, idCol, tokens(col(textCol)), maxTokens, overlap)

  /** [[chunk]] with the window budget in TOKENIZER-FAITHFUL BPE tokens
    * ([[bpeTokensRanked]] under the shipped production-shape vocab) —
    * the context-length number that actually bounds a model's input.
    * Whitespace-token windows under- or over-fill a real context by
    * the 10-30% regex-vs-merges drift; windowing the subword stream
    * itself makes every chunk exactly ≤ `maxTokens` model tokens.
    * `chunk_text` is the space-joined subword stream (what the model
    * consumes), not a substring of the original text — unambiguous
    * because symbols never contain raw whitespace. */
  def chunkBpe(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int = 512, overlap: Int = 64,
      table: graft.functions.BpeTable = BpeVocab.Default): DataFrame =
    chunkTokens(docs, idCol, bpeTokensRanked(col(textCol), table),
      maxTokens, overlap)

  private def chunkTokens(docs: DataFrame, idCol: String, toks: Column,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1 (got $maxTokens)")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens) (got $overlap of $maxTokens)")
    val stride = maxTokens - overlap
    val n = size(col("_toks"))
    val nChunks = when(n <= maxTokens, lit(1))
      .otherwise(ceil((n - lit(overlap)).cast("double") / stride).cast("int"))
    docs
      // tokenize ONCE per document; the per-window lambda only slices
      .select(col(idCol), toks.as("_toks"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), nChunks - 1),
        k => slice(col("_toks"), k * lit(stride) + 1, lit(maxTokens)))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        size(col("col")).as("n_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** The Gopher quality rules (Rae et al. 2021, appendix A1.1) as one
    * scan-local pass — the named rule set production pipelines cite:
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    * bullet-/ellipsis-line fractions, alphabetic-word fraction, and
    * the ≥2-of-8 common-stopword requirement. Emits every rule as its
    * own boolean beside the conjunction (`gopher_keep`), so a pipeline
    * can report WHICH rule rejected a document, not just that one did.
    * Pure column expressions (arrays + lambdas, codegen-friendly) —
    * no UDFs, no shuffle. */
  def gopherRules(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val ws = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val nWords = size(ws)
    val nWordsD = nWords.cast("double")
    val meanLen = when(nWords > 0,
      aggregate(ws, lit(0.0), (a, w) => a + length(w).cast("double")) / nWordsD)
      .otherwise(lit(0.0))
    val nSym = length(t) -
      length(regexp_replace(regexp_replace(t, "#", ""), "…", ""))
    val lines = split(t, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val bulletFrac = size(filter(lines,
      l => regexp_like(ltrim(l), lit("^(•|- |\\* )")))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines,
      l => regexp_like(rtrim(l), lit("(\\.\\.\\.|…)$")))).cast("double") / nLines
    val alphaFrac = when(nWords > 0,
      size(filter(ws, w => regexp_like(w, lit("[A-Za-z]")))).cast("double") /
        nWordsD).otherwise(lit(0.0))
    val stopHits = size(array_intersect(
      array_distinct(transform(ws, w => lower(w))),
      lit(GopherStopwords.toArray)))
    val rWords = nWords >= 50 && nWords <= 100000
    val rMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val rSymbol = when(nWords > 0, nSym.cast("double") / nWordsD < 0.1)
      .otherwise(lit(false))
    val rBullet = bulletFrac < 0.9
    val rEllipsis = ellipsisFrac < 0.3
    val rAlpha = alphaFrac > 0.8
    val rStop = stopHits >= 2
    docs
      .withColumn("n_words", nWords)
      .withColumn("r_words", rWords)
      .withColumn("r_mean_len", rMeanLen)
      .withColumn("r_symbol", rSymbol)
      .withColumn("r_bullet", rBullet)
      .withColumn("r_ellipsis", rEllipsis)
      .withColumn("r_alpha", rAlpha)
      .withColumn("r_stopwords", rStop)
      .withColumn("gopher_keep", rWords && rMeanLen && rSymbol && rBullet &&
        rEllipsis && rAlpha && rStop)
  }

  /** Gopher's "must contain ≥2 of these" word list (A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def documentStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_chars_measured", length(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("pred_lang", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "are", "was", "be", "this", "at", "by")

  /** Small per-language stopword lists (language-ID heuristic). */
  /** Curated boundary-marked character-trigram profiles (the
    * Cavnar–Trenkle inventory, hand-cut to each language's most
    * distinctive function-word and affix trigrams — spaces mark word
    * boundaries, so " th" is word-initial "th" and "ão " word-final
    * "ão"). Public so [[langIdOracleSqlExpr]] embeds the same literals
    * the operator scores with. Shared Romance trigrams ("que", "es ")
    * appear in several profiles deliberately — the argmax is decided by
    * the accent/affix trigrams ("ção" vs "ción" vs "zione"). */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", "ing", "ng ",
      " of", "of ", " to", "to ", "ion", "tio", " is", "is ", "ed ",
      "ent", " wh", "hat", "ou ", "ght"),
    "de" -> Seq(" de", "der", "die", "das", " un", "und", "ein", "ich",
      "sch", "che", "cht", "ung", " ge", "gen", "ver", "ter", " zu",
      "eit", "ür ", "auf", "sse", "nen"),
    "fr" -> Seq(" le", "le ", " la", "la ", " de", "de ", " et", "et ",
      "es ", "que", " qu", "ue ", "ait", "eur", "oir", "ons", "ous",
      "aux", "eux", "est", "ans", "ais", "élé", "éch", " dé", "éve",
      "eme"),
    "es" -> Seq(" el", "el ", " lo", "los", "las", " la", "la ", " es",
      "es ", "os ", "as ", "ión", "ció", "ado", "aba", "ara", "nte",
      "que", " qu", "ndo", " y "),
    "it" -> Seq(" il", "il ", " di", "di ", "che", " ch", "zio", "ion",
      "one", "gli", "ell", "lla", "tto", "tta", "are", "ere", "ire",
      "ità", "per", " pe", "ano", "ono"),
    "pt" -> Seq(" do", "do ", " da", "da ", " de", "de ", "ção", "çõe",
      "ão ", "ões", "os ", "as ", "em ", " em", "que", " qu", "uma",
      " um", "ara", "par", "nto", "açã"))

  val stopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> englishStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "mit", "auf", "für", "von", "den", "im"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du",
      "pour", "dans", "que", "qui", "sur", "avec"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de",
      "en", "que", "por", "para", "con", "no"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"))
}
