package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokenCount counts whitespace tokens, zero for blank text") {
    val df = Seq("one two three", "  ", "", "single").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 0, 1))
  }

  test("bpeTokenCount splits words, digits, and punctuation") {
    val n = one("Hello, world 42!")
      .select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .as[Int].head()
    // Hello , world 4 2 !  → 6 pieces
    assert(n == 6)
  }

  test("bpeTokenCountMerged applies the merge table in rank order: " +
      "known words land on known token counts") {
    def n(s: String): Int = one(s)
      .select(TextAnalysis.bpeTokenCountMerged(col("text")).as("n"))
      .as[Int].head()
    // t+h → th, th+e → the: a single token
    assert(n("the") == 1)
    // a+n → an, an+d → and
    assert(n("and") == 1)
    // t+h → th, i+n → in → [th][in]
    assert(n("thin") == 2)
    // no merge covers x/y/z → three single-char symbols
    assert(n("xyz") == 3)
    // h e l l o: rank(l,l) → [h][e][ll][o]; (e,l)/(l,o) no longer
    // match the merged ll symbol
    assert(n("hello") == 4)
    // i n t e r n a t i o n a l → in + ter + n + at + ion + al
    // ((o,n) fires first, then (i,on) and (at,ion) assemble ation)
    assert(n("international") == 5)
    assert(n("nation") == 2) // n + ation
    // pretokens: [the][cat][,][4][2][!] → 1 + 2 ([c][at]) + 1+1+1+1
    assert(n("The cat, 42!") == 7)
    // self-merge (o,o) pairs greedily left-to-right
    assert(n("oooo") == 2 && n("ooo") == 2)
    assert(n("") == 0 && n("   ") == 0)
  }

  test("bpeTokens emits the merged SUBWORD SEQUENCE; its size equals " +
      "bpeTokenCountMerged by construction") {
    def toks(s: String): Seq[String] = one(s)
      .select(TextAnalysis.bpeTokens(col("text")).as("t"))
      .as[Seq[String]].head()
    assert(toks("The cat") == Seq("the", "c", "at"))
    assert(toks("thin ice!") == Seq("th", "in", "i", "c", "e", "!"))
    assert(toks("42") == Seq("4", "2"))
    assert(toks("") == Seq.empty)
    val d = Seq("International standards, 2024 — the nation's 3rd.",
      "mixed CASE and punct!?").toDF("text")
    val ok = d.select((org.apache.spark.sql.functions.size(
        TextAnalysis.bpeTokens(col("text"))) ===
      TextAnalysis.bpeTokenCountMerged(col("text"))).as("ok"))
      .as[Boolean].collect()
    assert(ok.forall(identity))
  }

  test("bpeTokenCountMerged vs the regex proxy: merges COMPRESS letter " +
      "runs (the 10-30% budget drift the faithful counter closes)") {
    val (merged, regex) = one("the international standard of the nation")
      .select(TextAnalysis.bpeTokenCountMerged(col("text")).as("m"),
        TextAnalysis.bpeTokenCount(col("text")).as("r"))
      .as[(Int, Int)].head()
    assert(merged > regex,
      s"subword count $merged must exceed the word-level proxy $regex")
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    val out = one("  The  QUICK!! brown-fox ")
      .select(TextAnalysis.normalize(col("text")).as("t")).as[String].head()
    assert(out == "the quick brown fox")
  }

  test("langId picks the language with the most trigram-profile hits") {
    val texts = Seq(
      "the cat is on the mat and it is happy",
      "der hund ist nicht in der küche und das ist gut",
      "le chat est dans la maison et il est content",
      "el gato es un animal y la casa es grande",
      "zxcv qwer asdf") // no profile trigrams at all
    val out = texts.toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang")).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("langId classifies STOPWORD-FREE documents by morphology — " +
      "compounds, technical terms, unspaced Chinese (the stopword-argmax " +
      "blind spots)") {
    val cases = Seq(
      "installation requirements troubleshooting documentation" -> "en",
      "geschwindigkeitsbegrenzung versicherungsunternehmen" -> "de",
      "téléchargement développement référencement" -> "fr",
      "programación internacionalización automatización" -> "es",
      "internazionalizzazione configurazione ottimizzazione" -> "it",
      "programação internacionalização automatização" -> "pt",
      "这是一个没有空格的中文测试文档" -> "zh",
      "def foo bar baz" -> "und", // one stray " de" stays under the floor
      "" -> "und")
    val out = cases.map(_._1).toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang")).as[String].collect()
    assert(out.toSeq == cases.map(_._2),
      cases.map(_._1).zip(out).mkString("; "))
  }

  test("qualityScore lands in [0,1] and ranks prose above junk") {
    val df = Seq(
      "The quick brown fox jumps over the lazy dog and runs far away into the woods.",
      "!!!! ???? ;;;; ####").toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
    val Seq(prose, junk) = df.as[Double].collect().toSeq
    assert(prose >= 0.0 && prose <= 1.0 && junk >= 0.0 && junk <= 1.0)
    assert(prose > junk)
  }

  test("fingerprint is deterministic and order-sensitive") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "gamma beta alpha")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")).as("f"))
    val Seq(a, b, c) = df.as[Long].collect().toSeq
    assert(a == b)
    assert(a != c)
  }

  test("chunk windows tokens with overlap; short docs yield one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // under budget
      (3L, (1 to 9).map(i => s"t$i").mkString(" "))   // exact multiple
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "doc_id", "text",
        maxTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // stride 3: doc 1 (10 toks) → ceil(9/3)=3 chunks at 1,4,7
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, 4, "t1 t2 t3 t4"),
      (1L, 1, 4, "t4 t5 t6 t7"),
      (1L, 2, 4, "t7 t8 t9 t10")))
    // consecutive chunks share exactly `overlap` tokens
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "a b c")))
    // 9 toks: ceil(8/3)=3 chunks at 1,4,7 — the last is the short tail
    assert(got.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq ==
      Seq((0, 4), (1, 4), (2, 3)))
    // every token of every doc appears in at least one chunk
    assert(intercept[IllegalArgumentException](
      TextAnalysis.chunk(docs, "doc_id", "text", 4, 4))
      .getMessage.contains("overlap"))
  }

  test("chunkBpe windows the SUBWORD stream: every chunk is ≤ budget " +
      "model tokens even where whitespace windows would overfill") {
    // "the" is 1 subword but "xyzq" stays 4 unmerged symbols — a
    // whitespace window of 2 words can carry 2..8 model tokens; the
    // BPE window never exceeds its budget. Controlled table so the
    // expectation is vocab-independent of the shipped merges.
    val table = new graft.functions.BpeTable(
      Array("t" -> "h", "th" -> "e"))
    val docs = Seq((1L, "the xyzq the xyzq")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkBpe(docs, "doc_id", "text",
        maxTokens = 4, overlap = 0, table = table)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    // stream: the, Ġ,x,y,z,q, Ġ,the, Ġ,x,y,z,q = 13 subwords → 4 chunks
    // (space-prefix pretokens: Ġ stays its own symbol with no merge)
    assert(got.toSeq == Seq(
      (0, 4, "the Ġ x y"),
      (1, 4, "z q Ġ the"),
      (2, 4, "Ġ x y z"),
      (3, 1, "q")))
    assert(got.forall(_._2 <= 4))
  }

  test("documentStats yields every column for downstream filters") {
    val stats = TextAnalysis.documentStats(
      Seq((1L, "the quick brown fox")).toDF("doc_id", "text"))
    val cols = stats.columns.toSet
    assert(Set("n_tokens", "quality", "pred_lang", "fingerprint").subsetOf(cols))
  }

  test("luhnValid separates real card numbers from arbitrary digit runs") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("4242424242424242", true),   // the classic valid test card
      ("4242-4242-4242-4242", true), // separators ignored
      ("1234567890123456", false),  // fails the checksum
      ("4242424242424241", false),  // one digit off
      ("42424242", false),          // too short even if checksum passed
      ("378282246310005", true))    // 15-digit Amex shape
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), TextAnalysis.luhnValid(col("s")).as("ok"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s) }
  }

  test("scrubPiiExtended: valid cards scrub, invalid runs survive") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "pay 4242-4242-4242-4242 or call +1 555-123-4567 at 10.0.0.1"),
      (2L, "order 1234567890123456 shipped"), // Luhn-invalid: keep
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val (scrubbed, cards, phones, ips) =
      TextAnalysis.scrubPiiExtended(col("text"))
    val got = df.select(col("doc_id"), scrubbed, cards, phones, ips)
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    assert(got(0)._2 == "pay <CARD> or call <PHONE> at <IP>")
    assert((got(0)._3, got(0)._4, got(0)._5) == (1, 1, 1))
    assert(got(1)._2 == "order 1234567890123456 shipped") // untouched
    assert((got(1)._3, got(1)._4, got(1)._5) == (0, 0, 0))
    assert(got(2)._2 == "no pii here at all")
  }

  test("gopherRules: each rule rejects its own violation, prose passes") {
    // A clean paragraph comfortably over 50 words, normal word lengths,
    // plenty of the required stopwords.
    val prose = Iterator.continually(
      "the cat and the dog have to be friends with all of that house")
      .take(6).mkString(" ")
    val cases = Seq(
      (1L, prose),                                        // keep
      (2L, "the cat sat with that dog"),                  // r_words: < 50
      (3L, prose.split("\\s+").map(_ => "a").mkString(" ")), // r_mean_len low
      (4L, prose + " " + prose.split("\\s+")
        .map(w => "#" + w).mkString(" ")),                // r_symbol
      (5L, prose.split("\\s+").grouped(2)
        .map(g => "- " + g.mkString(" ")).mkString("\n")), // r_bullet
      (6L, prose.split("\\s+").grouped(2)
        .map(g => g.mkString(" ") + "...").mkString("\n")), // r_ellipsis
      (7L, prose + " " + Seq.fill(300)("12345").mkString(" ")), // r_alpha
      (8L, Seq.fill(60)("lorem ipsum dolor").mkString(" ")))    // r_stopwords
    val out = TextAnalysis.gopherRules(cases.toDF("doc_id", "text"))
      .select("doc_id", "r_words", "r_mean_len", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stopwords", "gopher_keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean,
        Boolean, Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, true, true, true, true, true, true, true, true)))
    assert(!out(1)._2 && !out(1)._9, "short doc fails r_words")
    assert(!out(2)._3, "all-'a' doc fails r_mean_len")
    assert(!out(3)._4, "hash-studded doc fails r_symbol")
    assert(!out(4)._5, "bullet-only lines fail r_bullet")
    assert(!out(5)._6, "ellipsis-ended lines fail r_ellipsis")
    assert(!out(6)._7, "digit-heavy doc fails r_alpha")
    assert(!out(7)._8, "stopword-free doc fails r_stopwords")
    assert(out.drop(1).forall(!_._9), "every violation flips gopher_keep")
  }
}
