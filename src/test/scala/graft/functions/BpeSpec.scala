package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** The published head of the GPT-2 merges file (public knowledge —
    * the first ranks every byte-level English BPE learns): enough to
    * assert the MERGE LOOP reproduces known tokenizer behavior. */
  private val gpt2Head = Array(
    "Ġ" -> "t", "Ġ" -> "a", "h" -> "e", "i" -> "n", "r" -> "e",
    "o" -> "n", "Ġt" -> "he", "e" -> "r", "Ġ" -> "s", "a" -> "t",
    "Ġ" -> "w", "Ġ" -> "o", "e" -> "n", "Ġ" -> "c", "i" -> "t",
    "i" -> "s", "a" -> "n", "o" -> "r", "e" -> "s", "Ġ" -> "b")
  private val headTable = new BpeTable(gpt2Head)

  private def toks(table: BpeTable, text: String): Seq[String] = {
    Seq(text).toDF("text")
      .select(GraftFunctions.bpeTokenize(col("text"), table).as("t"))
      .head().getSeq[String](0)
  }

  test("known-sequence: the GPT-2 head merges reproduce published tokenizer behavior") {
    // " the" → Ġthe via (Ġ,t)→Ġt, (h,e)→he, (Ġt,he)→Ġthe — the
    // canonical single-token English word under every GPT-2-family vocab
    assert(toks(headTable, "the theme") == Seq("t", "he", "Ġthe", "m", "e"))
    // rank order decides: in "that", (a,t) rank 9 beats nothing earlier
    // inside "hat"; (Ġt,he) never fires without the space prefix
    assert(toks(headTable, " that is") ==
      Seq("Ġt", "h", "at", "Ġ", "is"))
    // case-preserving: "The" keeps its capital and does NOT merge (no
    // (T,h) rank); contractions split before encoding
    assert(toks(headTable, "The cat isn't here") ==
      Seq("T", "he", "Ġc", "at", "Ġ", "is", "n", "'", "t", "Ġ", "he", "re"))
    // digits split singly; punctuation is its own pretoken
    assert(toks(headTable, "win 42%!") ==
      Seq("w", "in", "Ġ", "4", "2", "%", "!"))
  }

  test("whitespace maps to the GPT-2 byte-encoder code points; stream is space-join safe") {
    assert(toks(headTable, "a\tb\nc") == Seq("a", "ĉ", "b", "Ċ", "c"))
    val all = toks(headTable, " the\tthat\n x ")
    assert(all.forall(t => !t.exists(c => c.isWhitespace)))
  }

  test("null and empty text behave like every null-intolerant string expression") {
    val df = Seq((1, "the"), (2, ""), (3, null)).toDF("id", "text")
      .select(col("id"), GraftFunctions.bpeTokenize(col("text"), headTable).as("t"))
      .orderBy("id").collect()
    assert(df(0).getSeq[String](1).nonEmpty)
    assert(df(1).getSeq[String](1).isEmpty)
    assert(df(2).isNullAt(1))
  }

  /** Rank-ordered replay: one left-to-right non-overlapping replace
    * pass per merge, ascending rank — the ORACLE's arithmetic. The
    * min-rank-first merge loop must agree on every input (the
    * equivalence the DuckDB verify relies on). */
  private def rankOrderedReplay(table: BpeTable, word: String): Seq[String] = {
    var syms = BpeTable.codePointStrings(word).toSeq
    for ((a, b) <- table.merges) {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          out += a + b; j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  test("differential: merge loop == rank-ordered single-pass replay on a trained table") {
    // train a real table (so producibility invariants hold), then check
    // the two application orders agree on adversarial inputs
    val corpus = Seq("the theme that matters", "then there is that",
      "a cat sat on the mat", "deep in the data the engine hums",
      "ten tents, ten tenants", "banana bandana ananas",
      "aaaa aaa aa a", "mississippi dississippi")
    val freqs = corpus.flatMap(BpeTable.pretokens(_))
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val table = new BpeTable(BpeTable.train(freqs, 60, minCount = 1L))
    val inputs = corpus ++ Seq("thethethe", "aaaaaaa", "banananana",
      "the mat sat", "xyzzy", "Ġthe")
    for (text <- inputs; w <- BpeTable.pretokens(text)) {
      val loop = table.encodeCached(w).map(_.toString).toSeq
      val replay = rankOrderedReplay(table, w)
      assert(loop == replay, s"word '$w': loop=$loop replay=$replay")
      assert(loop.mkString == w, s"word '$w' not partitioned by its symbols")
    }
  }

  test("randomized differential: loop == replay on fuzzed corpora and inputs") {
    // the equivalence argument (BpeExpressions doc) quantifies over ALL
    // trained tables and inputs — fuzz it: small alphabets maximize
    // a==b merges, overlapping pairs, and rank collisions
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 40) {
      val alpha = "ab" + ("cdefg".take(rnd.nextInt(4)))
      def word(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val corpus = (0 until 30).map(_ => word(1 + rnd.nextInt(10)))
      val freqs = corpus.groupBy(identity)
        .map { case (w, g) => (w, g.size.toLong) }.toSeq
      val merges = BpeTable.train(freqs, 1 + rnd.nextInt(40), minCount = 1L)
      if (merges.nonEmpty) {
        val table = new BpeTable(merges)
        for (_ <- 0 until 25) {
          val w = word(1 + rnd.nextInt(14))
          val loop = table.encode(w).map(_.toString).toSeq
          val replay = rankOrderedReplay(table, w)
          assert(loop == replay, s"trial $trial word '$w' merges " +
            s"${merges.toSeq}: loop=$loop replay=$replay")
          assert(loop.mkString == w)
        }
      }
    }
  }

  test("greedy a==b pairing matches the left-to-right replace semantics") {
    val table = new BpeTable(Array("a" -> "a"))
    assert(toks(table, "aaa") == Seq("aa", "a"))
    assert(toks(table, "aaaa") == Seq("aa", "aa"))
    assert(toks(table, "aaaaa") == Seq("aa", "aa", "a"))
  }

  test("training learns frequency-ordered merges with deterministic ties") {
    val freqs = Seq(("the", 100L), ("then", 30L), ("he", 5L))
    val merges = BpeTable.train(freqs, 4, minCount = 2L)
    // (t,h) count 130 and (h,e) count 135: (h,e) first, then (t,he)
    assert(merges.take(2).toSeq == Seq("h" -> "e", "t" -> "he"))
    val again = BpeTable.train(freqs, 4, minCount = 2L)
    assert(merges.toSeq == again.toSeq) // deterministic
  }

  test("training stops when no pair reaches minCount") {
    val merges = BpeTable.train(Seq(("ab", 1L), ("cd", 1L)), 10, minCount = 2L)
    assert(merges.isEmpty)
  }

  test("pretokenize column expression matches the table's pretokens") {
    val texts = Seq("The cat isn't 42% done.", "  spaced   out  ", "a\tb")
    val got = texts.toDF("text")
      .select(GraftFunctions.bpePretokenize(col("text")).as("w"))
      .collect().map(_.getSeq[String](0))
    assert(got.toSeq == texts.map(t => BpeTable.pretokens(t).toSeq))
  }
}
