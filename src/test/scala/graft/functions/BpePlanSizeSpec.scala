package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The architectural promise of the rank-map BPE tier: merge count is
  * DATA, not plan — 20 ranks and 3000 ranks must produce the same plan
  * text (modulo the count digits) and the same generated-code size,
  * unlike the folded-literal-replace tier whose expression tree grows
  * O(merges). */
class BpePlanSizeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val small = new BpeTable(Array("t" -> "h", "th" -> "e"))
  private lazy val big = graft.ext.BpeVocab.Default // 3000 shipped ranks

  private def planText(table: BpeTable): String = {
    // non-foldable source (a literal would be constant-folded away
    // plan-side and hide the expression entirely)
    val df = spark.range(4).select(col("id").cast("string").as("text"))
      .select(GraftFunctions.bpeTokenize(col("text"), table).as("toks"))
    df.queryExecution.executedPlan.treeString
  }

  test("plan text size is independent of merge count") {
    val a = planText(small)
    val b = planText(big)
    // identical once the table's summary (which prints only the COUNT)
    // and the session-global expression ids are normalized — the
    // merges themselves never appear in the plan
    val norm = (s: String) => s.replaceAll("BpeTable\\(\\d+ merges\\)",
      "BpeTable(N merges)").replaceAll("#\\d+", "#N")
    assert(norm(a) == norm(b),
      s"plans differ beyond the merge count:\n$a\n---\n$b")
    assert(!a.contains("Ġ") && !b.contains("Ġ"),
      "merge symbols leaked into the plan text")
  }

  test("expression sql/toString do not enumerate merges") {
    val e = BpeTokenize(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), big)
    assert(e.toString.length < 200, e.toString.take(300))
  }

  test("the shipped table is production-shape: thousands of ranks, " +
      "case-preserving, space-prefixed") {
    assert(big.merges.length >= 2000, s"only ${big.merges.length} ranks")
    assert(big.merges.exists { case (a, b) => (a + b) == "Ġthe" },
      "the canonical 'Ġthe' merge is missing")
    assert(big.merges.exists { case (a, b) => (a + b).exists(_.isUpper) },
      "no case-preserving merge learned")
    assert(big.merges.exists { case (a, b) => (a + b) == "ing" },
      "the 'ing' suffix merge is missing")
    // every merge's sides are producible: either single code points or
    // the output of an EARLIER rank (the validity invariant the oracle
    // replay relies on)
    val produced = scala.collection.mutable.HashSet[String]()
    big.merges.foreach { case (a, b) =>
      for (s <- Seq(a, b)) {
        assert(BpeTable.codePointStrings(s).length == 1 || produced(s),
          s"merge side '$s' not producible at its rank")
      }
      produced += (a + b)
    }
  }

  test("common English words tokenize near 1 token/word under the shipped vocab") {
    val text = "the data is in the table and the system can read it"
    val n = Seq(text).toDF("text")
      .select(size(GraftFunctions.bpeTokenize(col("text"), big)).as("n"))
      .head().getInt(0)
    val words = text.split(" ").length
    assert(n <= words * 2, s"$n tokens for $words common words")
    assert(n >= words, "token count below word count is impossible here")
  }
}
