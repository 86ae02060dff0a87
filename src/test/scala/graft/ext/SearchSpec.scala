package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class SearchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // ---------------------------------------------------------------- bm25

  test("bm25 ranks the term-dense short doc above a diluted long one") {
    val d = docs(
      1L -> "cat cat cat",
      2L -> ("cat " + Seq.fill(200)("filler").mkString(" ")),
      3L -> "dog dog dog dog",
      4L -> "unrelated words entirely")
    val got = Search.bm25TopK(d, "doc_id", "text", Seq("cat"), 10)
      .as[(Long, Double)].collect()
    // only the two cat docs score > 0
    assert(got.takeWhile(_._2 > 0).map(_._1).toSeq == Seq(1L, 2L))
    assert(got.head._2 > got(1)._2, s"short dense doc must win: ${got.toSeq}")
  }

  test("bm25 multi-term score is the sum of per-term scores") {
    val d = docs(
      1L -> "alpha beta gamma",
      2L -> "alpha alpha alpha",
      3L -> "beta beta",
      4L -> "delta")
    val both = Search.bm25TopK(d, "doc_id", "text", Seq("alpha", "beta"), 10)
      .as[(Long, Double)].collect().toMap
    val a = Search.bm25TopK(d, "doc_id", "text", Seq("alpha"), 10)
      .as[(Long, Double)].collect().toMap
    val b = Search.bm25TopK(d, "doc_id", "text", Seq("beta"), 10)
      .as[(Long, Double)].collect().toMap
    // rounding happens at the output seam, so allow 1e-3 slack
    assert(math.abs(both(1L) - (a(1L) + b(1L))) < 2e-3, s"$both $a $b")
    assert(both(4L) == 0.0)
  }

  test("bm25 idf never goes negative (term in every doc still ranks)") {
    val d = docs(1L -> "the the the", 2L -> "the", 3L -> "the word")
    val got = Search.bm25TopK(d, "doc_id", "text", Seq("the"), 3)
      .as[(Long, Double)].collect()
    assert(got.forall(_._2 > 0), s"Lucene +1 idf must stay positive: ${got.toSeq}")
  }

  test("bm25 rejects un-normalized query terms") {
    val d = docs(1L -> "x")
    intercept[IllegalArgumentException] {
      Search.bm25TopK(d, "doc_id", "text", Seq("Not Normalized!"), 1)
    }
    intercept[IllegalArgumentException] {
      Search.bm25TopK(d, "doc_id", "text", Seq.empty, 1)
    }
  }

  test("bm25 plan: corpus never shuffles — stats row broadcast back") {
    val d = docs(1L -> "a b", 2L -> "b c")
    // Plan exactly as Verify/Bench consume it, with k < corpus rows —
    // EliminateLimits drops a limit that covers the whole (tiny) input
    // and leaves a plain Sort, which never happens at real row counts.
    val plan = Search.bm25TopK(d, "doc_id", "text", Seq("b"), 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // top-k is TakeOrderedAndProject, not a global range-partitioned sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  // ---------------------------------------------------------- lmSurprisal

  test("lm surprisal: rare-token docs score strictly above common-token docs") {
    val common = (1L to 20L).map(i => i -> "common words repeated here")
    val rare = Seq(100L -> "zyzzyva qwerty xylophone")
    val got = Search.lmSurprisal(docs(common ++ rare: _*), "doc_id", "text",
      5, vocabCap = 1000)
      .as[(Long, Double, Long)].collect()
    assert(got.head._1 == 100L, s"OOD doc must top the list: ${got.toSeq}")
    assert(got.head._2 > got(1)._2)
  }

  test("lm surprisal: capped vocab pushes tail tokens to the OOV floor") {
    // vocabCap=1 keeps only the most frequent token; every other token
    // gets the identical OOV probability, so two docs of equally-rare
    // tokens tie exactly.
    val d = docs(
      1L -> "top top top top",
      2L -> "rarea rareb",
      3L -> "rarec rared")
    val got = Search.lmSurprisal(d, "doc_id", "text", 3, vocabCap = 1)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(2L) == got(3L), s"OOV docs must tie: $got")
    assert(got(2L) > got(1L))
  }

  test("lm surprisal: n_tokens counts every token incl. OOV; k bounds rows") {
    val d = docs(1L -> "a b c d e", 2L -> "a a")
    val got = Search.lmSurprisal(d, "doc_id", "text", 1, vocabCap = 2)
    assert(got.count() == 1)
    val all = Search.lmSurprisal(d, "doc_id", "text", 10, vocabCap = 2)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(all == Map(1L -> 5L, 2L -> 2L))
  }

  test("bigram LM: a shuffled-word document scores strictly worse than " +
      "its fluent twin (same token multiset — unigram cannot see this)") {
    // the corpus establishes "the cat sat on the mat" as the fluent
    // phrase; doc 50 repeats it verbatim, doc 51 carries the SAME
    // tokens in scrambled order, so every unigram statistic ties and
    // only the bigram term can separate them
    val background = (1L to 10L).map(i => i -> "the cat sat on the mat")
    val fluent = 50L -> "the cat sat on the mat"
    val shuffled = 51L -> "mat the on sat cat the"
    val got = Search.lmScores(
        docs(background :+ fluent :+ shuffled: _*), "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(51L) > got(50L),
      s"shuffled doc must score worse: fluent=${got(50L)} shuffled=${got(51L)}")
  }

  test("trigram LM: a 3-token-transposed doc scores strictly worse than " +
      "its fluent twin even when every BIGRAM statistic ties") {
    // doc 51 is an Eulerian re-walk of doc 50's bigram multigraph:
    // identical token multiset, identical bigram multiset, same start
    // token, same length — a bigram-interpolated model (multiset of
    // (prev, cur) pairs is all it sees) scores them IDENTICALLY.
    // Only the trigram term separates them: the corpus establishes
    // "c a c" (inside the fluent walk), while the re-walk's "b a b"
    // appears nowhere else.
    val background = (1L to 10L).map(i => i -> "a b c a c b a")
    val fluent = 50L -> "a b c a c b a"
    val rearranged = 51L -> "a c b a b c a"
    val got = Search.lmScores(
        docs(background :+ fluent :+ rearranged: _*), "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(51L) > got(50L),
      s"re-walk must score worse: fluent=${got(50L)} rearranged=${got(51L)}")
  }

  test("lm tier persist lifecycle: no Dataset-level cache entries " +
      "survive lmScores / perplexityBuckets / dsirImportance") {
    spark.catalog.clearCache()
    val d = docs((1L to 30L).map(i =>
      i -> s"token$i the cat sat on the mat ${i % 3}"): _*)
    Search.perplexityBuckets(d, "doc_id", "text", vocabCap = 100).count()
    assert(org.apache.spark.sql.GraftSqlShim.datasetCacheEmpty(spark),
      "perplexityBuckets/lmScores must unpersist their model frames")
    Search.dsirImportance(d, "doc_id", "text",
      col("doc_id") % 2 === 0, 5, vocabCap = 100).count()
    assert(org.apache.spark.sql.GraftSqlShim.datasetCacheEmpty(spark),
      "dsirImportance must unpersist its count frame")
  }

  test("lm surprisal plan: model joins broadcast; no sort-merge on tokens") {
    val d = docs(1L -> "a b", 2L -> "b c")
    // plan-shape on the RAW scoring plan (the public operator
    // checkpoints, which hides the joins behind an RDD scan)
    val (scores, scratch) = Search.lmScoresRaw(d, "doc_id", "text", 50000)
    val plan = scores.queryExecution.executedPlan.toString
    scratch.foreach(_.unpersist())
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the public top-k still plans a bounded TakeOrderedAndProject
    val topPlan = Search.lmSurprisal(d, "doc_id", "text", 1)
      .queryExecution.executedPlan.toString
    assert(topPlan.contains("TakeOrderedAndProject"), topPlan)
  }

  test("oracle SQL generators embed the configured parameters") {
    val sql = Search.bm25OracleSql(Seq("cat", "dog"), 7, 1.2, 0.75)
    assert(sql.contains("x -> x = 'cat'") && sql.contains("x -> x = 'dog'"))
    assert(sql.contains("LIMIT 7"))
    val lm = Search.lmOracleSql(9, 123)
    assert(lm.contains("LIMIT 123") && lm.contains("LIMIT 9"))
    val ds = Search.dsirOracleSql("lang = 'x'", 9, 123)
    assert(ds.contains("lang = 'x'") && ds.contains("LIMIT 9"))
  }

  // ------------------------------------------------------ dsirImportance

  private def langDocs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "lang", "text")

  test("dsir: docs sharing the target's vocabulary rank above off-domain docs") {
    // target = 'code' docs; doc 10 is unlabeled but code-flavored, doc
    // 11 unlabeled prose-flavored — the weight must separate them
    val d = langDocs(
      (1L, "code", "def fn return class import def return"),
      (2L, "code", "class import def return fn fn"),
      (3L, "prose", "the cat sat on the mat and slept"),
      (4L, "prose", "rain fell on the quiet town all day"),
      (10L, "?", "def class import return"),
      (11L, "?", "the cat and the town"))
    val got = Search.dsirImportance(d, "doc_id", "text",
      col("lang") === "code", 10, vocabCap = 1000)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(10L) > got(11L),
      s"code-flavored doc must out-weight prose: $got")
    // in-target docs carry positive weight, off-domain negative
    assert(got(1L) > 0 && got(3L) < 0, s"sign separation: $got")
  }

  test("dsir: k bounds rows, ordering is weight-desc then id") {
    val d = langDocs(
      (1L, "t", "alpha beta"), (2L, "t", "alpha beta"),
      (3L, "o", "gamma delta"))
    val top = Search.dsirImportance(d, "doc_id", "text",
      col("lang") === "t", 2, vocabCap = 100)
      .as[(Long, Double, Long)].collect()
    assert(top.length == 2 && top.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("dsir plan: model joins broadcast; top-k plans TakeOrdered") {
    val d = langDocs((1L, "t", "a b"), (2L, "o", "b c"))
    val (top, scratch) = Search.dsirImportanceRaw(d, "doc_id", "text",
      col("lang") === "t", 1, 50000)
    val plan = top.queryExecution.executedPlan.toString
    scratch.foreach(_.unpersist())
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
