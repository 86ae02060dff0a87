package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // ---- chunkBounds: the pigeonhole banding underlying simhash ----------

  test("chunkBounds partitions 0..64 contiguously without overlap for any chunk count") {
    (1 to 64).foreach { chunks =>
      val bounds = Dedup.chunkBounds(chunks)
      assert(bounds.size == chunks)
      assert(bounds.head._1 == 0 && bounds.last._2 == 64)
      bounds.sliding(2).foreach {
        case Seq((_, hiA), (loB, _)) => assert(hiA == loB)
        case _ =>
      }
      bounds.foreach { case (lo, hi) => assert(lo < hi) }
      assert(bounds.map { case (lo, hi) => hi - lo }.sum == 64)
    }
  }

  // ---- exact dedup ----------------------------------------------------

  test("exact dedup keeps the first writer per key") {
    val df = Seq((1, "a", 10), (2, "a", 20), (3, "b", 30))
      .toDF("id", "key", "v")
    val out = Dedup.exact(df, Seq("key"), "id").orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 3))
  }

  test("exactByContent collapses whitespace/punctuation variants") {
    val docs = Seq(
      (1L, "The quick brown fox"),
      (2L, "the  quick   BROWN fox!!"), // same normalized content
      (3L, "a different document")
    ).toDF("doc_id", "text")
    val out = Dedup.exactByContent(docs, "text", "doc_id")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  // ---- minhash --------------------------------------------------------

  private val nearDupDocs = {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"token$i").mkString(" ") + " x y z"
    Seq(
      (1L, base),
      (2L, base),            // exact duplicate
      (3L, nearDup),         // high-jaccard near duplicate
      (4L, (100 to 160).map(i => s"other$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
  }

  test("minhash near-dup finds planted duplicates and skips unrelated docs") {
    val pairs = Dedup.minhashNearDuplicates(nearDupDocs, "doc_id", "text",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact duplicate pair missing")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "near-duplicate pair missing")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc paired")
  }

  test("minhash jaccard of an exact duplicate is 1.0") {
    val out = Dedup.minhashNearDuplicates(nearDupDocs, "doc_id", "text",
      threshold = 0.9)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("jaccard").as[Double].collect()
    assert(out.length == 1 && out.head == 1.0)
  }

  test("minhashDedup drops the larger id of each duplicate cluster") {
    val kept = Dedup.minhashDedup(nearDupDocs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  test("hot-bucket cap drops degenerate buckets instead of exploding") {
    val clones = (1L to 30L).map(i => (i, "same text for everyone here")).toDF("doc_id", "text")
    val capped = Dedup.minhashCandidatePairs(clones, "doc_id", "text",
      maxBucket = 10)
    assert(capped.count() == 0) // every bucket oversized → dropped
    val uncapped = Dedup.minhashCandidatePairs(clones, "doc_id", "text")
    assert(uncapped.count() == 30L * 29L / 2) // below default cap → all pairs
  }

  // ---- simhash --------------------------------------------------------

  test("simhash pairs exact duplicates at hamming 0 and respects the radius cap") {
    val pairs = Dedup.simhashNearDuplicates(nearDupDocs, "doc_id", "text",
      maxHamming = 4)
      .select("id_a", "id_b", "hamming").collect()
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(exact.isDefined, "exact duplicate not paired")
    assert(exact.get.getInt(2) == 0)
    pairs.foreach(r => assert(r.getInt(2) <= 4))
  }

  test("simhash rejects radii the 64-bit sketch cannot shard") {
    val e = intercept[IllegalArgumentException](
      Dedup.simhashNearDuplicates(nearDupDocs, "doc_id", "text", maxHamming = 8))
    assert(e.getMessage.contains("minhash"))
  }

  // ---- ngram jaccard --------------------------------------------------

  test("ngramJaccard scores exact duplicates 1.0 and near-duplicates high") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(nearDupDocs, pairs, "doc_id", "text", n = 3)
      .orderBy("id_b").collect()
    assert(out(0).getDouble(2) == 1.0)           // 1 vs 2: identical
    assert(out(1).getDouble(2) > 0.7)            // 1 vs 3: near dup
    assert(out(2).getDouble(2) == 0.0)           // 1 vs 4: disjoint
  }

  // ---- embeddings -----------------------------------------------------

  test("embedding near-dup pairs identical vectors, skips orthogonal ones") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDuplicates(vecs, "vec_id", "embedding",
      threshold = 0.95, numPlanes = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("semantic near-dup surfaces perturbed twins inside k-means cells") {
    // 30 orthogonal one-hot docs (background cosine exactly 0) + tiny
    // perturbed twins of the first 6: every twin must pair with its
    // original, nothing else clears the gate
    val base = (0 until 30).map { i =>
      val v = Array.fill(32)(0.0f); v(i) = 1.0f; (i.toLong, v)
    }
    val twins = base.take(6).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.01f))
    }
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticNearDuplicates(df, "vec_id", "embedding",
        threshold = 0.95, nlist = 4, iters = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == base.take(6).map(p => (p._1, p._1 + 1000L)).toSet,
      s"unexpected pair set: $pairs")
  }

  test("semanticDedup keeps one survivor (min id) per duplicate component") {
    val base = (0 until 20).map { i =>
      val v = Array.fill(32)(0.0f); v(i) = 1.0f; (i.toLong, v)
    }
    val twins = base.take(5).map { case (id, v) => (id + 1000L, v) }
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.95, nlist = 4, iters = 2)
    assert(kept.count() == 20)
    assert(kept.filter($"vec_id" >= 1000L).count() == 0,
      "a twin survived over its lower-id original")
  }

  test("oversized semantic cells are capped out of pairing, not squared") {
    // one degenerate cell: 12 identical vectors + 2 twins elsewhere;
    // maxCluster = 8 must drop the hot cell's pairs entirely while the
    // small cell still pairs
    val hot = (0 until 12).map(i => (i.toLong, Array(1.0f, 0.0f, 0.0f)))
    val cold = Seq((100L, Array(0.0f, 1.0f, 0.0f)), (101L, Array(0.0f, 1.0f, 0.001f)))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticNearDuplicates(df, "vec_id", "embedding",
        threshold = 0.9, nlist = 2, iters = 2, maxCluster = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)), s"hot cell leaked pairs: $pairs")
  }

  test("removeVerbatimSpans excises shared runs from non-owners only") {
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $shared omega"),
      (2L, s"prefix words here $shared suffix words"),
      (3L, "completely unrelated text with enough tokens to stand alone")
    ).toDF("doc_id", "text")
    val out = Dedup.removeVerbatimSpans(docs, "doc_id", "text", n = 10)
      .orderBy("doc_id").collect()
    // the canonical owner (minimum id) keeps the passage byte-identical
    assert(out(0).getAs[String]("clean_text") == s"alpha $shared omega")
    assert(out(0).getAs[Int]("removed_spans") == 0)
    // every other doc loses exactly the shared tokens
    assert(out(1).getAs[String]("clean_text") == "prefix words here suffix words")
    assert(out(1).getAs[Int]("removed_spans") == 1)
    // untouched docs pass through byte-identical
    assert(out(2).getAs[String]("clean_text") == out(2).getAs[String]("text"))
    assert(out(2).getAs[Int]("removed_spans") == 0)
  }

  test("LSH scratch frames are unpersisted after each call") {
    Dedup.minhashNearDuplicates(nearDupDocs, "doc_id", "text", threshold = 0.5).count()
    Dedup.simhashNearDuplicates(nearDupDocs, "doc_id", "text", maxHamming = 2).count()
    // Catalyst-cached fragments register in the session cache manager;
    // scratch frames must not accumulate there or in the RDD block store.
    assert(spark.sharedState.cacheManager.isEmpty,
      "banded scratch frame leaked into the cache manager")
  }

  test("verification can reuse a precomputed candidate pair set") {
    val cand = Dedup.minhashCandidatePairs(nearDupDocs, "doc_id", "text")
    val viaShared = Dedup.minhashNearDuplicates(nearDupDocs, "doc_id", "text",
      threshold = 0.5, candidates = Some(cand))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val standalone = Dedup.minhashNearDuplicates(nearDupDocs, "doc_id", "text",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaShared == standalone)
    // and a different verifier consumes the SAME pair frame
    val ngram = Dedup.ngramJaccard(nearDupDocs, cand, "doc_id", "text", n = 3)
    assert(ngram.count() == cand.count())
  }

  test("reliable checkpoint mode survives via the configured directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Dedup.CheckpointDirConf, dir)
    try {
      val pairs = Dedup.minhashCandidatePairs(nearDupDocs, "doc_id", "text")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L))) // same result through the reliable path
      // checkpoint blocks landed in the durable directory, not executor RAM
      def anyFile(p: java.io.File): Boolean =
        p.isFile || Option(p.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(dir)),
        "no checkpoint data written under the configured directory")
    } finally spark.conf.unset(Dedup.CheckpointDirConf)
  }

  test("connected components honors reliable checkpointing for the SEED frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    spark.conf.set(Dedup.CheckpointDirConf, dir)
    try {
      // a single canonical edge converges in exactly one iteration, so the
      // durable dir must hold TWO checkpointed frames: the seed + round 1.
      // Before the fix the seed took localCheckpoint unconditionally and
      // only one rdd-* directory appeared — an executor lost before round
      // 1 completed would kill the job reliable mode promised to survive.
      val out = Dedup.connectedComponents(Seq((2L, 1L)).toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(out == Map(2L -> 1L, 1L -> 1L))
      def rddDirs(p: java.io.File): Int =
        if (p.isDirectory && p.getName.startsWith("rdd-")) 1
        else Option(p.listFiles()).map(_.map(rddDirs).sum).getOrElse(0)
      val n = rddDirs(new java.io.File(dir))
      assert(n >= 2, s"expected seed + iteration checkpoints, found $n rdd dirs")
    } finally spark.conf.unset(Dedup.CheckpointDirConf)
  }

  // ---- connected components (Large-Star/Small-Star) --------------------

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("id_a", "id_b")
    Dedup.connectedComponents(df).as[(Long, Long)].collect().toMap
  }

  /** Driver-side union-find — the independent reference implementation. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connected components labels a chain with its minimum") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("connected components separates disjoint components") {
    assert(cc(Seq((5L, 7L), (10L, 12L), (12L, 11L))) ==
      Map(5L -> 5L, 7L -> 5L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("connected components merges transitively where greedy dedup cannot") {
    // pairs (1,3),(2,3): greedy keeps both 1 and 2; components keep one
    assert(cc(Seq((1L, 3L), (2L, 3L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connected components ignores self-loops, duplicates, and reversals") {
    assert(cc(Seq((4L, 4L), (1L, 2L), (2L, 1L), (1L, 2L))) == Map(1L -> 1L, 2L -> 1L))
  }

  test("connected components on an empty edge list is empty") {
    assert(cc(Seq.empty) == Map.empty)
  }

  test("connected components contracts a 200-node path within the round cap") {
    // a path is the worst case for min-label propagation (diameter = n);
    // star contraction must finish it in O(log n) rounds
    val path = (0L until 200L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("connected components matches union-find on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEdges = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L)))
    val prop = Prop.forAll(genEdges) { edges =>
      val real = edges.filter { case (a, b) => a != b }
      real.isEmpty || cc(real) == unionFind(real)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("clusterDedup keeps exactly the component minima plus singletons") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (9L, "e"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.clusterDedup(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 9L)) // one survivor for {1,2,3}; 4, 9 untouched
  }

  test("canonicalPerCluster keeps the highest score, ties to lowest id, with sizes") {
    val labeled = Seq(
      (1L, 10L, 1L), (2L, 30L, 1L), (3L, 30L, 1L), // max score 30, tie -> id 2
      (7L, 5L, 7L) // singleton keeps itself
    ).toDF("doc_id", "n_chars", "component")
    val got = Dedup.canonicalPerCluster(labeled, "doc_id", "component", "n_chars")
      .orderBy("component")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 30L, 3L), (7L, 7L, 5L, 1L)))
  }

  test("contamination flags n-gram overlap with the benchmark, counts distinct grams") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // contains bench 3-grams
      (2L, "completely different words here entirely now"),
      (3L, "quick brown fox quick brown fox quick brown fox"), // repeated phrase
      (4L, "a b") // shorter than n: whole-doc gram, no match
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox runs")).toDF("bench_id", "text")
    val got = Dedup.contamination(docs, "doc_id", "text",
        bench, "bench_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 shares "the quick brown" + "quick brown fox" (2 distinct);
    // doc 3 repeats "quick brown fox" but it counts ONCE; 2 and 4 clean
    assert(got == Seq((1L, 100L, 2L), (3L, 100L, 1L)))
  }

  test("substringOverlapPairs finds shared token runs, caps hot windows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zero alpha beta gamma delta nine"),      // shares 2 4-runs w/ 1
      (3L, "totally different words here entirely"),
      (4L, "alpha beta gamma delta epsilon zeta")    // exact dup of 1
    ).toDF("doc_id", "text")
    val got = Dedup.substringOverlapPairs(docs, "doc_id", "text", n = 4)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    // 1~2 share windows (alpha..delta) and (beta..epsilon)? no — doc 2's
    // runs are zero-alpha-beta-gamma / alpha-beta-gamma-delta /
    // beta-gamma-delta-nine: only alpha-beta-gamma-delta matches doc 1
    assert(got == Seq((1L, 2L, 1L), (1L, 4L, 3L), (2L, 4L, 1L)))
    // hot-window cap: a window in EVERY doc is boilerplate, not overlap
    val spam = (1L to 30L).map(i => (i, s"shared spam run here unique$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.substringOverlapPairs(spam, "doc_id", "text",
      n = 4, maxDocsPerWindow = 10)
    assert(capped.isEmpty, "cap must drop the 30-doc window")
  }
}
