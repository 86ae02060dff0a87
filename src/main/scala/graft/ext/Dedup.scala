package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deduplication operators for training-data pipelines (north star).
  *
  * Scale posture for all of these: candidate generation is always a
  * key-equality shuffle (band bucket / simhash chunk / LSH bucket), never
  * an all-pairs product; verification runs only on candidate pairs. No
  * stage collects data to the driver, so the same plan runs at 100 TB —
  * the shuffle keys (band hashes) distribute uniformly by construction.
  */
object Dedup {

  /** Exact dedup: first-writer-wins by `orderCol` within identical
    * `keyCols` (hash-partitioned groupBy under the hood). */
  def exact(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact content dedup on a normalized text hash — one shuffle on a
    * 64-bit key regardless of document size. */
  def exactByContent(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exact(df.withColumn("_ch", xxhash64(TextAnalysis.normalize(col(textCol)))),
      Seq("_ch"), idCol).drop("_ch")

  /** Default hot-bucket guard: LSH buckets with more members than this
    * are dropped from candidate generation (a degenerate key — e.g. many
    * near-empty documents hashing identically — would otherwise produce a
    * quadratic bucket; at 100 TB that is the difference between a shuffle
    * and a stuck executor). Dropped buckets are overwhelmingly junk
    * (empty/boilerplate docs), the standard trade in web-scale dedup.
    */
  val DefaultMaxBucket: Int = 10000

  /** Drop groups over `maxBucket` members. One extra aggregation on the
    * same shuffle key the candidate join uses (AQE co-locates them). */
  private def capBuckets(banded: DataFrame, keyCols: Seq[String],
      maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
    banded.withColumn("_bsz", count(lit(1)).over(w))
      .filter(col("_bsz") <= maxBucket)
      .drop("_bsz")
  }

  /** MinHash + LSH banding candidate pairs — ids only.
    *
    * tokens → one-pass MinHash signature (numHashes) → `bands` bands of
    * `numHashes/bands` rows; docs sharing any band hash become a candidate
    * pair (equi-self-join on the band key — broadcast-free, shuffle on
    * (band, hash)). Only (band, hash, id) enters the shuffle — signatures
    * stay out of the join (at 100 TB the 64×8-byte signature on both sides
    * of a self-join dominates shuffle volume for no benefit, since exact
    * verification re-reads token sets anyway). Returns distinct
    * (id_a, id_b) with id_a < id_b.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, seed: Long = 42L,
      shingleSize: Int = 3, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = df.select(
      col(idCol).as("_id"),
      GraftFunctions.minhashSignature(
        shingles(TextAnalysis.tokens(col(textCol)), shingleSize),
        numHashes, seed).as("_sig"))
    // band j hash = xxhash64 over the j-th signature slice (band indices
    // are compile-time Ints, so the slices are constant-folded offsets)
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("_band"),
        xxhash64(slice(col("_sig"), j * rows + 1, rows), lit(j)).as("_bandHash"))
    }
    val banded = capBuckets(
      sigs.select(col("_id"), explode(array(bandStructs: _*)).as("_b"))
        .select(col("_id"), col("_b._band").as("_band"),
          col("_b._bandHash").as("_bandHash")),
      Seq("_band", "_bandHash"), maxBucket)
      // persist: the self-join reads the banded frame twice; without this
      // the whole tokenize→minhash pipeline runs twice
      .persist()
    val a = banded.select(col("_band"), col("_bandHash"), col("_id").as("id_a"))
    val b = banded.select(col("_band"), col("_bandHash"), col("_id").as("id_b"))
    a.join(b, Seq("_band", "_bandHash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Candidate pairs with the signature-agreement Jaccard estimate
    * (kept for estimate-only callers; joins signatures back onto the
    * ids-only pair set rather than carrying them through the self-join).
    */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, seed: Long = 42L,
      shingleSize: Int = 3): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, numHashes, bands, seed, shingleSize)
    val sigs = df.select(
      col(idCol).as("_sid"),
      GraftFunctions.minhashSignature(
        shingles(TextAnalysis.tokens(col(textCol)), shingleSize),
        numHashes, seed).as("_s"))
    pairs
      .join(sigs.withColumnRenamed("_sid", "id_a").withColumnRenamed("_s", "_sig_a"), "id_a")
      .join(sigs.withColumnRenamed("_sid", "id_b").withColumnRenamed("_s", "_sig_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        sigAgreement(col("_sig_a"), col("_sig_b"), numHashes).as("jaccard_est"))
  }

  /** Signature-agreement estimate of Jaccard for candidate pairs. */
  private def sigAgreement(sa: Column, sb: Column, numHashes: Int): Column =
    aggregate(zip_with(sa, sb, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

  /** Candidate pairs verified with the exact token-set Jaccard, filtered
    * at `threshold`. Verification joins token sets onto the (small)
    * ids-only candidate set — never onto the banded self-join. */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
      seed: Long = 42L, shingleSize: Int = 3): DataFrame = {
    val cand = minhashCandidatePairs(df, idCol, textCol, numHashes, bands, seed, shingleSize)
    // verify on the same shingle sets the signatures sketch
    val toks = df.select(col(idCol).as("_tid"),
      array_distinct(shingles(TextAnalysis.tokens(col(textCol)), shingleSize))
        .as("_toks"))
    cand
      .join(toks.withColumnRenamed("_tid", "id_a").withColumnRenamed("_toks", "_ta"), "id_a")
      .join(toks.withColumnRenamed("_tid", "id_b").withColumnRenamed("_toks", "_tb"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("_ta"), col("_tb"))).cast("double") /
          size(array_union(col("_ta"), col("_tb"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Greedy near-dedup: drop every doc that is the greater id of some
    * near-duplicate pair (keeps cluster minima; one pass, no driver state). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val losers = minhashNearDuplicates(df, idCol, textCol, threshold, numHashes, bands)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Bit boundaries splitting 64 bits into `chunks` near-equal ranges:
    * boundary(i) = i*64/chunks. With `chunks = maxHamming + 1`, any two
    * sketches within `maxHamming` differing bits share at least one
    * untouched chunk (pigeonhole), so banding on chunk equality is
    * recall-complete for the requested radius. */
  private[ext] def chunkBounds(chunks: Int): Seq[(Int, Int)] =
    (0 until chunks).map(i => (i * 64 / chunks, (i + 1) * 64 / chunks))

  /** SimHash near-dup candidates: 64-bit sketch, banded into
    * `maxHamming + 1` chunks (pigeonhole-complete for the given radius —
    * a fixed 4-chunk split would silently miss pairs past hamming 3),
    * verified by popcount of the xor. The sketch (one long) rides the
    * join on both sides — 8 bytes, cheap — so verification is free.
    * Narrower chunks at higher radii mean bigger buckets; the hot-bucket
    * cap bounds the worst case.
    */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, seed: Long = 42L,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming out of range: $maxHamming")
    val chunks = maxHamming + 1
    val sk = df.select(col(idCol).as("_id"),
      GraftFunctions.simhash64(TextAnalysis.tokens(col(textCol)), seed).as("_sh"))
    val chunkStructs = chunkBounds(chunks).zipWithIndex.map { case ((lo, hi), i) =>
      val width = hi - lo
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(i).as("_chunk"),
        shiftrightunsigned(col("_sh"), lo).bitwiseAND(lit(mask)).as("_ckey"))
    }
    val banded = capBuckets(
      sk.select(col("_id"), col("_sh"), explode(array(chunkStructs: _*)).as("_c"))
        .select(col("_id"), col("_sh"),
          col("_c._chunk").as("_chunk"), col("_c._ckey").as("_ckey")),
      Seq("_chunk", "_ckey"), maxBucket)
      .persist()
    val a = banded.select(col("_chunk"), col("_ckey"), col("_id").as("id_a"), col("_sh").as("_sha"))
    val b = banded.select(col("_chunk"), col("_ckey"), col("_id").as("id_b"), col("_sh").as("_shb"))
    a.join(b, Seq("_chunk", "_ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_sha").bitwiseXOR(col("_shb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (word shingle) Jaccard similarity for given pairs —
    * the verification-grade near-dup measure. `pairs` must have
    * (id_a, id_b). */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val grams = df.select(col(idCol).as("_gid"),
      array_distinct(shingles(TextAnalysis.tokens(col(textCol)), n)).as("_grams"))
    pairs
      .join(grams.withColumnRenamed("_gid", "id_a").withColumnRenamed("_grams", "_ga"), "id_a")
      .join(grams.withColumnRenamed("_gid", "id_b").withColumnRenamed("_grams", "_gb"), "id_b")
      .withColumn("ngram_jaccard",
        when(size(array_union(col("_ga"), col("_gb"))) === 0, 0.0)
          .otherwise(size(array_intersect(col("_ga"), col("_gb"))).cast("double") /
            size(array_union(col("_ga"), col("_gb")))))
      .select("id_a", "id_b", "ngram_jaccard")
  }

  /** Word n-gram shingles from a token array (joined with the \\u0001 separator). */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array(concat_ws("\u0001", tokens)))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws("\u0001", slice(tokens, i + lit(1), lit(n)))))

  /** Embedding-cosine near-dup: hyperplane-LSH bucket join (shuffle on
    * the 16-bit sketch), cosine verified per candidate pair. */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numPlanes: Int = 16, seed: Long = 42L,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sk = capBuckets(
      df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
        GraftFunctions.hyperplaneLsh(col(vecCol), numPlanes, seed).as("_bucket")),
      Seq("_bucket"), maxBucket)
      .persist()
    val a = sk.select(col("_bucket"), col("_id").as("id_a"), col("_v").as("_va"))
    val b = sk.select(col("_bucket"), col("_id").as("id_b"), col("_v").as("_vb"))
    a.join(b, Seq("_bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", GraftFunctions.cosineSim(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }
}
