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
    * `keyCols`. Implemented as `min_by` over a hash aggregation — NOT a
    * row_number window: the aggregate combines partially on the map side
    * and never sorts, so a hot key costs one combine per partition
    * instead of pulling its whole group into a single sort. Requires a
    * unique `orderCol` (ties would pick an arbitrary winner). */
  def exact(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val all = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(all, col(orderCol)).as("_row"))
      .select(df.columns.map(c => col(s"_row.$c")).toIndexedSeq: _*)
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

  /** Drop groups over `maxBucket` members.
    *
    * Uses `groupBy.count` (partial map-side aggregation) + a broadcast
    * anti-join of the oversized keys — NOT a window over the bucket key: a
    * window hauls the entire hot bucket into one task to count it, which
    * is exactly the skew this guard exists to prevent. The oversized-key
    * set is tiny by construction (each surviving key has > maxBucket
    * members, so there can be at most |rows|/maxBucket of them), so the
    * anti-join broadcasts and adds no shuffle to the banded frame.
    */
  private def capBuckets(banded: DataFrame, keyCols: Seq[String],
      maxBucket: Int): DataFrame = {
    val oversized = banded
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") > maxBucket)
      .select(keyCols.map(col): _*)
    banded.join(broadcast(oversized), keyCols, "left_anti")
  }

  /** Session conf key selecting the checkpoint mode of the dedup
    * pipelines. Unset (default): `localCheckpoint` — executor-local
    * blocks, fastest, but losing an executor on a real cluster
    * invalidates the materialized pair set mid-job (lineage is truncated,
    * so Spark cannot recompute the lost blocks). Set to a durable
    * directory (HDFS/object store): RELIABLE `checkpoint` — blocks are
    * written to that directory and survive executor loss, the posture a
    * multi-hour 100 TB dedup run needs. Local-mode tests and the bench
    * keep the default.
    */
  val CheckpointDirConf = "spark.graft.dedup.checkpointDir"

  /** Materialize `result`, then unpersist `scratch`. The LSH pipelines
    * persist their banded frame because the candidate self-join reads it
    * twice; without this scope the cached frames outlive the call and
    * executor storage grows without bound across pipeline invocations
    * (round-2 bench showed unrelated queries slowing 3-4× from exactly
    * that). The checkpointed result drops its lineage, so the scratch
    * frame is safe to free immediately; ContextCleaner reclaims the
    * checkpoint blocks once the returned frame is unreferenced.
    *
    * Checkpoint mode is config-selectable via [[CheckpointDirConf]] —
    * executor-local by default, reliable (durable-directory, executor-loss
    * safe) when the conf names a checkpoint dir.
    */
  // last (context, dir) THIS module passed to setCheckpointDir, keyed by
  // application id: checkpoint dirs are per-SparkContext, so a restarted
  // context must be set again. (Reading sc.getCheckpointDir back is a
  // dead guard — Spark stores `<dir>/<uuid>`, never the raw conf value.)
  @volatile private var lastCheckpointDir: Option[(String, String)] = None

  /** Public seam for pipeline stages outside this package that need the
    * same crash-safe materialization the dedup operators use: executor-
    * local checkpoint by default, RELIABLE (durable-directory) when
    * [[CheckpointDirConf]] names one — the form a multi-hour 100 TB run
    * needs between stages. */
  def materialize(result: DataFrame): DataFrame = materializeAndFree(result)

  private[ext] def materializeAndFree(result: DataFrame,
      scratch: DataFrame*): DataFrame = {
    val spark = result.sparkSession
    val out = spark.conf.getOption(CheckpointDirConf) match {
      case Some(dir) if dir.nonEmpty =>
        val key = (spark.sparkContext.applicationId, dir)
        if (!lastCheckpointDir.contains(key)) synchronized {
          if (!lastCheckpointDir.contains(key)) {
            spark.sparkContext.setCheckpointDir(dir)
            lastCheckpointDir = Some(key)
          }
        }
        result.checkpoint(eager = true)
      case _ => result.localCheckpoint(true)
    }
    scratch.foreach(_.unpersist())
    out
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
        GraftFunctions.shingleHashes(
          TextAnalysis.tokens(col(textCol)), shingleSize, seed),
        numHashes, seed).as("_sig"))
    // band j hash = xxhash64 over the j-th signature slice (band indices
    // are compile-time Ints, so the slices are constant-folded offsets)
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("_band"),
        xxhash64(slice(col("_sig"), j * rows + 1, rows), lit(j)).as("_bandHash"))
    }
    // persist BEFORE the bucket cap: the cap's aggregate + probe and the
    // candidate self-join all read this frame — caching it means the
    // tokenize→shingle→minhash pipeline runs exactly once.
    val banded = sigs
      .select(col("_id"), explode(array(bandStructs: _*)).as("_b"))
      .select(col("_id"), col("_b._band").as("_band"),
        col("_b._bandHash").as("_bandHash"))
      .persist()
    val capped = capBuckets(banded, Seq("_band", "_bandHash"), maxBucket)
    val a = capped.select(col("_band"), col("_bandHash"), col("_id").as("id_a"))
    val b = capped.select(col("_band"), col("_bandHash"), col("_id").as("id_b"))
    val pairs = a.join(b, Seq("_band", "_bandHash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    materializeAndFree(pairs, banded)
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
        GraftFunctions.shingleHashes(
          TextAnalysis.tokens(col(textCol)), shingleSize, seed),
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
    * ids-only candidate set — never onto the banded self-join.
    *
    * `candidates`: a precomputed (id_a, id_b) pair frame from
    * [[minhashCandidatePairs]]. Candidate generation (tokenize → shingle →
    * signature → band → self-join) is the expensive stage of the dedup
    * pipeline; a pipeline that both reports candidate pairs and verifies
    * them MUST compute the pair set once and pass it here — re-deriving it
    * per verifier doubles the dominant cost at 100 TB.
    */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
      seed: Long = 42L, shingleSize: Int = 3,
      candidates: Option[DataFrame] = None): DataFrame = {
    val cand = candidates.getOrElse(
      minhashCandidatePairs(df, idCol, textCol, numHashes, bands, seed, shingleSize))
    // verify on the same (hashed) shingle sets the signatures sketch —
    // set ops over bigints, not concatenated strings. Shingles are
    // recomputed ONLY for docs that appear in a candidate pair
    // (semi-join prune): verification cost scales with the candidate
    // set, not the corpus — at 100 TB candidates are a sliver of docs.
    val candIds = cand.select(col("id_a").as("_tid"))
      .union(cand.select(col("id_b").as("_tid"))).distinct()
    val toks = df.select(col(idCol).as("_tid"), col(textCol).as("_text"))
      .join(candIds, Seq("_tid"), "left_semi")
      .select(col("_tid"),
        array_distinct(GraftFunctions.shingleHashes(
          TextAnalysis.tokens(col("_text")), shingleSize, seed))
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

  /** Maximum supported simhash radius. With `chunks = maxHamming + 1`
    * pigeonhole banding, radius 4 ⇒ 5 chunks of 12-13 bits (4096-8192
    * distinct bucket values per chunk) — the narrowest split that still
    * shards a large corpus. Beyond that, chunk keyspaces collapse (radius
    * 8 ⇒ ~128 values, radius 12 ⇒ ~32) and every bucket saturates: the
    * plan degenerates to quadratic work or, with the hot-bucket cap,
    * silent recall collapse. 64-bit simhash is a small-radius sketch by
    * design; for looser similarity use MinHash banding
    * ([[minhashCandidatePairs]]), which shards by content, not bit-chunks.
    * (Higher radii would need multi-chunk key combinations à la Manku et
    * al., WWW'07 — out of scope here.)
    */
  val MaxSimhashRadius: Int = 4

  /** SimHash near-dup candidates: 64-bit sketch, banded into
    * `maxHamming + 1` chunks (pigeonhole-complete for the given radius —
    * a fixed 4-chunk split would silently miss pairs past hamming 3),
    * verified by popcount of the xor. The sketch (one long) rides the
    * join on both sides — 8 bytes, cheap — so verification is free.
    * Radius is capped at [[MaxSimhashRadius]]: see its doc for why wider
    * radii cannot shard.
    */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, seed: Long = 42L,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    hammingNearDuplicates(
      df.select(col(idCol).as("_id"),
        GraftFunctions.simhash64(TextAnalysis.tokens(col(textCol)), seed)
          .as("_sh")),
      maxHamming, maxBucket)

  /** Image near-dup candidates: 64-bit perceptual dHash per image (an
    * integer-deterministic 9×8 luminance comparison grid — re-encodes
    * and small edits land a few bits apart), banded exactly like text
    * simhash. Rows with undecodable payloads drop out (NULL hash). */
  def imageNearDuplicates(df: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    hammingNearDuplicates(
      df.select(col(idCol).as("_id"),
        GraftFunctions.imageDHash(col(bytesCol)).as("_sh"))
        .filter(col("_sh").isNotNull),
      maxHamming, maxBucket)

  /** Audio near-dup candidates: 64-bit energy-envelope fingerprint per
    * PCM clip (65-frame integer envelope — re-encodes and gain changes
    * keep the shape), banded like text simhash. Non-PCM or too-short
    * payloads drop out (NULL hash). */
  def audioNearDuplicates(df: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    hammingNearDuplicates(
      df.select(col(idCol).as("_id"),
        GraftFunctions.audioEnergyHash(col(bytesCol)).as("_sh"))
        .filter(col("_sh").isNotNull),
      maxHamming, maxBucket)

  /** The shared hamming-radius self-join: a 64-bit sketch column banded
    * into `maxHamming + 1` chunks (pigeonhole-complete for the radius —
    * a fixed split would silently miss pairs past its width), candidates
    * by chunk-key equality, verified by popcount of the xor. The sketch
    * (one long) rides the join on both sides — 8 bytes, verification is
    * free. `sk` must have columns `_id` and `_sh`. */
  private def hammingNearDuplicates(sk: DataFrame, maxHamming: Int,
      maxBucket: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= MaxSimhashRadius,
      s"maxHamming must be in [0, $MaxSimhashRadius] (got $maxHamming): " +
        "64-bit banding cannot shard wider radii — use minhash " +
        "candidates for looser similarity")
    val chunks = maxHamming + 1
    val chunkStructs = chunkBounds(chunks).zipWithIndex.map { case ((lo, hi), i) =>
      val width = hi - lo
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(i).as("_chunk"),
        shiftrightunsigned(col("_sh"), lo).bitwiseAND(lit(mask)).as("_ckey"))
    }
    // persist before the cap — see minhashCandidatePairs
    val banded = sk
      .select(col("_id"), col("_sh"), explode(array(chunkStructs: _*)).as("_c"))
      .select(col("_id"), col("_sh"),
        col("_c._chunk").as("_chunk"), col("_c._ckey").as("_ckey"))
      .persist()
    val capped = capBuckets(banded, Seq("_chunk", "_ckey"), maxBucket)
    val a = capped.select(col("_chunk"), col("_ckey"), col("_id").as("id_a"), col("_sh").as("_sha"))
    val b = capped.select(col("_chunk"), col("_ckey"), col("_id").as("id_b"), col("_sh").as("_shb"))
    val pairs = a.join(b, Seq("_chunk", "_ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_sha").bitwiseXOR(col("_shb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    materializeAndFree(pairs, banded)
  }

  /** Exact n-gram (word shingle) Jaccard similarity for given pairs —
    * the verification-grade near-dup measure. `pairs` must have
    * (id_a, id_b). Gram sets are hashed shingles (bigints): identical
    * Jaccard signal, set ops ~10× cheaper than concatenated strings. */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, seed: Long = 42L): DataFrame = {
    // gram sets only for docs referenced by a pair (semi-join prune)
    val pairIds = pairs.select(col("id_a").as("_gid"))
      .union(pairs.select(col("id_b").as("_gid"))).distinct()
    val grams = df.select(col(idCol).as("_gid"), col(textCol).as("_text"))
      .join(pairIds, Seq("_gid"), "left_semi")
      .select(col("_gid"),
        array_distinct(GraftFunctions.shingleHashes(
          TextAnalysis.tokens(col("_text")), n, seed)).as("_grams"))
    pairs
      .join(grams.withColumnRenamed("_gid", "id_a").withColumnRenamed("_grams", "_ga"), "id_a")
      .join(grams.withColumnRenamed("_gid", "id_b").withColumnRenamed("_grams", "_gb"), "id_b")
      .withColumn("ngram_jaccard",
        when(size(array_union(col("_ga"), col("_gb"))) === 0, 0.0)
          .otherwise(size(array_intersect(col("_ga"), col("_gb"))).cast("double") /
            size(array_union(col("_ga"), col("_gb")))))
      .select("id_a", "id_b", "ngram_jaccard")
  }

  /** Benchmark CONTAMINATION detection: flag corpus documents sharing
    * `minOverlap`+ distinct word n-grams with any benchmark/eval
    * document — the decontamination gate a training-data pipeline runs
    * before a corpus reaches a model (the GPT-3/PaLM n-gram-overlap
    * check family). Returns one row per contaminated (doc_id, bench_id)
    * pair with the distinct-gram overlap count.
    *
    * Scale posture: the benchmark side is an eval set — tiny by
    * construction — so its exploded gram table is BROADCAST and the
    * gram-equality join is a scan-local hash probe: the 100 TB corpus
    * never shuffles. Grams are distinct-ed per document BEFORE the
    * join, so a phrase repeated in one document cannot inflate its
    * overlap count. Documents shorter than n tokens contribute their
    * whole token sequence as one gram (ShingleHashes' single-window
    * case, mirroring [[shingles]]). Grams travel as 64-bit shingle
    * hashes, not concatenated strings — same distinct-sequence
    * semantics (collisions vanishingly rare and deterministic), ~an
    * order of magnitude less explode/probe volume on the corpus side,
    * which is the whole cost of this operator. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 5, minOverlap: Int = 1): DataFrame = {
    def grams(df: DataFrame, id: String, text: String, outId: String) =
      df.select(col(id).as(outId),
          explode(array_distinct(GraftFunctions.shingleHashes(
            TextAnalysis.tokens(col(text)), n))).as("_gram"))
    grams(docs, idCol, textCol, "doc_id")
      .join(broadcast(grams(benchmark, benchIdCol, benchTextCol, "bench_id")),
        Seq("_gram"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap_grams"))
      .filter(col("overlap_grams") >= minOverlap)
  }

  /** EXACT substring-overlap pairs (the Lee et al. "Deduplicating
    * Training Data Makes Language Models Better" notion, at window
    * granularity): document pairs sharing at least `minWindows` runs of
    * `n` consecutive tokens. MinHash answers "are these documents
    * mostly the same"; this answers "do they share any long verbatim
    * span" — the shape that catches quoted passages, licence blocks,
    * and templated spam that document-level similarity misses.
    *
    * Shape at scale: every n-token window travels as its 64-bit shingle
    * hash (the same hashed-shingle primitive as minhash — token strings
    * never materialize), distinct-per-doc, then a key-equality SELF-join
    * on the hash — never all-pairs. Windows shared by more than
    * `maxDocsPerWindow` documents are dropped before the join with the
    * same partial-agg + broadcast guard as the minhash hot-bucket cap:
    * such windows are boilerplate (cross-doc line removal territory,
    * [[Boilerplate]]), and joining them would square a hot key. */
  def substringOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 50, minWindows: Int = 1,
      maxDocsPerWindow: Int = DefaultMaxBucket): DataFrame = {
    require(n >= 2, s"window size must be >= 2 tokens (got $n)")
    val windows = df.select(col(idCol).as("_id"),
      explode(array_distinct(GraftFunctions.shingleHashes(
        TextAnalysis.tokens(col(textCol)), n))).as("_w"))
    val hot = windows.groupBy(col("_w"))
      .agg(count(lit(1)).as("_docs"))
      .filter(col("_docs") > maxDocsPerWindow)
      .select(col("_w"))
    val pruned = windows.join(broadcast(hot), Seq("_w"), "left_anti")
    pruned.select(col("_id").as("id_a"), col("_w"))
      .join(pruned.select(col("_id").as("id_b"), col("_w")), Seq("_w"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_windows"))
      .filter(col("shared_windows") >= minWindows)
  }

  /** VERBATIM-SPAN REMOVAL (the second half of Lee et al.'s ExactSubstr
    * dedup — [[substringOverlapPairs]] detects, this EXCISES): every
    * n-token window that appears in ≥ `minDocs` distinct documents is
    * removed from all but its canonical owner (the minimum doc id), so
    * one copy of a quoted passage / licence block survives corpus-wide
    * and the rest of each document is untouched.
    *
    * Shape at 100 TB: one row per (doc, window-start) carrying a
    * 64-bit window hash (tokens never leave their doc), one partial-agg
    * shuffle for per-window (doc-count, owner), one key-equality join
    * back, and a per-doc `collect_set` of removal starts — the
    * reconstruction is a scan-local higher-order expression over the
    * doc's own tokens. Windows duplicated across more than
    * `maxDocsPerWindow` docs are boilerplate and excised NOWHERE by
    * this pass (route them through [[Boilerplate]] removal — excising
    * a window present in half the corpus from everyone but one doc is
    * never the intent of span dedup).
    *
    * Tokens are whitespace runs of the ORIGINAL text (case preserved —
    * the output must still read as the document); a document with
    * removals is re-joined single-spaced, an untouched document passes
    * through byte-identical. Adds `clean_text` + `removed_spans`. */
  def removeVerbatimSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2,
      maxDocsPerWindow: Int = DefaultMaxBucket): DataFrame = {
    require(n >= 2, s"window size must be >= 2 tokens (got $n)")
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs)")
    val toks = split(trim(col(textCol)), "\\s+")
    val wins = df.select(col(idCol).as("_id"), toks.as("_tk"))
      .filter(size(col("_tk")) >= n)
      .select(col("_id"), posexplode(transform(
        sequence(lit(0), size(col("_tk")) - n),
        i => xxhash64(concat_ws("\u0001", slice(col("_tk"), i + 1, lit(n))))))
        .as(Seq("_pos", "_w")))
      .persist()
    val marks =
      try {
        val stats = wins.select(col("_id"), col("_w")).distinct()
          .groupBy(col("_w"))
          .agg(count(lit(1)).as("_docs"), min(col("_id")).as("_owner"))
          .filter(col("_docs") >= minDocs && col("_docs") <= maxDocsPerWindow)
        materializeAndFree(
          wins.join(stats, "_w")
            .where(col("_id") =!= col("_owner"))
            .groupBy(col("_id"))
            .agg(collect_set(col("_pos")).as("_starts")),
          wins)
      } catch { case e: Throwable => wins.unpersist(); throw e }
    df.join(marks.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .withColumn("clean_text",
        when(col("_starts").isNull, col(textCol)).otherwise(
          array_join(
            filter(
              transform(toks, (tok, i) =>
                when(!exists(col("_starts"),
                  s => s <= i && i < s + n), tok)),
              x => x.isNotNull), " ")))
      .withColumn("removed_spans", coalesce(size(col("_starts")), lit(0)))
      .drop("_starts")
  }

  /** Distributed connected components over an undirected edge list, via
    * alternating Large-Star / Small-Star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14).
    *
    * Input: `pairs` with columns (id_a, id_b). Output: (id, component),
    * one row per node that appears in some edge, where `component` is the
    * minimum id in the node's component (the component representative maps
    * to itself). Nodes in no pair are absent — callers union singletons
    * (see [[clusterDedup]]).
    *
    * Why star-contraction and not naive min-label propagation: propagation
    * needs rounds proportional to the graph DIAMETER — a near-dup graph
    * over a web crawl has long chains (doc A ~ B ~ C ~ …), so at 100 TB
    * that is hundreds of shuffle rounds. Large-star/small-star contracts
    * paths doubly-exponentially fast (O(log n) rounds in practice, a
    * handful for any real graph). Each round is two hash-aggregate +
    * broadcast-free equi-join stages over the edge list — shuffle volume
    * stays proportional to |E|, which only shrinks as stars form. Each
    * round is checkpointed ([[CheckpointDirConf]] selects local vs
    * reliable) so the iterative plan's lineage stays O(1).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // canonical directed edge list u > v, no self-loops, no duplicates —
    // checkpointed like every iteration frame: the seed must survive
    // executor loss too when CheckpointDirConf selects reliable mode
    var edges = checkpointIter(pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())

    // convergence signature: order-insensitive (count, hash-xor) — xor,
    // not sum: full-range xxhash64 longs overflow an ANSI-mode sum
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = sig(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Large-Star: for each node u (over the symmetric neighbor view),
      // attach every STRICTLY LARGER neighbor to m = min(N(u) ∪ {u}).
      val und = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val largeMins = und.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge = und.filter(col("v") > col("u"))
        .join(largeMins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

      // Small-Star: edges already point large→small; for each u attach
      // every small neighbor (and u itself) to m = min of its small
      // neighbors.
      val smallMins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val afterSmall = afterLarge.join(smallMins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(smallMins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()

      val next = checkpointIter(afterSmall)
      val cur = sig(next)
      edges.unpersist()
      edges = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    // at convergence every edge is (node, componentMin); representatives
    // map to themselves
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v"), col("v")).distinct())
      .distinct()
  }

  /** Duplicate-cluster RETENTION: keep one canonical document per
    * cluster — the highest-scoring member, ties broken to the lowest
    * id — the "keep best, drop rest" step a training-data pipeline runs
    * right after near-dup clustering (score = quality/length/recency as
    * the pipeline defines it). `labeled` carries one row per document
    * with its cluster label (e.g. [[connectedComponents]] output joined
    * back); the result has one row per cluster:
    * (componentCol, keep_id, keep_score, cluster_size).
    *
    * ONE hash aggregation with map-side combine: the (score, -id) max
    * and the count both partially aggregate before the shuffle, so at
    * 100 TB the shuffle carries one row per (partition × cluster) —
    * never a corpus-wide window sort, which is the naive
    * row_number()-per-cluster plan this replaces. */
  def canonicalPerCluster(labeled: DataFrame, idCol: String,
      componentCol: String, scoreCol: String): DataFrame =
    labeled.groupBy(col(componentCol))
      .agg(
        // lexicographic struct max: highest score, then lowest id
        // (unique ids make the full struct tie-free)
        max(struct(col(scoreCol).as("s"), (-col(idCol)).as("negid"))).as("_m"),
        count(lit(1)).as("cluster_size"))
      .select(col(componentCol), (-col("_m.negid")).as("keep_id"),
        col("_m.s").as("keep_score"), col("cluster_size"))

  /** Checkpoint one iteration frame, honoring [[CheckpointDirConf]]. */
  private def checkpointIter(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(CheckpointDirConf) match {
      case Some(dir) if dir.nonEmpty =>
        val key = (spark.sparkContext.applicationId, dir)
        if (!lastCheckpointDir.contains(key)) synchronized {
          if (!lastCheckpointDir.contains(key)) {
            spark.sparkContext.setCheckpointDir(dir)
            lastCheckpointDir = Some(key)
          }
        }
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(true)
    }
  }

  /** Cluster-aware dedup: one survivor (the minimum id) per connected
    * component of the near-duplicate graph, all other rows kept as-is.
    *
    * This is the principled version of [[minhashDedup]]'s greedy pass:
    * greedy keeps every LOCAL minimum (a doc that is never the greater id
    * of a pair), so pairs (1,3),(2,3) keep both 1 and 2 even though all
    * three are transitively duplicates. Component-based dedup keeps
    * exactly one per cluster.
    */
  def clusterDedup(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SemDeDup-style SEMANTIC near-duplicate pairs (Abbas et al. 2023):
    * k-means cluster the embedding space (`nlist` clusters via
    * [[Similarity.kmeansCentroids]] — per-round cost is one
    * map-side-combining aggregation, vectors never shuffle), then gate
    * exact cosine WITHIN each cluster only. Semantic duplicates are
    * near-identical points, so they share a Voronoi cell almost surely;
    * scoping the pair search to cells turns the corpus-wide O(n²)
    * comparison into O(Σ cell²) ≈ n²/nlist — the published algorithm's
    * core trade (cross-cell pairs are the documented recall cost, and
    * `nlist` scales with corpus size to hold cell sizes flat).
    *
    * Same scale guards as the sketch-based paths: clusters above
    * `maxCluster` are dropped from pairing via the partial-agg +
    * broadcast-anti-join cap (a degenerate embedding cluster — e.g.
    * boilerplate mapped to one point — cannot square the join), and the
    * assigned frame persists only for the span of the self-join.
    *
    * Differs from [[embeddingNearDuplicates]] (hyperplane-LSH buckets,
    * recall amplified by `numTables`): SemDeDup's buckets are LEARNED
    * from the corpus, so one table of data-shaped cells replaces L
    * random-plane tables — fewer candidate pairs at equal recall when
    * the embedding space is clustered, which trained-encoder corpora
    * are. Output: (id_a, id_b, cosine), id_a < id_b. */
  def semanticNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 16, iters: Int = 2,
      seed: Long = 42L, maxCluster: Int = DefaultMaxBucket): DataFrame = {
    val centroids = Similarity.kmeansCentroids(df, idCol, vecCol, nlist, iters, seed)
    val assigned = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_k", Similarity.nearestCentroid(col("_v"), centroids))
      .persist()
    val capped = capBuckets(assigned, Seq("_k"), maxCluster)
    val a = capped.select(col("_k"), col("_id").as("id_a"), col("_v").as("_va"))
    val b = capped.select(col("_k"), col("_id").as("id_b"), col("_v").as("_vb"))
    val pairs = a.join(b, Seq("_k"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", GraftFunctions.cosineSim(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
    materializeAndFree(pairs, assigned)
  }

  /** SemDeDup retention: one survivor per connected component of the
    * [[semanticNearDuplicates]] graph (minimum id), everything else
    * kept — composition with [[clusterDedup]]. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 16, iters: Int = 2,
      seed: Long = 42L): DataFrame =
    clusterDedup(df, idCol,
      semanticNearDuplicates(df, idCol, vecCol, threshold, nlist, iters, seed))

  /** Embedding-cosine near-dup: hyperplane-LSH bucket join (shuffle on
    * the 16-bit sketch), cosine verified per candidate pair. */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numPlanes: Int = 16, seed: Long = 42L,
      maxBucket: Int = DefaultMaxBucket, numTables: Int = 1): DataFrame = {
    require(numTables >= 1, s"numTables must be >= 1 (got $numTables)")
    // LSH amplification: `numTables` independent plane sets (distinct
    // seeds), candidates = bucket collisions in ANY table. One table of
    // k planes catches a pair with probability p^k (p = 1 - angle/pi),
    // which collapses fast as similarity drops toward the threshold;
    // L tables lift recall to 1-(1-p^k)^L — the knob that makes a 0.9
    // threshold reachable without abandoning pruning. Cost scales
    // linearly in L (the candidate join stays banded per (table,
    // bucket)); exact cosines still gate every emitted pair.
    val tables = (0 until numTables).map(tb =>
      struct(lit(tb).as("_table"),
        GraftFunctions.hyperplaneLsh(col(vecCol), numPlanes, seed + tb)
          .as("_bucket")))
    // persist before the cap — see minhashCandidatePairs
    val sk = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
        explode(array(tables: _*)).as("_tb"))
      .select(col("_id"), col("_v"),
        col("_tb._table").as("_table"), col("_tb._bucket").as("_bucket"))
      .persist()
    val capped = capBuckets(sk, Seq("_table", "_bucket"), maxBucket)
    val a = capped.select(col("_table"), col("_bucket"),
      col("_id").as("id_a"), col("_v").as("_va"))
    val b = capped.select(col("_table"), col("_bucket"),
      col("_id").as("id_b"), col("_v").as("_vb"))
    val pairs = a.join(b, Seq("_table", "_bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", GraftFunctions.cosineSim(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .distinct() // a pair may collide in several tables: emit once
    materializeAndFree(pairs, sk)
  }
}
