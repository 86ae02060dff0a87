package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus search / statistical quality scoring over the `documents`
  * table shape (north-star extension — SURVEY.md §7.1 module 7; the
  * reference's warehouse has no retrieval tier at all).
  *
  * Both operators are built so their arithmetic can be REPLAYED
  * verbatim by the DuckDB oracle: tokenization is
  * [[TextAnalysis.normalize]] + split-on-space (the same two
  * regexp_replace calls exist in DuckDB), every score is a fixed-order
  * IEEE-double expression, and ordering keys round before comparing so
  * cross-engine last-bit drift in `avg()` cannot reorder the output.
  *
  * Scale posture (the part that must survive 100 TB):
  *  - `bm25TopK`: per-document term frequencies are scan-local array
  *    expressions (no explode, no shuffle); the corpus statistics
  *    (N, avgdl, per-term document frequency) are ONE partially
  *    aggregated single-row frame that is broadcast back, so the whole
  *    query is scan → 1-row-agg → broadcast → TakeOrderedAndProject.
  *    Nothing shuffles the corpus.
  *  - `lmSurprisal`: one explode + one count shuffle PER MODEL ORDER
  *    (unigram, bigram, trigram; the context-mass counts re-aggregate
  *    the gram frames, never the corpus) builds the interpolated-
  *    trigram model; every vocabulary cut is capped (`vocabCap`,
  *    default 50 k) via TakeOrderedAndProject so the model side is
  *    always broadcastable regardless of corpus size; scoring is
  *    broadcast left joins + one per-doc partial-avg shuffle. OOV mass
  *    is add-one smoothing over the FULL totals, so the capped model
  *    is a proper distribution, not a truncated one. Model frames are
  *    unpersisted before returning (materialize-then-free — nothing
  *    leaks into executor storage across operator calls).
  */
object Search {

  /** Sum columns left-to-right (fixed association so the oracle's
    * `+` chain produces bit-identical doubles). */
  private def chainSum(cols: Seq[org.apache.spark.sql.Column]) =
    cols.reduceLeft(_ + _)

  /** BM25 top-k retrieval for a constant bag of query terms.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (Lucene's +1 form —
    * never negative, so a term in most documents dilutes rather than
    * flips the ranking).
    *
    * Output: (idCol, score) — score rounded to 4 before the ordering
    * key so the top-k cutoff is deterministic across engines; ties
    * break on the id.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.forall(_.matches("[a-z0-9]+")),
      s"terms must be normalized (lowercase alnum): $terms")
    val base = docs.select(col(idCol),
      split(TextAnalysis.normalize(col(textCol)), " ").as("_toks"))
      .withColumn("_dl", size(col("_toks")).cast("double"))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (df, (term, i)) =>
      df.withColumn(s"_tf$i",
        size(filter(col("_toks"), x => x === lit(term))).cast("double"))
    }
    // Corpus stats: a single row (count, avg doc length, per-term doc
    // frequency) — partial-aggregated, then broadcast back. This is the
    // only non-scan-local work in the query.
    val stats = withTf.agg(
      count(lit(1)).cast("double").as("_n"),
      avg(col("_dl")).as("_avgdl") +:
        terms.indices.map(i =>
          sum((col(s"_tf$i") > 0).cast("double")).as(s"_df$i")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val perTerm = terms.indices.map { i =>
      val tf = col(s"_tf$i")
      val idf = log((col("_n") - col(s"_df$i") + lit(0.5)) /
        (col(s"_df$i") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
    }
    // The final RENAMING projection is load-bearing: Project(Limit(Sort))
    // plans as TakeOrderedAndProject (bounded per-partition heaps, O(k)
    // memory), where a bare root limit leaves a global range-partitioned
    // sort in the plan — the difference between O(k) and O(corpus) at
    // 100 TB. Asserted in SearchSpec.
    scored
      .select(col(idCol), round(chainSum(perTerm), 4).as("_s"))
      .orderBy(col("_s").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("_s").as("score"))
  }

  /** The DuckDB replay of [[bm25TopK]] over table `documents`
    * (kept HERE so the Spark expression and its oracle can only drift
    * in one file). Emits the same fixed-order arithmetic; constants are
    * written as the same source-level doubles Spark folds. */
  def bm25OracleSql(terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(_toks, x -> x = '$t')) AS DOUBLE) AS _tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"sum(CAST(_tf$i > 0 AS DOUBLE)) AS _df$i").mkString(", ")
    val score = terms.indices.map { i =>
      s"ln((_n - _df$i + 0.5) / (_df$i + 0.5) + 1.0) * (_tf$i * ($k1 + 1.0)) / " +
        s"(_tf$i + $k1 * ((1.0 - $b) + $b * _dl / _avgdl))"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         string_split(trim(regexp_replace(regexp_replace(lower(text),
       |           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS _toks
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, CAST(len(_toks) AS DOUBLE) AS _dl, $tfCols FROM toks
       |), stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS _n, avg(_dl) AS _avgdl, $dfCols FROM tf
       |)
       |SELECT doc_id, round($score, 4) AS score
       |FROM tf CROSS JOIN stats
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Per-document mean token surprisal under the corpus's own
    * INTERPOLATED TRIGRAM model (Jelinek–Mercer backoff mix) — the
    * scoring core shared by [[lmSurprisal]] (top-k) and
    * [[perplexityBuckets]] (CCNet-style corpus partitioning, Wenzek et
    * al., LREC 2020; the original uses a 5-gram KenLM — trigram is
    * where this tier STOPS by design: one more order explodes the
    * vocabulary for marginal signal without KenLM-style pruning).
    * Word ORDER matters at range 3: a document with a transposed
    * 3-token window scores strictly worse than its fluent twin even
    * when every unigram AND bigram statistic ties (spec'd — a bigram
    * model provably cannot see it).
    *
    * Model (all add-one smoothed on top-`vocabCap` cuts, OOV floors;
    * the λ weights are binary-exact doubles so the oracle's literals
    * reproduce them bit-for-bit):
    *   p1(t)     = (c1(t) + 1) / (T + V1 + 1)
    *   p2(c|b)   = (c2(b,c) + 1) / (cl2(b) + V2 + 1)
    *   p3(c|a,b) = (c3(a,b,c) + 1) / (cl3(a,b) + V3 + 1)
    *   p(t_0)    = p1(t_0)
    *   p(t_1)    = 0.5·p2 + 0.5·p1
    *   p(t_i)    = 0.5·p3 + 0.25·p2 + 0.25·p1              (i ≥ 2)
    *   nll       = mean over tokens of −ln p  (exp(nll) = perplexity)
    * T = total corpus tokens, V1/V2/V3 = capped vocab sizes, cl2(b) /
    * cl3(a,b) = times the context opens a bi-/trigram (context mass).
    *
    * Scale posture: ONE grouping-sets count aggregation covers all
    * three orders in a single pass over the token explosion
    * (context-mass counts re-aggregate the cached gram frame, never
    * the corpus), every model cut is a broadcastable top-V
    * (TakeOrderedAndProject — never a full sort), and scoring is
    * broadcast joins over the explosion — no shuffle grows past the
    * token count itself. Lifecycle: the returned frame is MATERIALIZED
    * (per-doc scores — O(docs), tiny next to the corpus) and the one
    * persisted gram-count frame is unpersisted before returning, so
    * a caller can never leak O(distinct-grams) cache blocks into the
    * rest of the session ([[Dedup.materializeAndFree]] — the same
    * discipline every dedup operator follows). */
  def lmScores(docs: DataFrame, idCol: String, textCol: String,
      vocabCap: Int = 50000): DataFrame = {
    val (scores, scratch) = lmScoresRaw(docs, idCol, textCol, vocabCap)
    Dedup.materializeAndFree(scores, scratch: _*)
  }

  /** The un-materialized scoring plan + the persisted scratch frames —
    * split out so the plan-shape spec can assert the broadcast-join
    * shape (the public [[lmScores]] checkpoints, which hides the
    * scoring plan behind an RDD scan). Callers OWN the scratch frames'
    * unpersist. */
  private[ext] def lmScoresRaw(docs: DataFrame, idCol: String,
      textCol: String, vocabCap: Int): (DataFrame, Seq[DataFrame]) = {
    val toksCol = split(TextAnalysis.normalize(col(textCol)), " ")
    // (cur, prev, prev2) per token; prev NULL opens the document
    // (position 0), prev2 NULL marks position ≤ 1
    val terms = docs.select(col(idCol).as("_id"), toksCol.as("_arr"))
      .select(col("_id"), explode(transform(col("_arr"), (t, i) =>
        struct(t.as("c"), get(col("_arr"), i - 1).as("p"),
          get(col("_arr"), i - 2).as("q")))).as("_tk"))
      .select(col("_id"), col("_tk.c").as("_cur"), col("_tk.p").as("_prev"),
        col("_tk.q").as("_prev2"))
    // ALL THREE gram orders are counted in ONE pass over the token
    // explosion via GROUPING SETS — the former spelling ran one
    // aggregation per order, which re-exploded the corpus three times
    // (three full scans at 100 TB; the partial map-side agg bounds the
    // shuffle by distinct grams either way, so the expansion costs no
    // extra network). The single aggregated frame is persisted —
    // O(distinct grams), not O(corpus) — and every consumer (top-V
    // cuts, context-mass re-aggs, model totals, the scoring joins)
    // reads it as a cheap cached filter. lmScores unpersists it.
    // grouping_id over (_cur, _prev, _prev2): (cur)=3, (prev,cur)=1,
    // (prev2,prev,cur)=0. Data nulls (document-opening positions) are
    // excluded from the bi/tri groups by the same isNotNull filters the
    // per-order aggregations applied.
    val grams = terms
      .groupingSets(
        Seq(Seq(col("_cur")), Seq(col("_prev"), col("_cur")),
          Seq(col("_prev2"), col("_prev"), col("_cur"))),
        col("_cur"), col("_prev"), col("_prev2"))
      .agg(count(lit(1)).cast("double").as("_c"),
        grouping_id().as("_gid"))
      .persist()
    val counts = grams.filter(col("_gid") === 3)
      .select(col("_cur").as("_tok"), col("_c"))
    // Model totals come from the FULL count frames; the broadcastable
    // vocabs are top-V cuts (TakeOrderedAndProject — never a full sort).
    val vocab = counts.orderBy(col("_c").desc, col("_tok")).limit(vocabCap)
    val bi = grams.filter(col("_gid") === 1 && col("_prev").isNotNull)
      .select(col("_prev").as("_bp"), col("_cur").as("_bc"),
        col("_c").as("_c2"))
    val bivocab = bi.orderBy(col("_c2").desc, col("_bp"), col("_bc"))
      .limit(vocabCap)
    val leftvocab = bi.groupBy(col("_bp").as("_lp"))
      .agg(sum(col("_c2")).as("_cl"))
      .orderBy(col("_cl").desc, col("_lp")).limit(vocabCap)
    val tri = grams.filter(col("_gid") === 0 && col("_prev2").isNotNull)
      .select(col("_prev2").as("_ta"), col("_prev").as("_tb"),
        col("_cur").as("_tc"), col("_c").as("_c3"))
    val trivocab = tri.orderBy(col("_c3").desc, col("_ta"), col("_tb"),
      col("_tc")).limit(vocabCap)
    val left3vocab = tri.groupBy(col("_ta").as("_la"), col("_tb").as("_lb"))
      .agg(sum(col("_c3")).as("_cl3"))
      .orderBy(col("_cl3").desc, col("_la"), col("_lb")).limit(vocabCap)
    val stats = counts.agg(sum(col("_c")).as("_t"),
        least(count(lit(1)), lit(vocabCap.toLong)).cast("double").as("_v"))
      .crossJoin(bi.agg(least(count(lit(1)), lit(vocabCap.toLong))
        .cast("double").as("_v2")))
      .crossJoin(tri.agg(least(count(lit(1)), lit(vocabCap.toLong))
        .cast("double").as("_v3")))
    val p1 = (coalesce(col("_c"), lit(0.0)) + lit(1.0)) /
      (col("_t") + col("_v") + lit(1.0))
    val p2 = (coalesce(col("_c2"), lit(0.0)) + lit(1.0)) /
      (coalesce(col("_cl"), lit(0.0)) + col("_v2") + lit(1.0))
    val p3 = (coalesce(col("_c3"), lit(0.0)) + lit(1.0)) /
      (coalesce(col("_cl3"), lit(0.0)) + col("_v3") + lit(1.0))
    val tokNll = when(col("_prev").isNull, -log(p1))
      .when(col("_prev2").isNull, -log(p2 * lit(0.5) + p1 * lit(0.5)))
      .otherwise(-log(p3 * lit(0.5) + p2 * lit(0.25) + p1 * lit(0.25)))
    val scores = terms
      .join(broadcast(vocab), col("_cur") === col("_tok"), "left")
      .join(broadcast(bivocab),
        col("_prev") === col("_bp") && col("_cur") === col("_bc"), "left")
      .join(broadcast(leftvocab), col("_prev") === col("_lp"), "left")
      .join(broadcast(trivocab),
        col("_prev2") === col("_ta") && col("_prev") === col("_tb") &&
          col("_cur") === col("_tc"), "left")
      .join(broadcast(left3vocab),
        col("_prev2") === col("_la") && col("_prev") === col("_lb"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("_id"))
      .agg(round(avg(tokNll), 4).as("nll"),
        count(lit(1)).as("n_tokens"))
      .select(col("_id").as(idCol), col("nll"), col("n_tokens"))
    (scores, Seq(grams))
  }

  def lmSurprisal(docs: DataFrame, idCol: String, textCol: String,
      k: Int, vocabCap: Int = 50000): DataFrame =
    lmScores(docs, idCol, textCol, vocabCap)
      .orderBy(col("nll").desc, col(idCol))
      .limit(k)

  /** CCNet-style PERPLEXITY BUCKETING (Wenzek et al., LREC 2020):
    * score every document with [[lmScores]], cut the corpus at the nll
    * terciles into head (most model-like), middle, tail, and keep each
    * bucket at its configured rate via the deterministic hash carve —
    * the standard "keep the head, sample the middle, drop most of the
    * tail" cleaning recipe. Returns the kept rows tagged with their
    * bucket.
    *
    * Scale shape: the cutoffs are ONE exact-percentile aggregation
    * (nll is rounded to 4 decimals, so its distinct cardinality is
    * bounded) collected as two doubles; bucketing and the carve are
    * scan-local literal comparisons. No global sort anywhere — the
    * naive ntile(3) spelling would be a single-task window.
    *
    * Lifecycle: [[lmScores]] already returns a MATERIALIZED frame, so
    * both consumers here (cutoff agg + bucketing scan) are cheap block
    * reads — nothing is persisted by this method, and a caller-supplied
    * `precomputedScores` frame is never persisted behind the caller's
    * back (the caller owns its frame's caching). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      rates: (Double, Double, Double) = (1.0, 0.5, 0.1),
      vocabCap: Int = 50000,
      seed: Long = Splits.MixSeed,
      precomputedScores: Option[DataFrame] = None,
      precomputedCuts: Option[(Double, Double)] = None): DataFrame = {
    // scores feed the cutoff aggregation AND the bucketing scan; a
    // caller that already scored the corpus (pipeline reuse) passes
    // the frame in instead of paying the model fit twice — and a
    // caller that already aggregated the tercile cutoffs passes THEM
    // in too, instead of paying the same percentile job twice
    val scored = precomputedScores
      .getOrElse(lmScores(docs, idCol, textCol, vocabCap))
    val (c1, c2) = precomputedCuts.getOrElse {
      val cuts = scored.agg(
        expr("percentile(nll, 0.3333333333333333)").as("c1"),
        expr("percentile(nll, 0.6666666666666666)").as("c2")).head()
      (cuts.getDouble(0), cuts.getDouble(1))
    }
    val withBucket = scored.withColumn("bucket",
      when(col("nll") <= c1, "head")
        .when(col("nll") <= c2, "middle")
        .otherwise("tail"))
    withBucket.filter(Splits.mixKeep(col(idCol), col("bucket"),
      Map("head" -> rates._1, "middle" -> rates._2, "tail" -> rates._3),
      defaultWeight = 0.0, seed))
  }

  /** DSIR-style importance weighting for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS'23, reduced to its deterministic ranking core): fit two
    * add-one-smoothed unigram models — the TARGET distribution over the
    * documents matching `targetPred`, the RAW distribution over the
    * whole corpus — on a shared top-`vocabCap` vocabulary from the raw
    * counts, score every document by its mean per-token log-likelihood
    * ratio log p_target(t) − log p_raw(t), and return the `k` most
    * target-like documents. Positive weight = "looks like the target
    * domain"; the full DSIR adds Gumbel-noise resampling on top of
    * exactly this weight, which a caller can do with one extra column.
    *
    * Scale posture: both models are ONE aggregation over the token
    * explosion; the vocab cut broadcasts (top-V via
    * TakeOrderedAndProject, never a full sort), and the scoring pass is
    * the same broadcast-join-over-tokens shape as [[lmSurprisal]] — no
    * shuffle grows with corpus size beyond the token count itself.
    * Lifecycle: the k-row result is materialized and the persisted
    * count frame unpersisted before returning (same discipline as
    * [[lmScores]]). */
  def dsirImportance(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, k: Int,
      vocabCap: Int = 50000): DataFrame = {
    val (top, scratch) = dsirImportanceRaw(docs, idCol, textCol,
      targetPred, k, vocabCap)
    Dedup.materializeAndFree(top, scratch: _*)
  }

  /** Un-materialized [[dsirImportance]] plan + persisted scratch — the
    * plan-shape spec seam (see [[lmScoresRaw]]). */
  private[ext] def dsirImportanceRaw(docs: DataFrame, idCol: String,
      textCol: String, targetPred: org.apache.spark.sql.Column, k: Int,
      vocabCap: Int): (DataFrame, Seq[DataFrame]) = {
    val exploded = docs.select(col(idCol).as("_id"), targetPred.as("_tgt"),
      explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("_tok"))
    // vocab cut + totals both read this frame — persist (O(distinct
    // tokens), never O(corpus)) so the explosion runs once, not twice
    val rawCounts = exploded.groupBy(col("_tok"))
      .agg(count(lit(1)).cast("double").as("_cr"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).cast("double").as("_ct"))
      .persist()
    val vocab = rawCounts.orderBy(col("_cr").desc, col("_tok")).limit(vocabCap)
    val stats = rawCounts.agg(
      sum(col("_cr")).as("_tr"),
      sum(col("_ct")).as("_tt"),
      least(count(lit(1)), lit(vocabCap.toLong)).cast("double").as("_v"))
    val ratio =
      log((coalesce(col("_ct"), lit(0.0)) + lit(1.0)) /
        (col("_tt") + col("_v") + lit(1.0))) -
      log((coalesce(col("_cr"), lit(0.0)) + lit(1.0)) /
        (col("_tr") + col("_v") + lit(1.0)))
    val top = exploded
      .join(broadcast(vocab), Seq("_tok"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("_id"))
      .agg(round(avg(ratio), 4).as("weight"), count(lit(1)).as("n_tokens"))
      .orderBy(col("weight").desc, col("_id"))
      .limit(k)
      .select(col("_id").as(idCol), col("weight"), col("n_tokens"))
    (top, Seq(rawCounts))
  }

  /** DuckDB replay of [[dsirImportance]] over table `documents`;
    * `targetSql` is the predicate in SQL (e.g. "lang = 'en'"). */
  def dsirOracleSql(targetSql: String, k: Int,
      vocabCap: Int = 50000): String =
    s"""WITH toks AS (
       |  SELECT doc_id, ($targetSql) AS _tgt,
       |         unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
       |           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS _tok
       |  FROM documents
       |), counts AS (
       |  SELECT _tok, CAST(count(*) AS DOUBLE) AS _cr,
       |         CAST(sum(CASE WHEN _tgt THEN 1 ELSE 0 END) AS DOUBLE) AS _ct
       |  FROM toks GROUP BY _tok
       |), vocab AS (
       |  SELECT _tok, _cr, _ct FROM counts ORDER BY _cr DESC, _tok LIMIT $vocabCap
       |), stats AS (
       |  SELECT sum(_cr) AS _tr, sum(_ct) AS _tt,
       |         CAST(least(count(*), $vocabCap) AS DOUBLE) AS _v
       |  FROM counts
       |)
       |SELECT t.doc_id,
       |       round(avg(
       |         ln((coalesce(v._ct, 0.0) + 1.0) / (s._tt + s._v + 1.0)) -
       |         ln((coalesce(v._cr, 0.0) + 1.0) / (s._tr + s._v + 1.0))), 4) AS weight,
       |       count(*) AS n_tokens
       |FROM toks t LEFT JOIN vocab v ON t._tok = v._tok CROSS JOIN stats s
       |GROUP BY t.doc_id
       |ORDER BY weight DESC, t.doc_id LIMIT $k""".stripMargin

  /** DuckDB replay of [[lmSurprisal]] over table `documents` — the FULL
    * interpolated-trigram arithmetic: same counts, same top-V cuts
    * (same tie-breaks), same add-one floors, same binary-exact λ mix
    * (0.5 / 0.25 / 0.25 at position ≥ 2, 0.5 / 0.5 at position 1),
    * term order matched so the rounded doubles agree bit-for-bit. */
  def lmOracleSql(k: Int, vocabCap: Int = 50000): String =
    s"""WITH ${lmScoresCtes("documents", vocabCap)}
       |SELECT doc_id, nll, n_tokens FROM lmsc
       |ORDER BY nll DESC, doc_id LIMIT $k""".stripMargin

  /** The per-document score replay as a WITH-fragment ending in CTE
    * `lmsc(doc_id, nll, n_tokens)` over `docsSel` — factored out of
    * [[lmOracleSql]] so a composed pipeline oracle can gate on the
    * same replayed score (identical arithmetic, different consumer). */
  def lmScoresCtes(docsSel: String, vocabCap: Int = 50000): String =
    s"""arrs AS (
       |  SELECT doc_id,
       |         string_split(trim(regexp_replace(regexp_replace(lower(text),
       |           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS _arr
       |  FROM $docsSel
       |), idx AS (
       |  SELECT doc_id, _arr,
       |         unnest(generate_series(1, len(_arr))) AS _i
       |  FROM arrs
       |), pairs AS (
       |  SELECT doc_id, _arr[_i] AS _cur,
       |         CASE WHEN _i > 1 THEN _arr[_i - 1] END AS _prev,
       |         CASE WHEN _i > 2 THEN _arr[_i - 2] END AS _prev2
       |  FROM idx
       |), counts AS (
       |  SELECT _cur AS _tok, CAST(count(*) AS DOUBLE) AS _c
       |  FROM pairs GROUP BY 1
       |), vocab AS (
       |  SELECT _tok, _c FROM counts ORDER BY _c DESC, _tok LIMIT $vocabCap
       |), bi AS (
       |  SELECT _prev AS _bp, _cur AS _bc, CAST(count(*) AS DOUBLE) AS _c2
       |  FROM pairs WHERE _prev IS NOT NULL GROUP BY 1, 2
       |), bivocab AS (
       |  SELECT _bp, _bc, _c2 FROM bi ORDER BY _c2 DESC, _bp, _bc LIMIT $vocabCap
       |), leftvocab AS (
       |  SELECT _bp AS _lp, sum(_c2) AS _cl FROM bi GROUP BY 1
       |  ORDER BY _cl DESC, _lp LIMIT $vocabCap
       |), tri AS (
       |  SELECT _prev2 AS _ta, _prev AS _tb, _cur AS _tc,
       |         CAST(count(*) AS DOUBLE) AS _c3
       |  FROM pairs WHERE _prev2 IS NOT NULL GROUP BY 1, 2, 3
       |), trivocab AS (
       |  SELECT _ta, _tb, _tc, _c3 FROM tri
       |  ORDER BY _c3 DESC, _ta, _tb, _tc LIMIT $vocabCap
       |), left3vocab AS (
       |  SELECT _ta AS _la, _tb AS _lb, sum(_c3) AS _cl3 FROM tri GROUP BY 1, 2
       |  ORDER BY _cl3 DESC, _la, _lb LIMIT $vocabCap
       |), stats AS (
       |  SELECT (SELECT sum(_c) FROM counts) AS _t,
       |         (SELECT CAST(least(count(*), $vocabCap) AS DOUBLE) FROM counts) AS _v,
       |         (SELECT CAST(least(count(*), $vocabCap) AS DOUBLE) FROM bi) AS _v2,
       |         (SELECT CAST(least(count(*), $vocabCap) AS DOUBLE) FROM tri) AS _v3
       |), lmsc AS (
       |SELECT p.doc_id,
       |       round(avg(CASE
       |         WHEN p._prev IS NULL
       |         THEN -ln((coalesce(v._c, 0.0) + 1.0) / (s._t + s._v + 1.0))
       |         WHEN p._prev2 IS NULL
       |         THEN -ln(((coalesce(b._c2, 0.0) + 1.0) /
       |                   (coalesce(l._cl, 0.0) + s._v2 + 1.0)) * 0.5 +
       |                  ((coalesce(v._c, 0.0) + 1.0) /
       |                   (s._t + s._v + 1.0)) * 0.5)
       |         ELSE -ln(((coalesce(tv._c3, 0.0) + 1.0) /
       |                   (coalesce(l3._cl3, 0.0) + s._v3 + 1.0)) * 0.5 +
       |                  ((coalesce(b._c2, 0.0) + 1.0) /
       |                   (coalesce(l._cl, 0.0) + s._v2 + 1.0)) * 0.25 +
       |                  ((coalesce(v._c, 0.0) + 1.0) /
       |                   (s._t + s._v + 1.0)) * 0.25)
       |         END), 4) AS nll,
       |       count(*) AS n_tokens
       |FROM pairs p
       |LEFT JOIN vocab v ON p._cur = v._tok
       |LEFT JOIN bivocab b ON p._prev = b._bp AND p._cur = b._bc
       |LEFT JOIN leftvocab l ON p._prev = l._lp
       |LEFT JOIN trivocab tv ON p._prev2 = tv._ta AND p._prev = tv._tb
       |                     AND p._cur = tv._tc
       |LEFT JOIN left3vocab l3 ON p._prev2 = l3._la AND p._prev = l3._lb
       |CROSS JOIN stats s
       |GROUP BY p.doc_id)""".stripMargin
}
