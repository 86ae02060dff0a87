package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test split assignment for training
  * corpora (north-star extension; the reference has no pipeline layer).
  *
  * The split is a PURE FUNCTION OF THE KEY: `xxhash64(key, seed)` maps
  * each key to a point in [0, 1), and the configured fractions carve
  * that interval. Three properties fall out, and they are exactly what
  * a 100 TB corpus needs from its splitter:
  *   - stable: re-running assigns every row the same split — no stored
  *     assignment table to join against;
  *   - leakage-free by key: duplicate rows of one document can never
  *     straddle train/test (same key → same split), and the key can be
  *     a GROUP key (site, author, cluster id) to push the leakage
  *     boundary coarser than documents;
  *   - append-invariant: new data never re-shuffles old assignments —
  *     the bane of `randomSplit`-style sampling, whose assignment
  *     depends on partition layout and corpus size.
  * Scan-local projection (one codegen'd hash per row), no shuffle.
  */
object Splits {

  /** Resolution of the unit interval: hash buckets in [0, Buckets). */
  val Buckets: Long = 1L << 20

  /** The split label for `key` under `fractions` (name → weight;
    * weights are normalized, so (8, 1, 1) == (0.8, 0.1, 0.1)). */
  def splitFor(key: Column, fractions: Seq[(String, Double)],
      seed: Long = 42L): Column = {
    require(fractions.size >= 2, "need at least two splits")
    require(fractions.forall(_._2 > 0), "split weights must be positive")
    val total = fractions.map(_._2).sum
    // cumulative upper bucket bounds; the last is pinned to Buckets so
    // rounding can never leave an unassigned sliver
    val bounds = fractions.inits.toSeq.reverse.drop(1)
      .map(pre => math.round(pre.map(_._2).sum / total * Buckets))
      .dropRight(1) :+ Buckets
    val bucket = pmod(xxhash64(key, lit(seed)), lit(Buckets))
    fractions.map(_._1).zip(bounds).foldRight(lit(null).cast("string")) {
      case ((name, hi), rest) => when(bucket < hi, name).otherwise(rest)
    }
  }

  /** `df` plus a `split` column assigned by [[splitFor]] on `keyCol`. */
  def assign(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)] = Seq("train" -> 0.98,
        "validation" -> 0.01, "test" -> 0.01),
      seed: Long = 42L): DataFrame =
    df.withColumn("split", splitFor(col(keyCol), fractions, seed))

  /** Deterministic EXACT-k PER-STRATUM sample — the eval-set
    * construction shape ("exactly 1000 held-out docs per language"),
    * where [[domainMix]]'s probabilistic keep gives only EXPECTED
    * counts. Rows rank within their stratum by `xxhash64(key, seed)`
    * and the k smallest win: stable across runs (pure key function)
    * and uniform over the stratum.
    *
    * Scale shape: the naive `row_number() OVER (PARTITION BY stratum
    * ORDER BY hash)` hauls every stratum's FULL population through a
    * sort — one hot stratum is one giant task. This uses the bounded
    * [[TopKAggregator]] instead: each partition ships at most k
    * candidates per stratum into the shuffle (map-side combine), so
    * cost is O(k · partitions · strata), independent of stratum skew.
    * Hash ranks are compared as doubles — above 2^53 two adjacent
    * hashes can tie and fall to the id tiebreak, which only perturbs
    * WHICH uniform sample is chosen, never determinism or exactness
    * of k. Returns the sampled rows (all original columns). */
  def stratifiedSampleExact(df: DataFrame, strataCol: String, idCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val topk = new TopKAggregator(k)
    val scored = df.select(col(strataCol).as("_st"),
      // negate: the aggregator keeps the HIGHEST scores = smallest hashes
      (-xxhash64(col(idCol), lit(seed)).cast("double")).as("score"),
      col(idCol).cast("long").as("id"))
    val picks = scored.groupBy(col("_st"))
      .agg(udaf(topk, org.apache.spark.sql.Encoders.product[Candidate])
        .apply(col("score"), col("id")).as("_ns"))
      .select(col("_st").as(strataCol), explode(col("_ns.id")).as(idCol))
    df.join(picks, Seq(strataCol, idCol), "left_semi")
  }

  /** Contiguous token-budget SHARDING: walk the corpus in `orderCol`
    * order, cut a new shard each time the running `weightCol` total
    * crosses a multiple of `budget` — the deterministic corpus→shard
    * packing a training run does before writing ~equal-token files.
    * Adds `shard` (= floor(exclusive-prefix-sum / budget)) and
    * `offset_in_corpus` (the exclusive prefix sum itself). `orderCol`
    * must be unique — the walk order, and therefore every offset, is
    * undefined under ties.
    *
    * The naive spelling — a window over global order with no partition
    * key — plans a SINGLE-TASK sort at any scale. This is the
    * distributed two-pass prefix sum instead: range-partition + sort by
    * `orderCol` (one shuffle), take per-partition weight totals (a
    * driver-side list of numPartitions longs — metadata, not data),
    * broadcast their exclusive running offsets back as a literal
    * decision chain, and add the within-partition running sum (a window
    * keyed by partition id — every window group is one shard-sized
    * partition, never the whole corpus). The result is materialized
    * before the scratch frame unpersists, so the partition ids the
    * offsets were computed against can never be re-sampled differently
    * by a later job. */
  def packShards(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 (got $budget)")
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // persist: the partition-total pass and the final pass must see the
    // SAME range partitioning (RangePartitioner re-samples per job)
    val sorted = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("_pid", spark_partition_id())
      .persist()
    try {
      val totals = sorted.groupBy(col("_pid"))
        .agg(sum(col(weightCol).cast("long")).as("_w"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // exclusive running offset per partition id (tiny, driver-side)
      val ids = totals.keys.toSeq.sorted
      val offsets = ids.zip(ids.scanLeft(0L)((acc, p) => acc + totals(p)))
        .toMap
      val offsetExpr = ids.foldRight(lit(0L)) { (p, rest) =>
        when(col("_pid") === p, lit(offsets(p))).otherwise(rest)
      }
      val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cumBefore = offsetExpr +
        coalesce(sum(col(weightCol).cast("long")).over(w), lit(0L))
      val out = sorted
        .withColumn("offset_in_corpus", cumBefore)
        .withColumn("shard", floor(col("offset_in_corpus") / budget))
        .drop("_pid")
      // materialize (reliable dir honored via Dedup.CheckpointDirConf)
      // BEFORE the scratch frame unpersists — see the persist note above
      Dedup.materializeAndFree(out, sorted)
    } catch { case e: Throwable => sorted.unpersist(); throw e }
  }

  /** Default seed for [[domainMix]] — deliberately NOT [[assign]]'s
    * seed. Both stages hash the same key; with a shared seed the mix's
    * kept set would be exactly the low end of the same unit interval
    * the splitter carves, so a 50% mix would land entirely inside the
    * train split and validation/test would come out empty. Independent
    * seeds make the two decisions independent. */
  val MixSeed: Long = 1042L

  /** Keep-decision for deterministic DOMAIN MIXING (the Pile/Dolma
    * recipe: each source/language/domain contributes a configured
    * fraction of its rows): keep a row iff
    * `xxhash64(key, seed) mod Buckets < weight(domain) · Buckets`.
    * A pure function of (key, seed) — same reproducibility contract as
    * [[splitFor]]: stable across runs, append-invariant, leakage-safe
    * by key, scan-local with no shuffle and no stored sample table.
    * Weights are keep-probabilities in [0, 1]; domains absent from the
    * map use `defaultWeight`. Weight 1.0 keeps every row exactly;
    * weight 0.0 drops every row exactly. Up-weighting (> 1, i.e.
    * repeating a domain) is a different operation — epoch replication —
    * and is rejected here rather than silently truncated. */
  def mixKeep(key: Column, domain: Column, weights: Map[String, Double],
      defaultWeight: Double = 1.0, seed: Long = MixSeed): Column = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 1),
      "mix weights are keep-probabilities in [0, 1]")
    val bucket = pmod(xxhash64(key, lit(seed)), lit(Buckets))
    // thresholds resolve to long literals on the driver: the codegen'd
    // per-row work is one hash + one decision chain over the (small)
    // domain map — no float arithmetic per row, no join
    val threshold = weights.foldLeft(lit(math.round(defaultWeight * Buckets))) {
      case (rest, (d, w)) =>
        when(domain === lit(d), lit(math.round(w * Buckets))).otherwise(rest)
    }
    bucket < threshold
  }

  /** The rows of `df` kept by [[mixKeep]] on (`keyCol`, `domainCol`). */
  def domainMix(df: DataFrame, domainCol: String, keyCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      seed: Long = MixSeed): DataFrame =
    df.filter(mixKeep(col(keyCol), col(domainCol), weights, defaultWeight, seed))

  /** TEMPERATURE-BASED domain sampling (the multilingual "alpha
    * sampling" recipe — XLM / mT5 style): target mixture proportions
    * p_i ∝ n_i^alpha rebalance a skewed corpus toward its small
    * domains (alpha = 1 keeps natural proportions, alpha = 0
    * equalizes; ~0.3 is the multilingual-LM convention), realized as
    * per-domain keep rates r_i = min(1, targetRows·p_i / n_i) applied
    * by the same deterministic hash carve as [[mixKeep]] — so the
    * sample is stable across runs and subset-consistent.
    *
    * Scale shape: ONE count aggregation collects |domains| rows to the
    * driver; the rates broadcast back as literal thresholds in a
    * codegen decision chain — no joins, no per-row float math. Rates
    * cap at 1: tiny domains keep everything (upsampling beyond 1 is
    * [[replicate]]'s job). Rows with a NULL domain are dropped (they
    * have no n_i to weight by). */
  def alphaSample(df: DataFrame, domainCol: String, keyCol: String,
      alpha: Double, targetRows: Long, seed: Long = MixSeed): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    require(targetRows > 0, "targetRows must be positive")
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("_d"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.limit(0)
    val wsum = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val rates = counts.map { case (d, n) =>
      d -> math.min(1.0, targetRows * (math.pow(n.toDouble, alpha) / wsum) / n)
    }
    df.filter(mixKeep(col(keyCol), col(domainCol).cast("string"), rates,
      defaultWeight = 0.0, seed))
  }

  /** TOKEN-BUDGET domain mixing — the recipe as every training-run
    * config actually states it (Dolma/Pile style: "20 B tokens of
    * code, 5 B of books"), where [[domainMix]]/[[alphaSample]] budget
    * in ROWS: per-domain keep rates r_d = min(1, budget_d / tokens_d)
    * realized by the same deterministic hash carve as [[mixKeep]] —
    * stable across runs, append-invariant, leakage-safe by key. The
    * kept token mass per domain lands on its budget in expectation
    * (hash-sampling noise ~1/√docs; a domain under budget keeps
    * everything — upsampling past 1 is [[replicate]]'s job). Domains
    * absent from `budgets` are dropped unless `keepUnlisted` (a recipe
    * names every source it trains on). Pair `tokenCol` with
    * [[TextAnalysis.bpeTokenCountRanked]] so the budget counts real
    * model tokens.
    *
    * Scale shape: ONE sum aggregation collects |domains| rows to the
    * driver; rates broadcast back as literal thresholds in a codegen
    * decision chain — no joins, no per-row float math (same posture as
    * [[alphaSample]]). Rows with a NULL domain are dropped. */
  def tokenBudgetMix(df: DataFrame, domainCol: String, keyCol: String,
      tokenCol: String, budgets: Map[String, Long],
      keepUnlisted: Boolean = false, seed: Long = MixSeed): DataFrame = {
    require(budgets.values.forall(_ >= 0), "token budgets must be >= 0")
    val totals = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("_d"))
      .agg(coalesce(sum(col(tokenCol).cast("long")), lit(0L)).as("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = totals.flatMap { case (d, t) =>
      // a domain whose token mass is zero is trivially under any
      // positive budget — keep everything (rate 1); only a zero budget
      // drops it (the documented "under budget keeps all" contract)
      budgets.get(d).map(b =>
        d -> (if (t <= 0) (if (b > 0) 1.0 else 0.0)
              else math.min(1.0, b.toDouble / t)))
    }
    df.filter(col(domainCol).isNotNull &&
      mixKeep(col(keyCol), col(domainCol).cast("string"), rates,
        defaultWeight = if (keepUnlisted) 1.0 else 0.0, seed))
  }

  /** ORACLE-REPLAYABLE deterministic keep-decision: where [[mixKeep]]
    * carves on `xxhash64` (fastest, but Spark-only), this carves on the
    * first 32 bits of `md5(key ':' salt)` — the one hash Spark and
    * DuckDB both implement, so a pipeline sampled this way can be
    * re-derived ROW-FOR-ROW by the verify SQL (final-corpus md5, not
    * just expected totals). Same contract otherwise: pure function of
    * (key, salt), stable, append-invariant, leakage-safe by key;
    * scan-local, no shuffle. `rate` is a Column so budget-derived rates
    * computed in-plan replay too. Keep iff u < rate·2³². */
  def md5Keep(key: Column, salt: String, rate: Column): Column = {
    val m = md5(concat(key.cast("string"), lit(":" + salt)))
    def hexVal(k: Int): Column = {
      val a = ascii(substring(m, k, 1))
      when(a <= 57, a - 48).otherwise(a - 87).cast("long")
    }
    val u = (1 to 8).map(hexVal).reduce((acc, d) => acc * 16 + d)
    u.cast("double") < rate * lit(4294967296.0)
  }

  /** DuckDB twin of [[md5Keep]] — same md5, same hex fold, same
    * threshold arithmetic. `keyExpr` must be the same string form the
    * Spark side casts to (e.g. a BIGINT id renders identically). */
  def md5KeepSqlExpr(keyExpr: String, salt: String, rateExpr: String): String = {
    val m = s"md5(CAST($keyExpr AS VARCHAR) || ':$salt')"
    def hexVal(k: Int): String =
      s"CAST(CASE WHEN ascii(substr($m, $k, 1)) <= 57 " +
        s"THEN ascii(substr($m, $k, 1)) - 48 " +
        s"ELSE ascii(substr($m, $k, 1)) - 87 END AS BIGINT)"
    val u = (1 to 8).map(hexVal).reduce((acc, d) => s"($acc * 16 + $d)")
    s"(CAST($u AS DOUBLE) < ($rateExpr) * 4294967296.0)"
  }

  /** Default seed for [[shuffled]] — independent of [[MixSeed]] and the
    * split seed for the same reason those are independent of each
    * other: every stage hashing the same key must not correlate. */
  val ShuffleSeed: Long = 7042L

  /** Deterministic GLOBAL SHUFFLE — the training-order randomization a
    * corpus gets before sharding (a model must not see documents in
    * ingestion order). Position = rank of `xxhash64(key, seed)` (ties
    * broken by the key), so the permutation is a pure function of the
    * key set and seed: stable across runs and cluster layouts, and any
    * contiguous slice of positions is an unbiased sample — which is
    * what lets a training job resume mid-corpus reproducibly.
    *
    * The naive spelling — `row_number() OVER (ORDER BY hash)` — plans a
    * SINGLE-TASK global sort at any scale. This is the same distributed
    * two-pass shape as [[packShards]]: range-partition + sort by
    * (hash, key) (one shuffle), per-partition row counts to the driver
    * (metadata-sized), broadcast exclusive offsets back, add the
    * within-partition row number. Materialized before the scratch frame
    * unpersists so partition ids cannot be re-sampled differently. */
  def shuffled(df: DataFrame, keyCol: String,
      seed: Long = ShuffleSeed): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .withColumn("_h", xxhash64(col(keyCol), lit(seed)))
      .repartitionByRange(parts, col("_h"), col(keyCol))
      .sortWithinPartitions(col("_h"), col(keyCol))
      .withColumn("_pid", spark_partition_id())
      .persist()
    try {
      val counts = sorted.groupBy(col("_pid"))
        .agg(count(lit(1)).as("_n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ids = counts.keys.toSeq.sorted
      val offsets = ids.zip(ids.scanLeft(0L)((a, p) => a + counts(p))).toMap
      val offsetExpr = ids.foldRight(lit(0L)) { (p, rest) =>
        when(col("_pid") === p, lit(offsets(p))).otherwise(rest)
      }
      val w = Window.partitionBy(col("_pid"))
        .orderBy(col("_h"), col(keyCol))
      val out = sorted
        .withColumn("pos", offsetExpr + row_number().over(w) - 1)
        .drop("_h", "_pid")
      Dedup.materializeAndFree(out, sorted)
    } catch { case e: Throwable => sorted.unpersist(); throw e }
  }

  /** EPOCH REPLICATION — the other half of a mixing recipe (Dolma/LLaMA
    * style: "books × 2.5" means every book appears twice and half of
    * them a third time). Each row is emitted
    * `floor(w) + (hash < frac(w) ? 1 : 0)` times, with an `epoch`
    * column (0-based copy index) so downstream sharding can interleave
    * epochs rather than concatenate them. The fractional copy is the
    * SAME deterministic keep-decision as [[mixKeep]] (pure function of
    * the key), so replication is stable and append-invariant too.
    * Spark-first shape: a driver-built copy-count decision chain plus
    * one `explode(sequence(...))` — scan-local row generation, no
    * shuffle, no self-union per epoch (a w-way union would re-scan the
    * corpus ceil(w) times at 100 TB; this scans once and amplifies in
    * the task). Weights < 1 are accepted and reduce to [[domainMix]]
    * (epoch 0 sampled at w). */
  def replicate(df: DataFrame, domainCol: String, keyCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      seed: Long = MixSeed): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "replication weights must be non-negative")
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(Buckets))
    def copiesFor(w: Double): Column = {
      val whole = math.floor(w).toLong
      val frac = math.round((w - whole) * Buckets)
      lit(whole) + when(bucket < lit(frac), 1L).otherwise(0L)
    }
    val copies = weights.foldLeft(copiesFor(defaultWeight)) {
      case (rest, (d, w)) =>
        when(col(domainCol) === lit(d), copiesFor(w)).otherwise(rest)
    }
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }
}
