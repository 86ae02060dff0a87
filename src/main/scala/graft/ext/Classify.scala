package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LEARNED quality classification — the fastText-style supervised
  * signal production cleaning recipes pair with perplexity (CCNet:
  * Wikipedia-vs-crawl fastText; RefinedWeb/Llama: quality classifiers
  * over heuristic-labeled pages; shapes only — first-party code). The
  * repo's heuristic gates ([[TextAnalysis.gopherRules]],
  * [[TextAnalysis.qualityScore]]) and importance weights
  * ([[Search.dsirWeights]]) cover the rule tier; this adds the
  * trainable tier: a logistic regression over HASHED CHARACTER-TRIGRAM
  * features (the hashing trick — Weinberger et al. 2009), fastText's
  * bag-of-features averaging (Joulin et al. 2016) reduced to a linear
  * model.
  *
  * Scale shape, in the house posture:
  *   - FEATURES are a pure column expression (trigrams → md5 bucket →
  *     weight lookup → left-fold mean): scan-local, shuffle-free,
  *     identical arithmetic on Spark and DuckDB — the oracle replays
  *     scoring bit-for-bit from the same pinned weight literals.
  *   - TRAINING is batch gradient descent: features computed ONCE and
  *     cached, then one gradient PARTIAL-SUM pass per epoch (the same
  *     one-agg-per-round posture as `Similarity.kmeansCentroids`),
  *     partials folded driver-side in partition order so the model is
  *     bit-deterministic; weights ride to executors in the task
  *     closure (dim ≈ 4k doubles — broadcast would be ceremony). The
  *     feature cache frees in `finally`.
  *   - The SHIPPED model (`graft/quality_weights.txt`, regenerate with
  *     `runMain graft.GenQualityModel`) is checked in, so operator,
  *     oracle, and history stay deterministic — same contract as the
  *     BPE merge table ([[BpeVocab]]).
  *
  * The md5-hex bucket hash is deliberately NOT xxhash64/murmur: the
  * oracle needs the SAME hash in both engines, and md5-over-UTF-8 is
  * the one hash Spark and DuckDB share exactly.
  */
object Classify {

  /** Frozen classifier: `weights(bucket)` + `bias`, score =
    * σ(bias + mean over grams of weights(bucket(gram))). */
  final case class QualityModel(weights: Array[Double], bias: Double) {
    require(weights.nonEmpty, "empty weight vector")
    def dim: Int = weights.length
    /** The expression-tier holder (shared so repeated scoring reuses
      * one reference object). */
    @transient lazy val ref: graft.functions.QualityModelRef =
      new graft.functions.QualityModelRef(weights, bias)
    override def toString: String = s"QualityModel(dim=${weights.length})"
  }

  /** Default feature dimensionality (hashing-trick buckets). 4096
    * trigram buckets ≈ fastText's bucket table at minishape: enough
    * that English trigrams rarely collide with garbage trigrams. */
  val DefaultDim = 4096

  // ------------------------------------------------------------ features

  /** Hex digit value of the 1-based `k`-th char of hex string `h` —
    * `ascii` is the code-point function BOTH engines define
    * identically, so the arithmetic replays in SQL. */
  private def hexVal(h: Column, k: Int): Column = {
    val a = ascii(substring(h, k, 1))
    when(a <= 57, a - 48).otherwise(a - 87)
  }

  /** First 16 bits of md5(gram), as its 4-hex-char prefix. Split from
    * [[bucketFromHex]] so the md5 evaluates ONCE per gram: higher-order
    * lambdas run interpreted (no common-subexpression elimination), so
    * an expression tree referencing `md5(g)` from every hex digit pays
    * EIGHT digests per gram — ~70× the whole scoring cost at corpus
    * scale. Two chained transforms bind the digest like a let. */
  private def gramHex(g: Column): Column = substring(md5(g), 1, 4)

  private def bucketFromHex(h: Column, dim: Int): Column =
    (hexVal(h, 1) * 4096 + hexVal(h, 2) * 256 +
      hexVal(h, 3) * 16 + hexVal(h, 4)) % dim

  /** Boundary-padded lowercase character trigrams of a text column.
    * NULL text → NULL; text shorter than one trigram → empty array
    * (explicit branches: Spark's `sequence(1, 0)` counts DOWN, so the
    * short-text case must not reach it — the oracle's `range(1, 0)` is
    * empty and the branches keep both engines aligned). The padded
    * string is BOUND as a lambda variable (`transform(array(s), …)[1]`
    * — the expression tier's let): referencing `s` directly from the
    * per-gram substr re-evaluates the concat+lower per element, which
    * is O(n²) per document and dominated the whole pipeline before the
    * binding. */
  def charTrigrams(text: Column): Column = {
    val s = concat(lit(" "), lower(text), lit(" "))
    val grams = transform(array(s), s2 => {
      val n = length(s2)
      when(n >= 3,
        transform(sequence(lit(1), n - 2), i => s2.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))
    })
    when(text.isNotNull, element_at(grams, 1))
  }

  /** Classifier score in (0, 1): σ(bias + Σ w[bucket(g)] / max(#grams,
    * 1)) — the codegen'd [[graft.functions.QualityScore]] expression
    * (one reused digest, zero per-gram allocation; the declarative
    * [[qualityProbColumns]] form pays interpreted-lambda tree walks
    * per trigram and is ~30× slower at corpus scale). The two forms
    * agree to ≤1 ulp (`ClassifySpec` differential — the JIT'd
    * `Math.exp` intrinsic vs the interpreted path can differ in the
    * last bit), which leaves a vanishingly small residual risk that a
    * 1-ulp wobble lands exactly on the 6-dp rounding or 0.5-threshold
    * boundary of a downstream compare. */
  def qualityProb(text: Column, model: QualityModel): Column =
    graft.functions.GraftFunctions.qualityScore(text, model.ref)

  /** The scoring arithmetic in PURE BUILT-IN COLUMNS — the executable
    * documentation of what [[probOracleSqlExpr]] replays (strict left
    * fold in gram order pins float summation, so oracle, column form
    * and the codegen'd expression all produce the same doubles).
    * Evaluation order matters even here: the md5 binds ONCE per gram
    * and the padded string once per row via lambda variables —
    * higher-order lambdas run interpreted with no common-subexpression
    * elimination, so an unbound spelling is quadratic per document. */
  def qualityProbColumns(text: Column, model: QualityModel): Column = {
    val grams = charTrigrams(text)
    val hexes = transform(grams, gramHex(_)) // one digest per gram
    val w = lit(model.weights)
    val wsum = aggregate(hexes, lit(0.0),
      (acc, h) => acc + element_at(w, bucketFromHex(h, model.dim) + 1))
    val z = lit(model.bias) + wsum / greatest(size(grams), lit(1)).cast("double")
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Frame form: adds `q_prob` (rounded to 6 dp for stable compares)
    * and `q_keep` (≥ `threshold`). */
  def scoreQuality(docs: DataFrame, textCol: String = "text",
      model: QualityModel = PinnedModel, threshold: Double = 0.5): DataFrame =
    docs
      .withColumn("q_prob", round(qualityProb(col(textCol), model), 6))
      .withColumn("q_keep", col("q_prob") >= threshold)

  // ------------------------------------------------------------- training

  /** Full-batch logistic regression with ADAGRAD per-coordinate steps
    * (Duchi et al. 2011 — hashed text features are sparse, so a global
    * step either starves rare buckets or oscillates common ones; the
    * per-coordinate 1/√Σg² scaling is the standard fix and separates
    * the generator corpus perfectly where plain GD stalls ~80%).
    * `labelCol` is 0.0/1.0 (1 = keep-quality). One feature pass cached
    * once (plain persist — an iterative trainer recomputes on loss, it
    * does not need the crash-safe checkpoint seam) and freed in
    * `finally`; per epoch exactly ONE gradient partial-sum pass (32
    * partials of dim+2 doubles — metadata-sized) folded DRIVER-SIDE in
    * partition order, so float summation order is pinned; optimizer
    * state (Σg² accumulators) is driver-side. Deterministic to the
    * last bit for a fixed partition layout (full batch, zero init, no
    * sampling, partition-ordered folds); across different layouts the
    * fold order — and so the last float bits — can differ, which is
    * one more reason the SHIPPED model is a checked-in artifact rather
    * than retrained per run. */
  def trainQuality(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int = DefaultDim, epochs: Int = 100, lr: Double = 0.5,
      l2: Double = 1e-6): QualityModel = {
    require(dim >= 2 && epochs >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = charTrigrams(col(textCol))
    val buckets = transform(transform(grams, gramHex(_)),
      h => bucketFromHex(h, dim))
    val feats = docs.filter(col(textCol).isNotNull)
      .select(buckets.as("b"), col(labelCol).cast("double").as("y"))
      .as[(Seq[Int], Double)].persist()
    try {
      var w = new Array[Double](dim)
      var b = 0.0
      val accW = new Array[Double](dim)
      var accB = 0.0
      var epoch = 0
      while (epoch < epochs) {
        // collect() returns partials in PARTITION order — the driver
        // fold below is therefore a pinned float-summation order
        val partials = feats.mapPartitions { it =>
          val pgw = new Array[Double](dim)
          var pgb = 0.0
          var pn = 0L
          it.foreach { case (bs, y) =>
            val m = math.max(bs.length, 1)
            var z = b
            bs.foreach(i => z += w(i) / m)
            val err = 1.0 / (1.0 + math.exp(-z)) - y
            bs.foreach(i => pgw(i) += err / m)
            pgb += err
            pn += 1
          }
          Iterator.single((pgw, pgb, pn))
        }.collect()
        val gw = new Array[Double](dim)
        var gb = 0.0
        var n = 0L
        partials.foreach { case (pgw, pgb, pn) =>
          var i = 0
          while (i < dim) { gw(i) += pgw(i); i += 1 }
          gb += pgb
          n += pn
        }
        val nD = math.max(n, 1L).toDouble
        val w2 = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          val g = gw(i) / nD + l2 * w(i)
          accW(i) += g * g
          w2(i) = if (accW(i) > 0) w(i) - lr * g / math.sqrt(accW(i) + 1e-8)
                  else w(i)
          i += 1
        }
        w = w2
        val g = gb / nD
        accB += g * g
        if (accB > 0) b -= lr * g / math.sqrt(accB + 1e-8)
        epoch += 1
      }
      QualityModel(w, b)
    } finally feats.unpersist()
  }

  // ------------------------------------------------------ pinned artifact

  /** quality_weights.txt: `bias <v>` line then one weight per line. */
  def parseModel(lines: Iterator[String]): QualityModel = {
    val vals = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .toArray
    require(vals.nonEmpty, "empty model file (no non-comment lines)")
    require(vals.head.startsWith("bias "), "first line must be 'bias <v>'")
    QualityModel(vals.tail.map(_.toDouble), vals.head.drop(5).toDouble)
  }

  /** The shipped model (trained by `GenQualityModel` on the testdata
    * corpus vs deterministic garbage — see the generator). */
  lazy val PinnedModel: QualityModel = {
    val in = getClass.getResourceAsStream("/graft/quality_weights.txt")
    require(in != null, "resource graft/quality_weights.txt missing")
    try parseModel(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  // --------------------------------------------------------------- oracle

  /** CTE binding the pinned weights ONCE (`qw(w)` — cross-join it):
    * shortest-roundtrip double literals parse to identical doubles;
    * the list casts to DOUBLE[] as a whole so no element infers
    * DECIMAL (the house oracle gotcha). */
  def weightsCteSql(model: QualityModel = PinnedModel,
      cteName: String = "qw"): String =
    model.weights.map(java.lang.Double.toString)
      .mkString(s"$cteName AS (SELECT CAST([", ",", "] AS DOUBLE[]) AS w)")

  /** DuckDB replay of [[qualityProb]] over `textExpr`, reading the
    * weight vector from [[weightsCteSql]]'s column `w`. Same trigrams,
    * same md5-hex bucket arithmetic, same left fold, same σ; NULL text
    * → NULL on both engines. Bindings mirror the Spark side's let
    * discipline (DuckDB lambdas get no CSE either): the padded string
    * binds once per row via a singleton list_transform, the digest
    * once per gram via a chained list_transform — without them the
    * replay is O(n²) per document with ~12 digests per gram. */
  def probOracleSqlExpr(textExpr: String,
      model: QualityModel = PinnedModel): String = {
    val s = s"(' ' || lower($textExpr) || ' ')"
    val grams = s"list_transform([$s], s2 -> " +
      s"list_transform(range(1, length(s2) - 1), i -> substr(s2, i, 3)))[1]"
    val hexes = s"list_transform($grams, g -> substr(md5(g), 1, 4))"
    val hexv = (k: Int) =>
      s"(CASE WHEN ascii(substr(h, $k, 1)) <= 57 " +
        s"THEN ascii(substr(h, $k, 1)) - 48 " +
        s"ELSE ascii(substr(h, $k, 1)) - 87 END)"
    val bucket = s"((${hexv(1)} * 4096 + ${hexv(2)} * 256 + " +
      s"${hexv(3)} * 16 + ${hexv(4)}) % ${model.dim})"
    val wsum = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform($hexes, h -> w[$bucket + 1])), " +
      s"(acc, x) -> acc + x)"
    s"CASE WHEN $textExpr IS NULL THEN NULL ELSE " +
      s"1.0 / (1.0 + exp(-(${model.bias} + $wsum / " +
      s"greatest(len($grams), 1)))) END"
  }
}
