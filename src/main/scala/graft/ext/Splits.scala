package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
