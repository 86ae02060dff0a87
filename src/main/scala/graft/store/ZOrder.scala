package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) clustering for multi-column file skipping —
  * Delta's `OPTIMIZE … ZORDER BY (a, b)` / Iceberg's
  * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')`
  * re-expressed for the snapshot store. The reference's warehouse
  * delegates data layout to Iceberg (`/root/reference/create_iceberg.py`
  * creates demo-scale tables with no layout tuning); at 100 TB a table
  * queried by more than one dimension needs a layout where per-file
  * min/max bounds are tight in EVERY queried column, not just a leading
  * sort key — which is exactly what interleaving the columns' bits buys.
  *
  * Mechanics, all shuffle-bounded and driver-light:
  *  1. Per column, map values to a 0..2^Bits-1 RANK via quantile-ish
  *     boundaries from one bounded sample (the same sample-to-driver
  *     approach Spark's own RangePartitioner uses — never a full
  *     collect). Quantile ranks, not uniform width_bucket slices: a
  *     skewed column would otherwise spend most of its bit budget on
  *     empty value space.
  *  2. Interleave the rank bits of all columns into one Long z-value —
  *     a pure chain of shiftright/and/shiftleft/or over built-in
  *     expressions, fully codegen'd.
  *  3. Range-partition + sort the rewrite by z (one shuffle), so each
  *     written file covers a small axis-aligned box of the value space
  *     and the EXISTING per-file stats pruning ([[Pruning.mightMatch]]
  *     over logged footer bounds) skips files for predicates on any
  *     subset of the z columns. No new read-side machinery at all.
  */
object ZOrder {

  /** Rank bits per dimension: 256 distinct ranks per column is plenty at
    * file granularity (a table would need >256 files along one axis
    * before finer ranks could improve skipping). */
  val Bits = 8

  /** Bit-budget cap: 6 dims × 8 bits = 48 z bits, comfortably in a Long
    * (and past ~4 dims z-order's per-dimension selectivity fades anyway). */
  val MaxCols = 6

  /** Bounded driver-side sample size for boundary estimation. */
  private val SampleTarget = 65536

  /** Types with a total order usable for rank boundaries. Float/double
    * are fine here (unlike `bucket`, no cross-write hash stability is
    * needed — ranks only shape the layout, never correctness). */
  def supportedType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Per-column ascending rank boundaries (at most 2^Bits - 1 each) from
    * ONE sample pass over the table. `rowCount` bounds the sample
    * fraction; the collect is ≤ ~2·SampleTarget rows of the z columns
    * only — driver-safe at any table size, same contract as
    * RangePartitioner's `sketch`. */
  def boundaries(df: DataFrame, cols: Seq[String],
      rowCount: Long): Map[String, Seq[Any]] = {
    val fraction =
      if (rowCount <= SampleTarget) 1.0
      else math.min(1.0, 2.0 * SampleTarget / rowCount)
    val rows = df.select(cols.map(col): _*)
      .sample(withReplacement = false, fraction, seed = 421)
      .collect()
    val nRanks = 1 << Bits
    cols.zipWithIndex.map { case (c, i) =>
      val vals = rows.iterator.map(_.get(i)).filter(_ != null).toArray
        .sortWith((a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0)
      val picked =
        if (vals.isEmpty) Seq.empty[Any]
        else (1 until nRanks).map { j =>
          vals(math.min(vals.length - 1, j * vals.length / nRanks))
        }.distinct
      c -> picked
    }.toMap
  }

  /** Rank of `c` among `bs`: the count of boundaries ≤ the value, via
    * the codegen'd binary-search expression
    * ([[graft.functions.QuantileRank]] — a higher-order `filter` over a
    * literal array computes the same rank but runs its lambda
    * interpreted per element, which dominated the whole rewrite at
    * sf1). Nulls rank 0, clustering at the low end like a NULLS FIRST
    * sort. */
  def rank(c: Column, bs: Seq[Any]): Column =
    if (bs.isEmpty) lit(0)
    else coalesce(graft.functions.GraftFunctions.quantileRank(c, bs), lit(0))

  /** Interleave the rank bits: bit `b` of rank `i` lands at z-bit
    * `b·k + (k-1-i)`, so all columns' high bits outrank all columns' low
    * bits — the Morton curve. Pure built-in bitwise expressions. */
  def zvalue(ranks: Seq[Column]): Column = {
    val k = ranks.size
    require(k >= 1 && k <= MaxCols, s"z-order takes 1..$MaxCols columns (got $k)")
    val rs = ranks.map(_.cast(LongType))
    val terms = for {
      bit <- 0 until Bits
      (r, i) <- rs.zipWithIndex
    } yield shiftleft(shiftright(r, bit).bitwiseAND(lit(1L)),
      bit * k + (k - 1 - i))
    terms.reduce(_ bitwiseOR _)
  }
}
