package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins.
  *
  * AQE's skew-join handling (on by default in the session configs)
  * splits oversized sort-merge partitions at runtime; salting is the
  * complementary static tool for the case AQE cannot fix — a single
  * join key so hot that one reducer would receive it all (the classic
  * null-key / celebrity-key shape at 100 TB). Salting fans the hot key
  * out over `factor` sub-keys at the cost of replicating the other
  * (small) side `factor` times.
  */
object Skew {

  /** Equi-join `left` (large, skewed on `key`) with `right` (smaller)
    * with the left side salted over `factor` sub-keys. The salt is a
    * deterministic hash of the left row, so results are stable across
    * retries (no `rand()` — a retried task re-salting differently
    * would corrupt a shuffle at scale). `right` is replicated `factor`
    * times via explode. Result equals the plain equi-join.
    *
    * `saltCols` narrows the hashed columns: by default the WHOLE row is
    * hashed (maximal spread with zero caller knowledge), but at 100 TB
    * row widths — a corpus row dragging a multi-KB `text` column —
    * hashing every column pays a full-row hash per record for entropy a
    * couple of stable differentiator columns already provide. Pass the
    * key plus one or two high-cardinality columns; hashing must include
    * enough variety that the hot key's rows actually spread.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int, joinType: String = "inner",
      saltCols: Seq[String] = Seq.empty): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1: $factor")
    val hashed =
      if (saltCols.isEmpty) left.columns.toIndexedSeq
      else {
        val missing = saltCols.filterNot(left.columns.contains)
        require(missing.isEmpty,
          s"saltCols not in left frame: ${missing.mkString(", ")}")
        saltCols.toIndexedSeq
      }
    val salted = left.withColumn("_salt",
      pmod(xxhash64(hashed.map(col): _*), lit(factor)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
