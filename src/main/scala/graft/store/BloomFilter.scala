package graft.store

import java.util.Base64

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Serialized per-column bloom filter of one data file. `t` is the
  * Spark type (catalogString) the column values were CAST to before
  * hashing — the probe side must hash its literal at the same type, or
  * the 64-bit hashes diverge (the bucket-transform lesson: a hash is
  * type-sensitive). `m` is the filter size in bits, `k` the hash count,
  * `b` the base64 bit array. `m == 0` encodes "this file has no non-null
  * values of the column" (an append that omitted the column, or an
  * all-null file): every membership test is provably false, which is
  * exact — a NULL never satisfies an equality predicate. */
final case class ColBloom(t: String, k: Int, m: Int, b: String)

/** Per-file bloom filters for point-lookup file skipping — the metadata
  * tier min/max bounds cannot provide.
  *
  * On a high-cardinality UNSORTED column (a uuid, a customer key in an
  * event table), every file's min/max spans the whole domain, so a
  * `WHERE id = x` needle query scans the table even though at most a
  * handful of files contain the key. Iceberg/Delta answer this with
  * bloom filters; this store keeps the same two-tier shape:
  *
  *  - **Parquet-embedded row-group blooms** (`parquet.bloom.filter.
  *    enabled#col` write options, [[TableStore.writeStaged]]): built by
  *    the executors during the write, consulted by parquet-mr inside
  *    every scan whose pushed filter pins the column — fully
  *    distributed, no driver state, the tier that holds at 100 TB file
  *    sizes.
  *  - **Log-embedded file-level blooms** (this object): one compact
  *    filter per (file, column) in the snapshot log, sized at
  *    [[BitsPerRow]] bits/row and stored only up to [[MaxBits]]
  *    (≈[[maxRows]] rows ≈ 1% false positives) — beyond that the
  *    entry is omitted and the parquet tier owns skipping (a capped
  *    filter's false-positive rate would quietly approach 1, costing
  *    log bytes for no skips). Within the cap, a point lookup prunes
  *    its file list from log metadata alone — no storage I/O — which
  *    is what makes a needle query on a 100-appends table touch one
  *    file instead of a hundred.
  *
  * Hashing: `xxhash64(value)` (Spark's [[XxHash64]], seed 42) on both
  * sides — the build aggregates the codegen'd `xxhash64` column, the
  * probe evaluates the same expression over the literal — then k bit
  * positions by double hashing (Kirsch–Mitzenmacher): `g_i = h1 + i*h2`
  * with `h2` a splitmix64 finalize of `h1`.
  */
object BloomFilter {

  /** Bits per row at build time: m = 10 n → ~1% FPP at k = 7. */
  val BitsPerRow = 10

  /** Largest stored filter: 2^17 bits = 16 KiB per (file, column). */
  val MaxBits: Int = 1 << 17

  val NumHashes = 7

  /** Rows beyond which no file-level bloom is stored. */
  def maxRows: Long = (MaxBits / BitsPerRow).toLong

  /** Filter size for a file of `records` rows: next multiple of 64 of
    * BitsPerRow·records, or None when the cap would make it useless. */
  def bitsFor(records: Long): Option[Int] = {
    if (records <= 0) return Some(0)
    val want = records * BitsPerRow
    if (want > MaxBits) None
    else Some((((want + 63) / 64) * 64).toInt)
  }

  /** splitmix64 finalizer — the second hash of the double-hashing
    * scheme, derived so build and probe agree by construction. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Byte], k: Int, h1: Long): Unit = {
    val m = bits.length * 8L
    if (m == 0) return
    val h2 = mix(h1)
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m).toInt
      bits(pos >>> 3) = (bits(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  def contains(bits: Array[Byte], k: Int, h1: Long): Boolean = {
    val m = bits.length * 8L
    if (m == 0) return false // no non-null values: provably absent
    val h2 = mix(h1)
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m).toInt
      if ((bits(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  def encode(t: DataType, k: Int, bits: Array[Byte]): ColBloom =
    ColBloom(t.catalogString, k, bits.length * 8,
      Base64.getEncoder.encodeToString(bits))

  /** The `m == 0` "no values present" filter. */
  def emptyBloom(t: DataType): ColBloom = ColBloom(t.catalogString, NumHashes, 0, "")

  def decodeBits(b: ColBloom): Array[Byte] =
    if (b.m == 0) Array.emptyByteArray else Base64.getDecoder.decode(b.b)

  /** Merge-by-OR aggregator over pre-hashed (`xxhash64`) column values —
    * the distributed build: one map-side-combining hash aggregation per
    * write, grouped by `_metadata.file_path`, so per-file filters come
    * back to the driver as metadata-sized byte arrays. Null inputs
    * (null column values) are skipped: a null never matches an equality
    * probe, so it must not set bits. */
  final class BloomAgg(numBytes: Int, k: Int)
      extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](numBytes)
    def reduce(b: Array[Byte], h: java.lang.Long): Array[Byte] = {
      if (h != null) add(b, k, h.longValue()); b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Conservative bloom pruning: `false` only when the predicate pins a
    * bloom-indexed column to literal(s) the file's filter PROVES absent.
    * Mirrors [[Pruning.mightMatchBucket]]'s walk: equality/IN shapes
    * only, And/Or composed, anything else — ranges, IS NULL, unknown
    * expressions, hash-type mismatches — keeps the file. A bloom "no"
    * is exact (zero false negatives), so callers may also use it on the
    * provably-no-match side of metadata-answered aggregates. */
  def mightMatchBlooms(pred: Expression,
      bloomOf: String => Option[ColBloom]): Boolean = {
    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name.toLowerCase)
      case u: UnresolvedAttribute if u.nameParts.size == 1 =>
        Some(u.nameParts.head.toLowerCase)
      // a widening cast preserves the value but not the 64-bit hash;
      // probeHash re-casts to the stored type, so look through it
      case c: Cast => attrName(c.child)
      case _ => None
    }
    def keepFor(name: String, lits: Seq[Expression]): Boolean =
      bloomOf(name) match {
        case Some(bloom) =>
          val bits = decodeBits(bloom)
          lits.exists { l =>
            probeHash(l, bloom.t) match {
              case Some(h) => contains(bits, bloom.k, h)
              case None    => true // unhashable literal: keep the file
            }
          }
        case None => true // column not bloom-indexed in this file
      }
    pred match {
      case And(l, r) => mightMatchBlooms(l, bloomOf) && mightMatchBlooms(r, bloomOf)
      case Or(l, r)  => mightMatchBlooms(l, bloomOf) || mightMatchBlooms(r, bloomOf)
      case EqualTo(a, c) if c.foldable && !a.foldable =>
        attrName(a).forall(keepFor(_, Seq(c)))
      case EqualTo(c, a) if c.foldable && !a.foldable =>
        attrName(a).forall(keepFor(_, Seq(c)))
      case EqualNullSafe(a, c) if c.foldable && !a.foldable =>
        attrName(a).forall(keepFor(_, Seq(c)))
      case EqualNullSafe(c, a) if c.foldable && !a.foldable =>
        attrName(a).forall(keepFor(_, Seq(c)))
      case In(a, list) if list.forall(_.foldable) =>
        attrName(a).forall(keepFor(_, list))
      case InSet(a: AttributeReference, set) =>
        attrName(a).forall(keepFor(_,
          set.toSeq.filter(_ != null).map(Literal(_, a.dataType))))
      case _ => true
    }
  }

  /** xxhash64 of a foldable expression at the filter's build type.
    * None = null literal (can never equal a non-null value — but
    * reported as None so IN lists skip it, not prune on it), or any
    * cast/eval failure (caller keeps the file). Zone-sensitive casts
    * decline like [[Pruning.bucketIdOf]]: a timestamp rendered in the
    * wrong zone would hash to the wrong bits and prune a matching
    * file. */
  private def probeHash(e: Expression, typeDdl: String): Option[Long] =
    try {
      val dt = DataType.fromDDL(typeDdl)
      def zoneSensitive(d: DataType): Boolean =
        d == TimestampType || d == TimestampNTZType
      val casted =
        if (e.dataType == dt) e
        else if (zoneSensitive(e.dataType) || zoneSensitive(dt)) return None
        else Cast(e, dt, Some(java.time.ZoneOffset.UTC.getId))
      if (!casted.foldable) return None
      val v = casted.eval(InternalRow.empty)
      if (v == null) return None
      Some(new XxHash64(Seq(Literal(v, dt)))
        .eval(InternalRow.empty).asInstanceOf[Long])
    } catch { case scala.util.control.NonFatal(_) => None }
}
