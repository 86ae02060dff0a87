package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash-sketch expressions for near-duplicate detection at scale.
  *
  * Both run one tight JVM loop per row over the token array — a single
  * pass computes the whole signature (64 permutations derive from one
  * base hash via multiply-add, not 64 re-hashes), which is what makes
  * signature computation affordable over billions of documents.
  */

/** MinHash signature: `array<bigint>` of length `numHashes`.
  *
  * g_j(t) = a_j * h(t) + b_j over the 64-bit ring; signature_j =
  * min_t g_j(t) (unsigned min). Standard MinHash estimator: expected
  * fraction of equal components ≈ Jaccard(tokensA, tokensB).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(numHashes >= 1 && numHashes <= 512)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val coeffs: (Array[Long], Array[Long]) =
    MinHashSignature.coefficients(numHashes, seed)

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[ArrayData]
    val (as, bs) = coeffs
    val sig = Array.fill(numHashes)(-1L) // 0xFFFF… = unsigned max
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) {
        val h = HashUtil.xx64(tok, seed)
        var j = 0
        while (j < numHashes) {
          val g = as(j) * h + bs(j)
          if (java.lang.Long.compareUnsigned(g, sig(j)) < 0) sig(j) = g
          j += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val as = Array.fill(numHashes)(rnd.nextLong() | 1L) // odd => bijective over Z/2^64
    val bs = Array.fill(numHashes)(rnd.nextLong())
    (as, bs)
  }
}

/** 64-bit SimHash over a token array: per token hash, vote each bit
  * +1/-1; result bit i = sign of vote i. Hamming-close simhashes ⇒
  * similar token multisets.
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) {
        val h = HashUtil.xx64(tok, seed)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash of a string (document fingerprinting —
  * content-defined, order-sensitive, cheap to maintain incrementally).
  */
case class RollingHash(child: Expression, base: Long, modulus: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xFF)) % modulus
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[functions] object HashUtil {
  /** xxHash64 over a UTF8String's bytes via Spark's own implementation
    * (the same primitive behind the built-in `xxhash64` function). */
  def xx64(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
}
