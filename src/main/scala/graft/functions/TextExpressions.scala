package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash-sketch expressions for near-duplicate detection at scale.
  *
  * Each runs one tight JVM loop per row over the token array — a single
  * pass computes the whole signature (64 permutations derive from one
  * base hash via multiply-add, not 64 re-hashes), which is what makes
  * signature computation affordable over billions of documents.
  *
  * All implement `doGenCode` by calling their own `compute` through a
  * codegen object reference — NOT `CodegenFallback`, which would demote
  * the entire containing stage to interpreted execution: one virtual
  * call per row keeps the surrounding scan→project→explode pipeline
  * inside whole-stage codegen.
  */

/** MinHash signature: `array<bigint>` of length `numHashes`.
  *
  * g_j(t) = a_j * h(t) + b_j over the 64-bit ring; signature_j =
  * min_t g_j(t) (unsigned min). Standard MinHash estimator: expected
  * fraction of equal components ≈ Jaccard(tokensA, tokensB).
  *
  * Accepts `array<string>` (tokens are xxhash64'd first) or
  * `array<bigint>` (pre-hashed elements, e.g. [[ShingleHashes]] output —
  * skips the string hashing entirely, the hot-path pairing).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 512)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val coeffs: (Array[Long], Array[Long]) =
    MinHashSignature.coefficients(numHashes, seed)

  @transient private lazy val preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  def compute(tokens: ArrayData): ArrayData = {
    val (as, bs) = coeffs
    val sig = Array.fill(numHashes)(-1L) // 0xFFFF… = unsigned max
    val n = tokens.numElements()
    @inline def fold(h: Long): Unit = {
      var j = 0
      while (j < numHashes) {
        val g = as(j) * h + bs(j)
        if (java.lang.Long.compareUnsigned(g, sig(j)) < 0) sig(j) = g
        j += 1
      }
    }
    var t = 0
    if (preHashed) {
      while (t < n) { fold(tokens.getLong(t)); t += 1 }
    } else {
      while (t < n) {
        val tok = tokens.getUTF8String(t)
        if (tok != null) fold(HashUtil.xx64(tok, seed))
        t += 1
      }
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
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

/** Hashed word n-gram shingles: `array<bigint>`, one 64-bit hash per
  * window of `n` consecutive tokens (positional multiply-xor fold of the
  * per-token xxhash64s). Equivalent candidate/verification signal to
  * string shingles (`concat_ws` over slices) without materializing
  * millions of concatenated strings — at corpus scale the string
  * shingling dominates the whole dedup pipeline, this is the same
  * information at ~10× less cost. Documents shorter than `n` tokens
  * produce a single hash over all their tokens (mirroring the string
  * version's single joined shingle).
  */
case class ShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {
  require(n >= 1 && n <= 64)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private val Prime = 0x9E3779B97F4A7C15L

  def compute(tokens: ArrayData): ArrayData = {
    val count = tokens.numElements()
    val th = new Array[Long](count)
    var i = 0
    while (i < count) {
      val tok = tokens.getUTF8String(i)
      th(i) = if (tok == null) seed else HashUtil.xx64(tok, seed)
      i += 1
    }
    val windows = math.max(1, count - n + 1)
    val out = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var h = 1L
      var k = w
      val end = math.min(w + n, count)
      while (k < end) { h = h * Prime ^ th(k); k += 1 }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per token hash, vote each bit
  * +1/-1; result bit i = sign of vote i. Hamming-close simhashes ⇒
  * similar token multisets.
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def compute(tokens: ArrayData): Long = {
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

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash of a string (document fingerprinting —
  * content-defined, order-sensitive, cheap to maintain incrementally).
  */
case class RollingHash(child: Expression, base: Long, modulus: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xFF)) % modulus
      i += 1
    }
    h
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollhash", this, classOf[RollingHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
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
