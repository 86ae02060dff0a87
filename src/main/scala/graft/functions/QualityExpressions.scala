package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frozen weights for [[QualityScore]] — a holder (not the expression's
  * case-class fields) so plan text prints a summary, equality is by
  * value, and the per-thread digest rides along. */
final class QualityModelRef(val weights: Array[Double], val bias: Double)
    extends Serializable {
  require(weights.nonEmpty)
  val dim: Int = weights.length

  @transient private lazy val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  def md5: java.security.MessageDigest = digest.get()

  override def toString: String = s"QualityModelRef(dim=$dim)"
  override def equals(o: Any): Boolean = o match {
    case q: QualityModelRef =>
      bias == q.bias && java.util.Arrays.equals(weights, q.weights)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(weights) * 31 + java.lang.Double.hashCode(bias)
}

/** The learned-quality score σ(bias + Σ w[bucket(gram)] / #grams) as
  * ONE tight JVM pass — bit-identical to the declarative column form
  * (`Classify.qualityProbColumns`, which documents the oracle
  * arithmetic) and ~30× faster: higher-order lambdas evaluate
  * interpreted per gram, so the column form pays tree-walk + UTF8String
  * allocation per trigram; this computes the same doubles with one
  * reused MessageDigest and zero per-gram allocation (grams are byte
  * slices of the padded UTF-8 buffer — the md5 of a UTF-8 slice IS the
  * md5 of the substring).
  *
  * Arithmetic lockstep with the oracle, term by term: lowercase via
  * `UTF8String.toLowerCase` (what Spark's `lower` calls), trigrams over
  * CODE POINTS of ' '+lower(text)+' ', bucket = first 16 md5 bits mod
  * dim (== the oracle's 4-hex-digit fold), weight sum as a strict
  * left fold in gram order, denominator max(#grams, 1), `Math.exp`.
  * NULL text → NULL (null-intolerant). `ClassifySpec` asserts
  * bit-equality against the column form on prose, junk, unicode,
  * short and empty inputs.
  */
case class QualityScore(child: Expression, model: QualityModelRef)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  def compute(text: UTF8String): Double = {
    val s = " " + text.toLowerCase.toString + " "
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // code-point start offsets in the UTF-8 buffer
    val starts = new Array[Int](bytes.length + 1)
    var nCp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(nCp) = i; nCp += 1 }
      i += 1
    }
    starts(nCp) = bytes.length
    val nGrams = nCp - 2
    var sum = 0.0
    if (nGrams > 0) {
      val md = model.md5
      val w = model.weights
      var g = 0
      while (g < nGrams) {
        md.reset()
        md.update(bytes, starts(g), starts(g + 3) - starts(g))
        val d = md.digest()
        val h = ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
        sum += w(h % model.dim)
        g += 1
      }
    }
    val z = model.bias + sum / math.max(nGrams, 1).toDouble
    1.0 / (1.0 + math.exp(-z))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qscore", this, classOf[QualityScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
