package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Count of `boundaries` at or below the input value — the per-column
  * quantile rank feeding z-order bit interleaving
  * ([[graft.store.ZOrder]]).
  *
  * `boundaries` hold CATALYST-INTERNAL values of the child's type
  * (UTF8String / epoch micros / epoch days / boxed numerics), sorted
  * ascending; the rank comes from a binary search (≤ 8 comparisons for
  * the 255-boundary default) in one virtual call per row, keeping the
  * rewrite's scan→project pipeline inside whole-stage codegen. The
  * same rank as a higher-order `filter` over a literal array evaluates
  * its lambda INTERPRETED per element — 255 interpreted calls per row
  * per column, measured ~4× slower end-to-end on a 6 M-row rewrite.
  */
case class QuantileRank(child: Expression, boundaries: Array[Any])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "QuantileRank needs at least one boundary")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantile_rank"

  def compute(v: Any): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (boundaries(m).asInstanceOf[Comparable[Any]].compareTo(v) <= 0)
        lo = m + 1
      else hi = m
    }
    lo
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qrank", this, classOf[QuantileRank].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
