package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Quantile-bucket id for Z-order clustering: the number of sorted
  * `boundaries` that are <= the value (an upper-bound binary search).
  *
  * Replaces the declarative formulation
  * `size(filter(typedLit(boundaries), q => value >= q))`, which evaluates
  * an INTERPRETED lambda over all 2^bits-1 boundaries per row per column
  * — ~500 interpreted comparisons/row for a 2-column 8-bit Z-value, the
  * dominant cost of OPTIMIZE ZORDER at scale (measured 20× on a 10× corpus
  * before this expression). Here the sorted boundary array is ONE codegen
  * reference object shared across rows and the per-row cost is a ~`bits`-
  * step binary search inside whole-stage codegen.
  *
  * The upper-bound search handles duplicate boundaries (heavy-skew
  * quantiles collapse) identically to the count formulation: every equal
  * boundary counts as <=. Null propagates (callers decide the null
  * bucket, matching the previous when/otherwise shape).
  */
case class QuantileBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "boundaries must not be empty")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket requires a double input, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    QuantileBucket.upperBound(boundaries, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("qbBoundaries", boundaries, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.QuantileBucket.upperBound($arr, $c)")
  }

  override protected def withNewChildInternal(c: Expression): QuantileBucket =
    copy(child = c)

  override def prettyName: String = "quantile_bucket"
}

object QuantileBucket {
  /** #elements of sorted `bs` that are <= v (first index with bs(i) > v). */
  def upperBound(bs: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
