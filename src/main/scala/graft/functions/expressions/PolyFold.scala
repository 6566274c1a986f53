package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash `h = (h·base + codepoint) mod m` over the
  * text's code points — the native form of the classic content
  * fingerprint.
  *
  * Replaces `aggregate(split(text, ''), 0L, (h, c) -> (h*31 + ascii(c)) %
  * m)`, which materializes a one-string-per-character array per row and
  * runs the fold as an interpreted lambda (HOF lambdas never enter
  * whole-stage codegen) — the same anti-pattern class as the pre-
  * QuantileBucket Z-value bucketing, costing O(len) interpreted steps +
  * O(len) allocations per row. Here the fold is a tight loop over the
  * string's code points inside codegen; semantics are identical, including
  * the empty string folding to 0.
  */
case class PolyFold(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {
  require(base > 0 && mod > 1, "base must be > 0 and mod > 1")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"poly_fold requires a string input, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PolyFold.compute(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PolyFold.compute($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(c: Expression): PolyFold =
    copy(child = c)

  override def prettyName: String = "poly_fold"
}

object PolyFold {
  def compute(text: UTF8String, base: Long, mod: Long): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
}
