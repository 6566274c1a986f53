package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of the lowercased, whitespace-split text, each
  * gram joined with single spaces — natively, in one pass.
  *
  * Semantics are identical to the declarative formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(split(lower(text),'\\s+'), i+1, n))))`, including Spark's
  * split-with-limit=-1 behavior — but that formulation re-evaluates the
  * regex split per array element (O(tokens²) per row) and runs interpreted
  * (lambda HOFs never enter whole-stage codegen). This expression splits
  * once and builds grams in a tight loop; order of first occurrence is
  * preserved exactly like array_distinct.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string input, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WordNGrams.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordNGrams =
    copy(child = c)

  override def prettyName: String = "word_ngrams"
}

object WordNGrams {
  /** One row's grams: lowercase → regex split (limit -1, matching Spark's
    * `split`) → sliding n-window join → insertion-ordered dedup.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
