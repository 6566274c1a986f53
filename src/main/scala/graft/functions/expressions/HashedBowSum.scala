package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed bag-of-words weight sum — the fastText-style linear-model
  * APPLY primitive (Joulin et al., "Bag of Tricks for Efficient Text
  * Classification", arXiv:1607.01759): Σ over whitespace tokens of
  * `weights[polyHash64(token) mod D]`, one pass per document, zero
  * shuffle, zero vocabulary broadcast. Hashing replaces the vocabulary
  * lookup (the standard hashing trick), so scoring 100 TB is a map-only
  * scan whatever the model's vocabulary was.
  *
  * Weights are INTEGER milli-units (a trained model quantized to 1/1000
  * granularity): the per-document sum is exact 64-bit arithmetic, hence
  * order-independent and replayable by an external SQL engine — a
  * double-weight formulation would make every score depend on summation
  * order. |w| ≤ ~2^20 per token keeps any realistic document sum far
  * from overflow. The weight table rides the plan as ONE reference
  * object (the [[NearestCells]]/[[PqCodes]] discipline); the hot loop
  * stays inside whole-stage codegen.
  *
  * Tokenization mirrors [[WordNGrams.compute]]/`TextFunctions.tokens`:
  * lowercase, split on `\s+`.
  */
case class HashedBowSum(
    child: Expression,
    weights: Array[Long]) extends UnaryExpression {

  require(weights.nonEmpty, "hashed_bow_sum: empty weight table")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashedBowSum.compute(input.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bowWeights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashedBowSum.compute($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBowSum =
    copy(child = newChild)
}

object HashedBowSum {

  /** Shared by eval and codegen. `polyHash64` is non-negative by
    * construction (top 16-bit part's prime < 2^15), so `% d` needs no
    * sign fix-up.
    */
  def compute(text: UTF8String, w: Array[Long]): Long = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val d = w.length
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      sum += w((PolyHash64.hash(toks(i)) % d).toInt)
      i += 1
    }
    sum
  }
}
