package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of an embedding vector in one native pass:
  * `struct(scale, codes, max_abs_err)` with
  *
  *   - `scale = max_i |v_i| / levels` (0 for an all-zero or empty vector),
  *   - `codes_i = clamp(floor(v_i/scale + 0.5), -levels, levels)` — the
  *     explicit floor(+0.5) formulation, NOT a round() builtin, because
  *     round-half tie rules differ between engines while floor is IEEE-
  *     deterministic everywhere; the DuckDB oracle replays it exactly,
  *   - `max_abs_err = max_i |v_i - codes_i·scale|` — the reconstruction
  *     bound (≤ scale/2 by construction), reported so downstream
  *     similarity consumers can reason about quantization error.
  *
  * This is the standard 4× memory reduction for ANN/embedding stores
  * (float32 → int8 + one float scale per vector). One expression, two
  * tight loops per row (max-abs, then quantize+error), inside whole-stage
  * codegen — the HOF formulation would run three interpreted
  * `transform`/`aggregate` lambdas per row (see VecExpressions scaladoc
  * for the measured cost of that shape).
  */
case class VecQuantize(child: Expression, levels: Int = 127)
    extends UnaryExpression {
  require(levels >= 1, "levels must be >= 1")

  override def dataType: DataType = VecQuantize.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"vec_quantize requires array<float|double>, got ${dt.sql}")
  }

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    VecQuantize.compute(input.asInstanceOf[ArrayData], levels, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.VecQuantize.compute($c, $levels, $floatElems)")

  override protected def withNewChildInternal(c: Expression): VecQuantize =
    copy(child = c)

  override def prettyName: String = "vec_quantize"
}

object VecQuantize {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false)))

  def compute(vec: ArrayData, levels: Int, floatElems: Boolean): InternalRow = {
    val n = vec.numElements()
    def at(i: Int): Double =
      if (floatElems) vec.getFloat(i).toDouble else vec.getDouble(i)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(at(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / levels
    val codes = new Array[Int](n)
    var maxErr = 0.0
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val v = at(i)
        var q = math.floor(v / scale + 0.5)
        if (q > levels) q = levels
        if (q < -levels) q = -levels
        val qi = q.toInt
        codes(i) = qi
        val err = math.abs(v - qi * scale)
        if (err > maxErr) maxErr = err
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(codes), maxErr))
  }
}
