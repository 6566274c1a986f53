package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `array<float>` /
  * `array<double>` embedding columns.
  *
  * Why not HOFs: `aggregate(zip_with(...))` is evaluated interpreted (no
  * whole-stage codegen for lambda functions) and allocates an intermediate
  * array per row-pair — measured ~50× slower on a 2k×2k cosine-pair scan.
  * These expressions generate a tight primitive loop (no boxing, no
  * allocation) and stay inside whole-stage codegen, which is what a 100 TB
  * similarity sweep needs.
  *
  * Accumulation order is left-to-right in doubles, matching both the HOF
  * formulation and DuckDB's `list_cosine_similarity` bit-for-bit.
  */
trait VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  /** getFloat/getDouble accessor for codegen. */
  protected def access(arr: String, i: String, dt: DataType): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  protected def accessEval(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }
}

/** dot(a, b): Σ aᵢ·bᵢ over min(len(a), len(b)). */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - dot product of two float/double vectors")
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += accessEval(x, i, lt) * accessEval(y, i, rt); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $s = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        $s += ${access(a, i, elemType(left))} * ${access(b, i, elemType(right))};
      }
      ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), all three accumulators in one pass. */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - cosine similarity of two float/double vectors")
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = accessEval(x, i, lt); val yv = accessEval(y, i, rt)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        double $xv = ${access(a, i, elemType(left))};
        double $yv = ${access(b, i, elemType(right))};
        $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
      }
      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** euclidean(a, b) = √Σ (aᵢ-bᵢ)². */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - euclidean distance between two float/double vectors")
case class VecEuclidean(left: Expression, right: Expression) extends VecBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = accessEval(x, i, lt) - accessEval(y, i, rt)
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $s = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        double $d = ${access(a, i, elemType(left))} - ${access(b, i, elemType(right))};
        $s += $d * $d;
      }
      ${ev.value} = java.lang.Math.sqrt($s);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecEuclidean =
    copy(left = l, right = r)
}

/** sub(a, b): element-wise a − b over min(len), as array<double> — the
  * residual builder for IVF-PQ (vector minus its cell centroid). Double
  * output: float−float is exact in double, so downstream PQ assignment
  * sees the residual bit-exactly (and external replays — DuckDB
  * `list_zip`+`list_transform` over `::DOUBLE[]` casts — agree).
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - element-wise difference of two float/double vectors")
case class VecSub(left: Expression, right: Expression) extends VecBinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = accessEval(x, i, lt) - accessEval(y, i, rt); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double[] $out = new double[$n];
      for (int $i = 0; $i < $n; $i++) {
        $out[$i] = ${access(a, i, elemType(left))} - ${access(b, i, elemType(right))};
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSub =
    copy(left = l, right = r)
}
