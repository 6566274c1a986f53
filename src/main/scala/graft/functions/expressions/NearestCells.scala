package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `nProbe` nearest centroid ids (by euclidean distance, ascending)
  * for a vector against a fixed centroid matrix — IVF cell assignment and
  * probe selection in one expression.
  *
  * Why an expression and not `array_min(array(struct(dist(v, c₀), 0), …))`
  * over per-centroid literals: that formulation materializes
  * `nCentroids × dim` literal NODES in the plan, so a realistic inverted
  * file (thousands of cells) blows past Janino method-size limits long
  * before data size matters. Here the matrix is ONE reference object
  * (`float[][]`) carried into codegen, the distance loop is a tight
  * primitive scan, and plan size is O(1) in `nCentroids` — the expression
  * scales to however many cells the index needs.
  *
  * Ordering matches the literal formulation bit-for-bit: squared distance
  * is compared (monotonic with the sqrt'd value), accumulation is
  * left-to-right in doubles, and ties keep the smaller centroid id — the
  * lexicographic `struct(dist, id)` order of `array_min`/`array_sort`.
  */
@ExpressionDescription(
  usage = "_FUNC_(vec) - ids of the nProbe nearest centroids, nearest first")
case class NearestCells(
    child: Expression,
    centroids: Array[Array[Float]],
    nProbe: Int) extends UnaryExpression {

  require(nProbe >= 1, s"nearestCells: nProbe must be >= 1, got $nProbe")
  require(centroids.nonEmpty, "nearestCells: empty centroid matrix")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NearestCells.nearest(
      input.asInstanceOf[ArrayData], centroids, nProbe, elemType == FloatType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val fl = if (elemType == FloatType) "true" else "false"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NearestCells.nearest($c, $cRef, $nProbe, $fl)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {

  /** Shared by eval and codegen: bounded insertion-select of the k nearest
    * centroids — O(nCentroids · (dim + k)) per row, no allocation beyond
    * the k-sized result. Strict comparisons keep the earlier (smaller) id
    * on distance ties.
    */
  def nearest(
      vec: ArrayData, centroids: Array[Array[Float]], k: Int,
      floatElems: Boolean): ArrayData = {
    val n = centroids.length
    val kk = math.min(k, n)
    val bestD = new Array[Double](kk)
    val bestI = new Array[Int](kk)
    var filled = 0
    var c = 0
    while (c < n) {
      val cent = centroids(c)
      val m = math.min(vec.numElements(), cent.length)
      var s = 0.0
      var j = 0
      while (j < m) {
        val x = if (floatElems) vec.getFloat(j).toDouble else vec.getDouble(j)
        val d = x - cent(j).toDouble
        s += d * d
        j += 1
      }
      if (filled < kk) {
        var p = filled
        while (p > 0 && bestD(p - 1) > s) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = s; bestI(p) = c; filled += 1
      } else if (s < bestD(kk - 1)) {
        var p = kk - 1
        while (p > 0 && bestD(p - 1) > s) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = s; bestI(p) = c
      }
      c += 1
    }
    new GenericArrayData(bestI)
  }
}
