package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) as native codegen'd
  * expressions. The codebook — `m` subspaces × `k` centroids ×
  * `dim/m` floats — rides each expression as ONE plan reference object
  * (the [[NearestCells]] discipline), so plan size is O(1) in both m and
  * k and the hot loops stay inside whole-stage codegen with no per-row
  * allocation beyond the m-int code array.
  *
  * Arithmetic contract (what makes the DuckDB oracle replayable):
  * everything accumulates left-to-right in doubles — subspaces in order,
  * dimensions in order within each subspace — so [[PqDot]] equals a
  * plain [[VecDot]] against the concatenated reconstruction bit-for-bit,
  * and assignment ties keep the SMALLEST centroid id (strict `<`
  * comparison, like NearestCells).
  */
object Pq {

  private def requireDim(what: String, have: Int, need: Int): Unit =
    if (have < need) throw new IllegalArgumentException(
      s"pq: $what has $have element(s), codebook expects $need " +
        "(m × dsub) — a ragged vector would silently quantize from a " +
        "truncated slice; fix the data or retrain with matching m")

  /** code[s] = argmin_j L2²(vec[s·dsub .. s·dsub+dsub), cb(s)(j)).
    * Fails fast on vectors shorter than the codebook's m·dsub — a
    * truncated slice would degenerate to centroid 0, never truncates.
    */
  def encode(
      vec: ArrayData, cb: Array[Array[Array[Float]]],
      floatElems: Boolean): ArrayData = {
    val m = cb.length
    requireDim("vector", vec.numElements(), cb.map(_.head.length).sum)
    val codes = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cents = cb(s)
      val dsub = if (cents.isEmpty) 0 else cents(0).length
      var best = 0.0
      var bestJ = 0
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (floatElems) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          val d = x - c(i).toDouble
          d2 += d * d
          i += 1
        }
        if (j == 0 || d2 < best) { best = d2; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
      off += dsub
    }
    new GenericArrayData(codes)
  }

  /** Σ_s dot(query[s·dsub ..], cb(s)(codes(s))) — the asymmetric-distance
    * (ADC) inner product of the query against the reconstruction, without
    * materializing the reconstruction.
    */
  def adot(
      query: ArrayData, codes: ArrayData, cb: Array[Array[Array[Float]]],
      floatElems: Boolean): Double = {
    val m = cb.length
    requireDim("query", query.numElements(), cb.map(_.head.length).sum)
    requireDim("code", codes.numElements(), m)
    var s = 0
    var off = 0
    var acc = 0.0
    while (s < m) {
      val c = cb(s)(codes.getInt(s))
      var i = 0
      while (i < c.length) {
        val x = if (floatElems) query.getFloat(off + i).toDouble
                else query.getDouble(off + i)
        acc += x * c(i).toDouble
        i += 1
      }
      s += 1
      off += c.length
    }
    acc
  }

  /** ‖reconstruction‖₂ = sqrt(Σ_s ‖cb(s)(codes(s))‖²) — the corpus-side
    * norm cosine ranking needs, computable from the code alone.
    */
  def rnorm(codes: ArrayData, cb: Array[Array[Array[Float]]]): Double = {
    val m = math.min(cb.length, codes.numElements())
    var s = 0
    var acc = 0.0
    while (s < m) {
      val c = cb(s)(codes.getInt(s))
      var i = 0
      while (i < c.length) { val x = c(i).toDouble; acc += x * x; i += 1 }
      s += 1
    }
    math.sqrt(acc)
  }
}

/** `array<float|double>` vector → `array<int>` of m centroid ids. */
case class PqCodes(
    child: Expression,
    codebook: Array[Array[Array[Float]]]) extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_codes: empty codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Pq.encode(input.asInstanceOf[ArrayData], codebook, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", codebook, "float[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Pq.encode($c, $cbRef, $floatElems)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** (query vector, pq code) → ADC inner product (double). */
case class PqDot(
    left: Expression,
    right: Expression,
    codebook: Array[Array[Array[Float]]]) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def floatElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<int>), got ${l.sql} / ${r.sql}")
  }

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    Pq.adot(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      codebook, floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", codebook, "float[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.expressions.Pq.adot($q, $c, $cbRef, $floatElems);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqDot =
    copy(left = l, right = r)
}

/** pq code → reconstruction L2 norm (double). */
case class PqNorm(
    child: Expression,
    codebook: Array[Array[Array[Float]]]) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<int> code, got ${dt.sql}")
  }

  override protected def nullSafeEval(codes: Any): Any =
    Pq.rnorm(codes.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", codebook, "float[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Pq.rnorm($c, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqNorm =
    copy(child = newChild)
}
