package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftColumnBridge

import graft.functions.expressions.{NearestCells, VecCosine, VecDot, VecEuclidean}

/** Dense-vector math over `array<float>`/`array<double>` embedding columns.
  *
  * The hot-path functions (`dot`, `cosine`, `euclidean`) are native
  * codegen'd Catalyst expressions (expressions.VecExpressions) — a tight
  * primitive loop per row, no boxing/allocation, inside whole-stage
  * codegen. The `*Hof` variants are the pure higher-order-function
  * formulations: same math, same left-to-right double accumulation
  * (bit-identical results — tested), but interpreted; kept as the
  * executable specification and cross-check.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")
  private def e(c: Column) = GraftColumnBridge.expression(c)

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(e(a), e(b)))

  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosine(e(a), e(b)))

  def euclidean(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecEuclidean(e(a), e(b)))

  /** Element-wise a − b as array<double> (the IVF-PQ residual). */
  def vecSub(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      graft.functions.expressions.VecSub(e(a), e(b)))

  /** Ids of the `nProbe` centroids nearest to `v` (euclidean, nearest
    * first). The matrix rides into codegen as ONE reference object, so the
    * plan stays O(1) in the number of centroids — see
    * [[expressions.NearestCells]].
    */
  def nearestCells(v: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    GraftColumnBridge.column(NearestCells(e(v), centroids, nProbe))

  /** Symmetric int8 quantization: `struct(scale, codes, max_abs_err)` in
    * one native pass — see [[expressions.VecQuantize]] for the pinned
    * floor-based rounding that makes it SQL-replayable.
    */
  def quantizeInt8(v: Column, levels: Int = 127): Column =
    GraftColumnBridge.column(
      graft.functions.expressions.VecQuantize(e(v), levels))

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (s, v) => s + v)

  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (s, v) => s + d(v) * d(v))

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (norm(a) * norm(b))

  def euclideanHof(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (s, v) => s + v))

  /** Sign bit pattern of the vector against `planes` (a literal matrix of
    * hyperplane normals): bit i set ⇔ dot(v, planes(i)) >= 0. The core of
    * random-hyperplane LSH for cosine similarity.
    */
  def hyperplaneSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(v, plane) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
