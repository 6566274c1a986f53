package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine => vcos}

/** Per-DIMENSION 8-bit scalar quantization for embedding search — the
  * faiss `ScalarQuantizer(QT_8bit)` tier: train a (lo, hi) range per
  * dimension over the corpus, store each vector as 64×1-byte levels
  * (4× smaller than float32, 8× than float64), and search
  * ASYMMETRICALLY — the float query scores against dequantized corpus
  * codes, so only the corpus side pays quantization error. Complements
  * [[graft.functions.expressions.VecQuantize]] (per-VECTOR symmetric
  * scale, q78's storage shape): per-dim ranges adapt to anisotropic
  * embedding distributions, which is what serving indexes train.
  *
  * Rounding is `floor(x + 0.5)`, never `round()` — round-half tie rules
  * differ between engines; floor-based levels replay bit-for-bit in the
  * DuckDB oracle (the [[graft.functions.expressions.VecQuantize]]
  * precedent).
  *
  * Scale shape: training is one posexplode + per-dim min/max — a
  * map-side-combined aggregate whose state is dim-bounded; the collected
  * model is dims × 16 bytes (model-sized, like IVF centroids). Encode
  * and dequantize are pure per-row zip_with projections against the
  * broadcast literal range arrays (evaluated once at plan time — no
  * per-element re-computation); search inherits [[Ann]]'s
  * broadcast-queries + bounded-heap top-k discipline, so the corpus
  * never shuffles. At 100 TB, persist the encoded corpus partitioned by
  * an IVF cell (the [[PqAnn]] layout) and dequantize only probed cells.
  */
object ScalarQuant {

  /** Per-dimension (lo, hi) over the corpus — the trained model.
    * Dim-bounded collect (embeddings are O(100) dims; this is the same
    * model-sized collect as IVF centroids).
    */
  def trainRanges(corpus: DataFrame, vecCol: String): Array[(Double, Double)] =
    corpus.select(posexplode(col(vecCol)).as(Seq("__d", "__x")))
      .groupBy(col("__d"))
      .agg(min(col("__x").cast("double")).as("lo"),
        max(col("__x").cast("double")).as("hi"))
      .orderBy(col("__d"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))

  private def litArray(xs: Array[Double]): Column = array(xs.map(lit).toIndexedSeq: _*)

  /** Quantized level per value: floor((x−lo)/(hi−lo)·255 + 0.5)
    * SATURATED to [0, 255] — encoding a new shard against a persisted
    * (lo, hi) model (the serving flow) sees out-of-range values, and
    * faiss SQ8 clamps rather than wraps, so levels always fit one byte.
    * A degenerate dimension (hi = lo) stores level 0.
    */
  def encodeExpr(vec: Column, ranges: Array[(Double, Double)]): Column = {
    val lo = litArray(ranges.map(_._1))
    val span = litArray(ranges.map { case (l, h) => h - l })
    zip_with(zip_with(vec, lo, (x, l) => x.cast("double") - l), span,
      (num, s) => when(s === 0d, lit(0)).otherwise(
        greatest(lit(0), least(lit(255),
          floor(num / s * 255d + 0.5d).cast("int")))))
  }

  /** Dequantized value per level: lo + level/255·(hi−lo). */
  def decodeExpr(codes: Column, ranges: Array[(Double, Double)]): Column = {
    val lo = litArray(ranges.map(_._1))
    val span = litArray(ranges.map { case (l, h) => h - l })
    zip_with(zip_with(codes, span, (c, s) => c.cast("double") / 255d * s), lo,
      (v, l) => v + l)
  }

  /** Encode the corpus: (idCol, codes). The serving artifact — write
    * this (optionally partitioned by an IVF cell) and drop the floats.
    */
  def encode(
      corpus: DataFrame, idCol: String, vecCol: String,
      ranges: Array[(Double, Double)]): DataFrame =
    corpus.select(col(idCol), encodeExpr(col(vecCol), ranges).as("codes"))

  /** Asymmetric exact top-k: float queries against the dequantized
    * encoded corpus. Output matches [[Ann.bruteForceTopK]]:
    * (query_id, neighbor_id, cosine, rank).
    */
  def searchTopK(
      encoded: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      ranges: Array[(Double, Double)]): DataFrame = {
    val q = Broadcasting.broadcastIfSmall(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = encoded.select(col(idCol).as("neighbor_id"),
      decodeExpr(col("codes"), ranges).as("__cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        vcos(col("__qv"), col("__cv")).as("__cos"))
    Ann.rankTopK(scored, k)
  }

  /** Train + encode + search in one call — the recompute tier. */
  def bruteForceSqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val ranges = trainRanges(corpus, vecCol)
    searchTopK(encode(corpus, idCol, vecCol, ranges), queries,
      idCol, vecCol, k, ranges)
  }
}
