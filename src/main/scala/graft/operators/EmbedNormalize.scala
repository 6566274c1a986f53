package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension embedding standardization (feature z-scoring — the
  * classic preprocessing pass before clustering/ANN when dimensions have
  * heterogeneous scales, and the whitening step of PCA pipelines).
  *
  * Two-pass design, the IvfAnn discipline:
  *   1. STATS — one narrow distributed aggregation: posexplode the
  *      vectors, per-dimension mean + population stddev (map-side
  *      partials; the result is DIM-sized, corpus-independent).
  *   2. APPLY — the dim-sized stats (64·2 doubles here) ride into a
  *      codegen'd `zip_with` projection as two array literals: the
  *      z-transform is then MAP-ONLY — no join, no second shuffle, the
  *      same bounded-driver-materialization contract as broadcasting a
  *      centroid matrix.
  */
object EmbedNormalize {

  /** Distributed per-dimension statistics: (pos, mean, std). */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(avg(col("x")).as("mean"), stddev_pop(col("x")).as("std"))

  /** Standardize: z = (x - mean) / max(std, eps), per dimension. Returns
    * (idCol, zvec: array<double>).
    */
  def standardize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps: Double = 1e-9): DataFrame = {
    val stats = dimStats(df, vecCol).orderBy("pos").collect()
    val means = stats.map(_.getDouble(1))
    val stds = stats.map(r => math.max(r.getDouble(2), eps))
    df.select(col(idCol),
      zip_with(
        zip_with(col(vecCol).cast("array<double>"), lit(means), (x, m) => x - m),
        lit(stds), (c, s) => c / s).as("zvec"))
  }
}
