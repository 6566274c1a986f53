package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.polyHash64

/** Weighted sampling WITHOUT replacement, k per group — the
  * Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters 97(5), 2006):
  * each row draws a uniform u and gets the key u^(1/w); the k largest
  * keys per group ARE a weighted sample without replacement. Ranking by
  * ln(u)/w is monotone-equivalent (ln u < 0, exp monotone) and cheaper,
  * so that is the stored key.
  *
  * Unlike `rand()`-based sampling, u here is a SEEDED HASH of the row id
  * (the [[ShardLayout]] determinism discipline): u = (polyHash64 mod
  * 10^9 + 1) / (10^9 + 1) — replay-stable across runs, partitionings and
  * engines, which is what makes the q94 oracle able to reproduce the
  * sample bit-for-bit in DuckDB. This complements the existing sampling
  * tiers: stratified (q45, hash-thresholded rates) and mixture quotas
  * (q66, exact counts) — A-ES is the "importance-weighted exemplars"
  * primitive (e.g. quality-weighted document selection).
  *
  * Scale: one codegen'd hash + one window top-k per group (the q13
  * discipline — rank only within groups, never a global sort). For a
  * group small enough to broadcast its k, the bounded-heap `TopKAgg`
  * formulation avoids even the per-group sort; the window form is the
  * general tier.
  */
object WeightedSample {

  /** u ∈ (0, 1), derived from the seeded hash of `id` — never 0 or 1,
    * so ln(u)/w is always finite.
    */
  def uniformOf(id: Column, seed: String): Column =
    ((polyHash64(concat_ws("|", lit(seed), id.cast("string"))) % 1000000007L) + 1L)
      .cast("double") / lit(1000000008.0)

  /** @param weightCol strictly positive weights (larger = more likely)
    * @return the sampled rows: (groupCol, idCol, weightCol, key, rank),
    *         rank 1..k by A-ES key descending.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: String = "wsamp42"): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    val key = log(uniformOf(col(idCol), seed)) / col(weightCol).cast("double")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__key").desc, col(idCol))
    df.select(col(groupCol), col(idCol), col(weightCol))
      .withColumn("__key", key)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumnRenamed("__key", "key")
  }
}
