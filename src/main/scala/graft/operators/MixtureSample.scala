package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture balancing for training-data prep: downsample a multi-source
  * corpus so group shares hit target MIXING WEIGHTS (the "data mixture"
  * knob — e.g. en:5, code:3, de:2), deterministically and exactly.
  *
  * Given integer weights w_g, the sampler computes the LARGEST total N
  * the corpus can serve at that mixture (N = min_g floor(c_g·W / w_g),
  * W = Σw — the scarcest group is the bottleneck), takes per-group
  * quotas n_g = floor(w_g·N / W), and keeps each group's n_g
  * lowest-hash rows (replayable multiplicative hash of the id,
  * id-tiebroken) — no RNG anywhere, so the sample is stable across
  * retries, replays, and cluster layouts, and the same row set comes
  * back on every run (the reproducible-split property q45's stratified
  * sampler establishes, extended from fixed rates to data-derived
  * quotas). Groups without a weight are dropped.
  *
  * Scale shape: one tiny count aggregate joined to the weights (the
  * quota frame is |groups| rows — broadcast), then ONE shuffle
  * partitioned by group for the hash-rank window. A pathologically hot
  * group serializes its sort into one task chain; at that scale trade
  * exactness for the q45-style rate-threshold variant (keep when
  * hash%M < rate·M), which needs no window at all. All arithmetic is
  * exact under IEEE doubles below 2^53, so external systems (and the
  * DuckDB oracle) replay the selection bit-for-bit.
  */
object MixtureSample {

  def toWeights(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val bigW = weights.values.sum
    val wdf = weights.toSeq.toDF(groupCol, "__graft_w")
    // weights drive the join (left outer): a weighted group with ZERO
    // corpus rows keeps c_g = 0, making N = 0 — the requested mixture is
    // unserveable and the sample is honestly empty, instead of silently
    // emitting a mixture that lacks a positively-weighted group
    val counts = wdf
      .join(df.groupBy(col(groupCol)).agg(count(lit(1)).as("__graft_c")),
        Seq(groupCol), "left_outer")
      .na.fill(0L, Seq("__graft_c"))
    val n = counts
      .select(min(floor(col("__graft_c") * bigW / col("__graft_w")))
        .cast("long").as("__graft_n"))
    val quota = broadcast(counts.crossJoin(n)
      .select(col(groupCol),
        floor(col("__graft_w") * col("__graft_n") / bigW)
          .cast("long").as("__graft_quota")))
    val p = lit(1000000007L)
    val h = ((col(idCol) % p) * lit(654435747L) + lit(12345L)) % p
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.join(quota, groupCol)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= col("__graft_quota"))
      .drop("__graft_rn", "__graft_quota")
  }
}
