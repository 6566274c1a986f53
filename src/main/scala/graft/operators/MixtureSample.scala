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
  * group serializes its sort into one task chain, so [[toWeights]]
  * fail-fasts — reusing the per-group counts it already computed — when
  * any weighted group exceeds `maxGroupRows` (the same guard discipline
  * as BlockGuard on the quadratic pair operators; raising the cap is the
  * explicit opt-in to the single-task sort). At that scale trade
  * exactness for [[toWeightsApprox]]: the q45-style rate-threshold
  * variant (keep when hash·c_g < quota·p), which needs no window at all.
  * All arithmetic is exact under IEEE doubles below 2^53, so external
  * systems (and the DuckDB oracle) replay the selection bit-for-bit.
  */
object MixtureSample {

  private val P = 1000000007L

  /** Replayable multiplicative id hash, uniform on [0, P). */
  private def idHash(idCol: String) =
    ((col(idCol) % P) * lit(654435747L) + lit(12345L)) % P

  /** Per-group row counts (left-joined onto the weights), the serveable
    * total N, and the per-group quotas n_g — the shared head of both
    * variants. Weights drive the join (left outer): a weighted group with
    * ZERO corpus rows keeps c_g = 0, making N = 0 — the requested mixture
    * is unserveable and the sample is honestly empty, instead of silently
    * emitting a mixture that lacks a positively-weighted group.
    */
  private def quotaFrame(
      df: DataFrame,
      groupCol: String,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val bigW = weights.values.sum
    val wdf = weights.toSeq.toDF(groupCol, "__graft_w")
    val counts = wdf
      .join(df.groupBy(col(groupCol)).agg(count(lit(1)).as("__graft_c")),
        Seq(groupCol), "left_outer")
      .na.fill(0L, Seq("__graft_c"))
    val n = counts
      .select(min(floor(col("__graft_c") * bigW / col("__graft_w")))
        .cast("long").as("__graft_n"))
    counts.crossJoin(n)
      .select(col(groupCol), col("__graft_c"),
        floor(col("__graft_w") * col("__graft_n") / bigW)
          .cast("long").as("__graft_quota"))
  }

  /** Exact mixture sample: each group keeps exactly its quota of
    * lowest-hash rows. Fails fast when any weighted group exceeds
    * `maxGroupRows` — the hash-rank window sorts that group in one task
    * chain, so past the cap use [[toWeightsApprox]] (no window; quota hit
    * approximately) or raise the cap to accept the single-task sort.
    * `Long.MaxValue` disables the probe.
    */
  def toWeights(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weights: Map[String, Long],
      maxGroupRows: Long = 10000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // collect the |groups|-row quota frame ONCE: the guard reads the
    // collected rows and the broadcast side is rebuilt from them as a
    // local relation, so the underlying count scan of df runs exactly
    // once per call (not once for the guard and again in the sample plan)
    val quotaRows = quotaFrame(df, groupCol, weights).collect()
    if (maxGroupRows != Long.MaxValue) {
      quotaRows.sortBy(-_.getLong(1)).headOption.foreach { row =>
        val c = row.getLong(1)
        if (c > maxGroupRows) throw new IllegalArgumentException(
          s"MixtureSample.toWeights: group $groupCol=${row.get(0)} has $c " +
            s"rows (> $maxGroupRows); the exact hash-rank window sorts the " +
            "whole group in one task chain. Use toWeightsApprox (no " +
            "window, quota hit approximately) or raise maxGroupRows to " +
            "accept the single-task sort.")
      }
    }
    val quota = broadcast(
      quotaRows.map(r => (r.getString(0), r.getLong(2))).toSeq
        .toDF(groupCol, "__graft_quota"))
    val h = idHash(idCol)
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.join(quota, groupCol)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= col("__graft_quota"))
      .drop("__graft_rn", "__graft_quota")
  }

  /** Temperature-scaled mixture weights — the T5 / multilingual-BERT
    * exponential-smoothing recipe (arXiv:1910.10683 §3.4.3): group g
    * samples proportionally to c_g^alpha, so alpha = 1 keeps natural
    * proportions, alpha = 0 equalizes all groups, and the usual
    * 0.2–0.7 range up-weights low-resource groups without letting a
    * giant group drown them. Returned as the INTEGER weight map
    * [[toWeights]]/[[toWeightsApprox]] consume: w_g = floor(c_g^alpha),
    * ≥ 1 for any non-empty group (common scale factors cancel in the
    * quota arithmetic, so no normalization is needed).
    *
    * One count aggregate, |groups| rows collected — the same bounded
    * collect the quota frame already does. alpha = 0.5 (sqrt) is
    * IEEE-correctly-rounded and therefore bit-replayable by external
    * engines; other exponents go through pow(), whose last-ulp can vary
    * across libm implementations — fine for sampling, but pin 0.5 when
    * an external system must reproduce the exact row set.
    */
  def temperatureWeights(
      df: DataFrame,
      groupCol: String,
      alpha: Double): Map[String, Long] = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"temperatureWeights: alpha $alpha outside [0, 1]")
    // sqrt (not pow(·, 0.5)) for alpha 0.5: Math.pow carries a 1-ulp
    // tolerance that can land floor() on the wrong side of a perfect
    // square; sqrt is IEEE-correctly-rounded, hence replayable
    val raised =
      if (alpha == 0.5) sqrt(col("__graft_c"))
      else if (alpha == 1.0) col("__graft_c").cast("double")
      else pow(col("__graft_c"), alpha)
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("__graft_c"))
      .select(col(groupCol).cast("string"),
        floor(raised).cast("long").as("__graft_w"))
      .collect()
      .map(r => r.getString(0) -> math.max(r.getLong(1), 1L))
      .toMap
  }

  /** [[toWeights]] with the weights derived by [[temperatureWeights]]:
    * one extra count pass, then the exact quota sampler.
    */
  def toTemperature(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      alpha: Double,
      maxGroupRows: Long = 10000000L): DataFrame =
    toWeights(df, groupCol, idCol, temperatureWeights(df, groupCol, alpha),
      maxGroupRows)

  /** Rate-threshold mixture sample — the 100 TB hot-group path: keep a
    * row iff its hash falls below the group's quota fraction of the hash
    * space (`h·c_g < n_g·P`, exact integer arithmetic in decimal — no
    * float rounding, replayable anywhere). Map-side filter under a
    * broadcast quota join: NO window, NO per-group sort, no task-chain
    * serialization — per-group sizes land within binomial noise of the
    * exact quotas (±O(√n_g)), which at hot-group scale is the right
    * trade. Same hash as [[toWeights]], so the approx sample of a group
    * is (up to threshold-edge rows) a superset/subset of the exact one.
    */
  def toWeightsApprox(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weights: Map[String, Long]): DataFrame = {
    val quota = broadcast(quotaFrame(df, groupCol, weights))
    val keep = idHash(idCol).cast("decimal(38,0)") * col("__graft_c") <
      col("__graft_quota").cast("decimal(38,0)") * lit(P)
    df.join(quota, groupCol)
      .filter(col("__graft_c") > 0 && keep)
      .drop("__graft_c", "__graft_quota")
  }
}
