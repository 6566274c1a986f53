package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream (view → click → purchase):
  * for each entity, stage k counts only if an event of stage k's type
  * occurs AT OR AFTER the entity's earliest qualifying stage k-1 event —
  * the standard product-analytics funnel (Amplitude/GA "closed funnel"
  * semantics, "this order" matching on earliest-completion times).
  *
  * Spark lacks MATCH_RECOGNIZE; this is the compose-existing-ops
  * formulation (builder-brief preference (a)) and it is one-shuffle:
  *
  *   1. Stage times are unordered window aggregates over the SAME
  *      partitioning (`PARTITION BY entity`, whole-partition frame):
  *      t0 = min(ts | type = s0), tk = min(ts | type = sk ∧ ts ≥ t(k-1)).
  *      Consecutive Window nodes share one exchange and need no sort.
  *   2. The per-entity reduction (`groupBy(entity)`) reuses that same
  *      hash partitioning — no second exchange.
  *   3. The final stage-count rollup is a global aggregate over one row
  *      per entity, partial-aggregated map-side.
  *
  * At 100 TB: cost is one shuffle of (entity, type, ts) triples — the
  * minimum for any per-entity ordering semantics — then entity-sized and
  * stage-sized frames. No per-entity event list is ever materialized.
  */
object Funnel {

  /** One row per entity: entity key, t_0..t_{n-1} stage-completion
    * timestamps (null = stage never reached in order).
    */
  def stageTimes(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(entityCol))
    val base = events.select(col(entityCol), col(typeCol), col(tsCol))
    val withTimes = stages.zipWithIndex.foldLeft(base) { case (df, (stage, i)) =>
      val cond =
        if (i == 0) col(typeCol) === stage
        else col(typeCol) === stage && col(tsCol) >= col(s"t${i - 1}")
      df.withColumn(s"t$i", min(when(cond, col(tsCol))).over(w))
    }
    withTimes
      .groupBy(col(entityCol))
      .agg(first(col("t0")).as("t0"),
        (1 until stages.length).map(i => first(col(s"t$i")).as(s"t$i")): _*)
  }

  /** Stage-level rollup: one row per stage with the distinct-entity count
    * that reached it in order, conversion from the previous stage, and
    * conversion from the first stage (both rounded to 4 for display
    * stability; counts are exact).
    */
  def analyze(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    val times = stageTimes(events, entityCol, typeCol, tsCol, stages)
    val counts = times.agg(
      count(col("t0")).as("n0"),
      (1 until stages.length).map(i => count(col(s"t$i")).as(s"n$i")): _*)
    val stageStructs = stages.zipWithIndex.map { case (stage, i) =>
      val users = col(s"n$i")
      val prev = if (i == 0) col(s"n$i") else col(s"n${i - 1}")
      struct(
        lit(i + 1).as("stage_idx"),
        lit(stage).as("stage"),
        users.as("users"),
        round(users.cast("double") / when(prev === 0, lit(null)).otherwise(prev), 4)
          .as("conv_from_prev"),
        round(users.cast("double") / when(col("n0") === 0, lit(null)).otherwise(col("n0")), 4)
          .as("conv_overall"))
    }
    counts
      .select(explode(array(stageStructs: _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.users"),
        col("s.conv_from_prev"), col("s.conv_overall"))
  }
}
