package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key event stream
  * onto a fixed grid and forward-fill gaps (the Flink/Timescale
  * `time_bucket_gapfill` + `locf` shape, which Spark has no built-in for).
  *
  * Pipeline, all on ONE hash partitioning by key:
  *
  *   1. bucket observations: `date_trunc(unit, ts)` → groupBy(key, bucket)
  *      sum (one shuffle, map-side partials);
  *   2. per-key grid: groupBy(key) min/max bucket (reuses the partitioning)
  *      → `sequence(min, max, step)` + explode. The grid is generated
  *      distributed, never on the driver; per-key grid length is bounded
  *      by the key's own observed span, so no key explodes the frame
  *      beyond span/step rows.
  *   3. left-join grid ← observations on (key, bucket) — both sides
  *      already partitioned by key;
  *   4. forward fill: `last(value, ignoreNulls) OVER (PARTITION BY key
  *      ORDER BY bucket ROWS UNBOUNDED PRECEDING)` — the only sort, local
  *      to each key partition.
  *
  * At 100 TB the cost is one shuffle of the bucketed aggregates plus a
  * per-key sort of grid-sized frames; nothing is quadratic and no driver
  * collection exists.
  */
object GapFill {

  /** @param df       input observations
    * @param keyCol   series key (e.g. user_id)
    * @param tsCol    event-time column (TimestampType)
    * @param valCol   numeric observation column (summed per bucket)
    * @param unit     date_trunc unit for the grid ("day", "hour", ...)
    * @param step     sequence step matching `unit` (e.g. "interval 1 day")
    * @return (key, bucket, value, observed): one row per key per grid
    *         bucket from the key's first to last observation; `value` is
    *         the bucket's sum, forward-filled from the most recent
    *         observed bucket when the bucket itself had no observations;
    *         `observed` marks real vs filled buckets.
    */
  def resampleFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      unit: String = "day",
      step: String = "interval 1 day"): DataFrame = {
    val obs = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(sum(col(valCol)).as("v"))

    val grid = obs
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), expr(step))).as("bucket"))

    val joined = grid.join(obs, Seq(keyCol, "bucket"), "left")

    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      col(keyCol),
      col("bucket"),
      last(col("v"), ignoreNulls = true).over(w).as("value"),
      col("v").isNotNull.as("observed"))
  }
}
