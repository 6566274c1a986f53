package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 derivation: fold a keyed snapshot /
  * change history into validity intervals.
  *
  * Input: one row per (key, version) observation of the tracked state —
  * full snapshots, change feeds, or a mix (an observation equal to the
  * key's previous state is a no-op and is suppressed). (key, version) must
  * be unique; version is any orderable column (batch id, commit version,
  * event time).
  *
  * Output: the change rows only, each with `valid_from` (its version),
  * `valid_to` (the key's next change version, null for the open interval)
  * and `is_current`.
  *
  * Scale shape: ONE hash shuffle on the key. Both window passes (change
  * detection, then interval close-off) share the same partitioning and
  * ordering, and the filter between them preserves both, so Catalyst
  * plans a single Exchange + Sort and reuses it — at 100 TB the cost is
  * the one shuffle of the history, same as any groupBy(key). No driver
  * state, no collect.
  */
object Scd2 {

  /** @param trackedCols the state columns whose change opens a new
    *                    interval; compared null-safely as a struct.
    */
  def fold(
      history: DataFrame,
      keyCol: String,
      versionCol: String,
      trackedCols: Seq[String]): DataFrame = {
    require(trackedCols.nonEmpty, "trackedCols must not be empty")
    val state: Column = struct(trackedCols.map(col): _*)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(versionCol))
    history
      .withColumn("__prev_state", lag(state, 1).over(byKey))
      // first observation: lag is null and <=> is false against a
      // non-null struct, so the row is kept (a struct value is never
      // null itself even if every field is)
      .filter(!(col("__prev_state") <=> state))
      .drop("__prev_state")
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
