package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared fail-fast guard for the exact within-block pair operators
  * (`Ann.cosineNearDupPairs`, `TextDedup.editDistancePairs`): a self-join
  * inside a block does ~n²/2 comparisons, so one hot block at 100× scale
  * silently becomes the whole job. Before building the quadratic plan,
  * run one cheap LINEAR count-by-block job and refuse — naming the
  * offending block and the sub-quadratic alternative — when any block
  * exceeds `maxBlockRows`. Raising the cap is the explicit opt-in to the
  * quadratic cost.
  */
private[operators] object BlockGuard {

  /** Throws IllegalArgumentException when the largest block in `df`
    * (grouped by `blockCols`; the whole frame when empty) exceeds
    * `maxBlockRows`. `Long.MaxValue` disables the probe entirely.
    */
  def check(
      op: String,
      df: DataFrame,
      blockCols: Seq[String],
      maxBlockRows: Long,
      alternative: String): Unit = {
    if (maxBlockRows == Long.MaxValue) return
    val sized =
      if (blockCols.isEmpty) df.groupBy(lit(1)).agg(count(lit(1)).as("__n"))
      else df.groupBy(blockCols.map(col): _*).agg(count(lit(1)).as("__n"))
    val worst = sized.orderBy(col("__n").desc).limit(1).collect()
    if (worst.nonEmpty) {
      val row = worst.head
      val n = row.getLong(row.length - 1)
      if (n > maxBlockRows) {
        val where =
          if (blockCols.isEmpty) "the (unblocked) input"
          else blockCols.zipWithIndex
            .map { case (c, i) => s"$c=${row.get(i)}" }.mkString("block (", ", ", ")")
        throw new IllegalArgumentException(
          s"$op: largest $where has $n rows (> $maxBlockRows); the " +
            "within-block join would do ~n² comparisons. Use finer " +
            s"blockCols or $alternative, or raise maxBlockRows to accept " +
            "the cost.")
      }
    }
  }
}
