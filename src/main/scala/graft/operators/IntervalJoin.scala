package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-to-large INTERVAL OVERLAP join — the range-join shape Spark's
  * planner turns into a broadcast nested loop (fine for one tiny side,
  * fatal when both sides are big; a 100 TB event table self-joined on
  * overlap would be a cartesian scan). The classic fix, public in every
  * range-join design (Databricks range-join hints, PostGIS, interval
  * trees flattened to grids): quantize time into fixed `cellSize` cells,
  * replicate each interval into the cells it spans, equi-join on the
  * cell, then verify true overlap. The equi-join shuffles BOTH sides by
  * cell hash — a normal shuffle join that partitions, scales out, and
  * AQE-skew-splits like any other, instead of a nested loop.
  *
  * A pair overlapping across k shared cells would surface k times; the
  * usual `distinct()` dedup re-shuffles the full output, so instead each
  * pair survives from EXACTLY ONE cell — the cell holding the overlap's
  * START `max(lStart, rStart)` (that cell is always among the shared
  * ones) — a plain filter, no extra exchange.
  *
  * Cost model: replication factor = interval length / cellSize (guarded
  * by `maxCells` with a fail-fast raise_error, not a silent cap — pick
  * cellSize ≈ a typical interval length). Candidate pairs per cell ≈
  * (arrivals in cell)², bounded by time-locality; a hot cell is a skewed
  * join key that AQE splits.
  *
  * Semantics: half-open [start, end) on both sides — touching endpoints
  * (lEnd == rStart) do NOT overlap; empty or inverted intervals
  * (end <= start) match nothing and are dropped (mathematically correct
  * for [s, e) = ∅, not a cap). Bounds must be integral (cast timestamps
  * to epoch seconds first).
  */
object IntervalJoin {

  /** Overlapping (left, right) pairs. Output columns = left's ++ right's
    * (names must be disjoint). One shuffle per side, keyed by grid cell —
    * or by (equi-keys, cell) when `keys` is given (the per-user /
    * per-entity overlap join: `keys = Seq(("l_user", "r_user"))` joins
    * only same-key intervals, and the composite shuffle key spreads hot
    * time windows across as many partitions as there are active keys).
    *
    * @param cellSize grid cell width in the bounds' units (> 0)
    * @param maxCells fail-fast ceiling on cells ONE interval may span —
    *                 execution raises naming the interval, never truncates
    * @param keys     additional equi-join pairs (leftCol, rightCol)
    */
  def overlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      cellSize: Long, maxCells: Int = 256,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(cellSize > 0, s"interval_join: cellSize $cellSize must be > 0")
    require(maxCells > 0, s"interval_join: maxCells $maxCells must be > 0")
    val dup = left.columns.map(_.toLowerCase).toSet
      .intersect(right.columns.map(_.toLowerCase).toSet)
    require(dup.isEmpty,
      s"interval_join: column name(s) ${dup.mkString(", ")} appear on both " +
        "sides — rename before joining (output carries both schemas)")

    def withCells(df: DataFrame, s: String, e: String, cell: String): DataFrame = {
      val a = floor(col(s).cast("long") / cellSize).cast("long")
      // half-open: the last occupied cell holds end - 1
      val b = floor((col(e).cast("long") - 1) / cellSize).cast("long")
      val cells = when(b - a < lit(maxCells.toLong), sequence(a, b))
        .otherwise(raise_error(format_string(
          s"interval_join: interval [%s, %s) spans more than $maxCells " +
            s"cells of $cellSize — raise cellSize (or maxCells to accept " +
            "the replication cost)",
          col(s).cast("string"), col(e).cast("string"))).cast("array<long>"))
      df.filter(col(e).cast("long") > col(s).cast("long"))
        .withColumn(cell, explode(cells))
    }

    keys.foreach { case (l, r) =>
      require(left.columns.exists(_.equalsIgnoreCase(l)),
        s"interval_join: key column $l not on the left side")
      require(right.columns.exists(_.equalsIgnoreCase(r)),
        s"interval_join: key column $r not on the right side")
    }
    val lc = withCells(left, lStart, lEnd, "__lcell")
    val rc = withCells(right, rStart, rEnd, "__rcell")
    val overlapStart: Column =
      greatest(col(lStart).cast("long"), col(rStart).cast("long"))
    val cond = keys.foldLeft(
        col("__lcell") === col("__rcell") &&
          col(lStart).cast("long") < col(rEnd).cast("long") &&
          col(rStart).cast("long") < col(lEnd).cast("long") &&
          // exactly-once: only the cell containing the overlap's start emits
          floor(overlapStart / cellSize).cast("long") === col("__lcell")) {
      case (c, (l, r)) => c && col(l) === col(r)
    }
    lc.join(rc, cond).drop("__lcell", "__rcell")
  }
}
