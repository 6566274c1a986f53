package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling (the deequ/Glue-crawler "column statistics"
  * shape): for every requested column — row count, null count, distinct
  * count, min and max (as strings, so heterogeneous columns stack into one
  * long frame).
  *
  * Single aggregation job: all per-column statistics are computed in ONE
  * `df.agg(...)` pass (map-side partials, one 1-row result), then pivoted
  * to a row-per-column frame with `explode(array(struct...))` — plan-side
  * only, no driver loop over columns and no per-column scan.
  *
  * Distinct counts are two tiers, the q44/q59 discipline:
  *   - exact (default here, oracle-checked): Spark plans N distinct
  *     aggregates via Expand — the input is replicated N+1 ways before the
  *     shuffle. Fine for a profile at bench scale, quadratic-ish pressure
  *     at 100 TB with many columns;
  *   - `approxDistinct = true` — the 100 TB tier: HyperLogLog++ sketches,
  *     no Expand, one narrow pass regardless of column count; error bound
  *     pinned by ProfileSpec against the exact tier.
  */
object Profile {

  def profile(
      df: DataFrame,
      cols: Seq[String],
      approxDistinct: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def nd(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c), rsd)
      else count_distinct(col(c))
    val perCol: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), perCol: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }
    wide
      .select(explode(array(stacked: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
  }
}
