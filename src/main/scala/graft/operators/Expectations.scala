package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percentage-based data-quality expectations (the deequ / dbt-test /
  * Delta Live Tables "expect" shape): each rule is a row predicate plus
  * a minimum pass-rate; the report says how much of the data satisfies
  * it and whether the gate holds. This complements the two existing
  * enforcement tiers — hard CHECK `Constraints` (reject the commit) and
  * `Validator` row-splitting (quarantine the row) — with the MONITOR
  * tier: ship the batch, but measure and gate on drift.
  *
  * One aggregation pass for ALL rules (the [[Profile]] discipline):
  * every predicate becomes one conditional count in a single
  * `df.agg(...)` (map-side partials, one 1-row result), pivoted
  * plan-side to a row-per-rule frame — no per-rule scan, no driver loop.
  */
object Expectations {

  /** @param rules (name, predicate SQL over the frame's columns,
    *              minimum pass rate in [0, 1]). Null predicate results
    *              count as failures, SQL-WHERE-style.
    * @return one row per rule: (rule, n_rows, n_pass, pass_rate,
    *         min_rate, ok), in the given rule order.
    */
  def check(df: DataFrame, rules: Seq[(String, String, Double)]): DataFrame = {
    require(rules.nonEmpty, "expectations: no rules")
    rules.foreach { case (n, _, r) =>
      require(r >= 0.0 && r <= 1.0, s"expectations: $n min rate $r outside [0,1]")
    }
    val aggs = rules.zipWithIndex.map { case ((_, pred, _), i) =>
      sum(when(expr(pred), 1L).otherwise(0L)).as(s"__p_$i")
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = rules.zipWithIndex.map { case ((name, _, minRate), i) =>
      val rate = when(col("__n") === 0, lit(1.0))
        .otherwise(col(s"__p_$i").cast("double") / col("__n"))
      struct(
        lit(i + 1).as("rule_idx"),
        lit(name).as("rule"),
        col("__n").as("n_rows"),
        col(s"__p_$i").as("n_pass"),
        round(rate, 6).as("pass_rate"),
        lit(minRate).as("min_rate"),
        (rate >= minRate).as("ok"))
    }
    wide.select(explode(array(stacked: _*)).as("e")).select(
      col("e.rule_idx"), col("e.rule"), col("e.n_rows"), col("e.n_pass"),
      col("e.pass_rate"), col("e.min_rate"), col("e.ok"))
  }

  /** Hard-gate variant: returns the report if every rule holds, throws
    * naming the first broken rule otherwise (the DLT
    * `expect_or_fail` tier).
    */
  def enforce(df: DataFrame, rules: Seq[(String, String, Double)]): DataFrame = {
    val report = check(df, rules)
    val broken = report.filter(!col("ok")).collect()
    if (broken.nonEmpty) {
      val r = broken.head
      throw new IllegalStateException(
        s"expectation '${r.getString(1)}' broken: pass rate " +
          s"${r.getDouble(4)} < required ${r.getDouble(5)} " +
          s"(${r.getLong(3)}/${r.getLong(2)} rows)")
    }
    report
  }
}
