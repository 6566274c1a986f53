package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("seg", StringType),
    StructField("ver", LongType)))

  private def fold(rows: Seq[Row]) =
    Scd2.fold(frame(schema, rows), "k", "ver", Seq("seg"))
      .select("k", "seg", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(4)))
      .toSet

  test("folds changes into intervals, suppresses no-op re-observations") {
    val out = fold(Seq(
      Row(1, "A", 0L), Row(1, "A", 1L), Row(1, "B", 2L),
      Row(2, "X", 0L)))
    assert(out === Set(
      (1, "A", 0L, 2L, false), // v1 no-op suppressed; interval closes at v2
      (1, "B", 2L, -1L, true),
      (2, "X", 0L, -1L, true)))
  }

  test("null state participates null-safely in change detection") {
    val out = fold(Seq(
      Row(3, null, 0L), Row(3, null, 1L), // null -> null is a no-op
      Row(3, "C", 2L), Row(3, null, 3L))) // null -> C -> null both change
    assert(out === Set(
      (3, null, 0L, 2L, false),
      (3, "C", 2L, 3L, false),
      (3, null, 3L, -1L, true)))
  }

  test("plans exactly one shuffle (both windows share the key exchange)") {
    val df = frame(schema, Seq(Row(1, "A", 0L), Row(1, "B", 1L)))
    val plan = Scd2.fold(df, "k", "ver", Seq("seg"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllMatchIn(plan).size === 1, plan)
  }
}
