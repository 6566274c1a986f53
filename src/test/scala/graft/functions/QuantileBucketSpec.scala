package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.expressions.QuantileBucket

class QuantileBucketSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("v", DoubleType)))

  private def bucketCol(bs: Seq[Double]) =
    org.apache.spark.sql.GraftColumnBridge.column(
      QuantileBucket(
        org.apache.spark.sql.GraftColumnBridge.expression(col("v")),
        bs.toArray))

  /** The previous declarative formulation — kept as the executable spec. */
  private def hofCol(bs: Seq[Double]) =
    size(filter(typedLit(bs), q => col("v") >= q)).cast("long")

  test("matches the HOF count formulation, incl. duplicate boundaries") {
    val bs = Seq(1.0, 2.0, 2.0, 2.0, 5.0, 7.5) // skew-collapsed quantiles
    val vs = Seq(0.0, 1.0, 1.5, 2.0, 2.1, 5.0, 7.5, 100.0, -3.2)
    val df = frame(schema, vs.map(v => Row(Double.box(v))))
    val got = df.select(bucketCol(bs).as("n"), hofCol(bs).as("h")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // and pin the absolute values: upper bound = #boundaries <= v
    val byV = df.select(col("v"), bucketCol(bs)).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byV(0.0) === 0L && byV(1.0) === 1L && byV(2.0) === 4L &&
      byV(5.0) === 5L && byV(7.5) === 6L && byV(100.0) === 6L)
  }

  test("null propagates (call sites map it to bucket 0 themselves)") {
    val df = frame(schema, Seq(Row(null), Row(Double.box(3.0))))
    val got = df.select(
      when(col("v").isNull, lit(0L)).otherwise(bucketCol(Seq(1.0, 5.0))).as("b"))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(0L, 1L))
  }

  test("stays codegen-compiled") {
    val df = frame(schema, Seq(Row(Double.box(1.0))))
      .select(bucketCol(Seq(1.0)).as("b"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
