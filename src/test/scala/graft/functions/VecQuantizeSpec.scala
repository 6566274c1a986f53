package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.VectorFunctions.quantizeInt8

class VecQuantizeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("v", ArrayType(FloatType))))

  private def one(vec: Seq[Float]): (Double, Seq[Int], Double) = {
    val r = frame(schema, Seq(Row(1, vec)))
      .select(quantizeInt8(col("v")).as("q"))
      .head().getStruct(0)
    (r.getDouble(0), r.getSeq[Int](1), r.getDouble(2))
  }

  test("known vector: scale, codes, and the extreme values hit ±127") {
    val (scale, codes, err) = one(Seq(1.0f, -2.54f, 0.0f, 2.54f))
    assert(scale === 2.54f.toDouble / 127) // = 0.02f-ish exactly maxabs/127
    assert(codes(3) === 127 && codes(1) === -127 && codes(2) === 0)
    assert(codes(0) === math.floor(1.0f.toDouble / scale + 0.5).toInt)
    assert(err <= scale / 2 + 1e-12)
  }

  test("reconstruction bound holds for every element") {
    val vec = Seq(0.31f, -0.77f, 0.002f, 0.5f, -0.123f, 0.9f)
    val (scale, codes, err) = one(vec)
    val worst = vec.zip(codes)
      .map { case (v, q) => math.abs(v.toDouble - q * scale) }.max
    assert(err === worst)
    assert(err <= scale / 2 + 1e-12)
  }

  test("all-zero and empty vectors quantize to scale 0 without dividing") {
    assert(one(Seq(0.0f, 0.0f)) === ((0.0, Seq(0, 0), 0.0)))
    assert(one(Seq.empty[Float]) === ((0.0, Seq.empty[Int], 0.0)))
  }

  test("matches the declarative HOF replay (the oracle's formulation)") {
    val data = (1 to 50).map { i =>
      Row(i, (0 until 16).map(j =>
        ((i * 31 + j * 17) % 101 - 50) / 7.0f))
    }
    val df = frame(schema, data)
    val hofScale = array_max(transform(col("v"),
      x => abs(x.cast("double")))) / 127.0
    val hofCodes = when(hofScale === 0,
        transform(col("v"), _ => lit(0)))
      .otherwise(transform(col("v"), x =>
        greatest(lit(-127.0), least(lit(127.0),
          floor(x.cast("double") / hofScale + 0.5))).cast("int")))
    val rows = df.select(quantizeInt8(col("v")).as("q"),
      hofScale.as("hs"), hofCodes.as("hc")).collect()
    rows.foreach { r =>
      val q = r.getStruct(0)
      assert(q.getDouble(0) === r.getDouble(1))
      assert(q.getSeq[Int](1) === r.getSeq[Int](2))
    }
  }

  test("stays codegen-compiled") {
    val plan = frame(schema, Seq(Row(1, Seq(1.0f))))
      .select(quantizeInt8(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
