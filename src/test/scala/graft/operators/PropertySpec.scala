package graft.operators

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.schemas.Schemas
import graft.sources.ParquetTable

/** Property tests over ScalaCheck-generated order batches (seeded, so runs
  * are reproducible) — strictly stronger than the reference's count-only
  * unit tests (SURVEY §5).
  */
class PropertySpec extends SparkSpec {

  private val ts = Timestamp.valueOf("2025-04-01 10:00:00")
  private val day = Date.valueOf("2025-04-01")

  private val orderGen: Gen[Row] = for {
    num <- Gen.choose(1, 500)
    id <- Gen.option(Gen.choose(1, 80)) // duplicates + nulls likely
    user <- Gen.option(Gen.choose(1, 20))
    t <- Gen.oneOf(Seq(ts, null))
    amount <- Gen.oneOf(Gen.choose(-50.0, 200.0).map(Double.box), Gen.const(null))
  } yield Row(num, id.map(Int.box).orNull, user.map(Int.box).orNull, t, amount, day)

  private def batches(n: Int): Seq[List[Row]] =
    (1 to n).map(i => Gen.listOfN(60, orderGen)
      .apply(Gen.Parameters.default, Seed(i.toLong * 7919))
      .getOrElse(sys.error("gen failed")))

  test("property: valid ∪ rejected partitions every generated batch") {
    batches(5).foreach { rows =>
      val df = frame(Schemas.orders, rows)
      val r = Validator.split(df, Schemas.ordersSpec)
      assert(r.valid.count() + r.rejected.count() === rows.length.toLong)
      // and no valid row violates any rule
      val bad = r.valid.filter(
        col("order_id").isNull || col("user_id").isNull
          || col("order_timestamp").isNull
          || (col("total_amount").isNotNull && col("total_amount") <= 0)).count()
      assert(bad === 0L)
    }
  }

  test("property: post-merge table has unique PKs and merge is idempotent") {
    batches(3).foreach { rows =>
      val df = frame(Schemas.orders, rows)
      val valid = Validator.split(df, Schemas.ordersSpec).valid
      val path = tmpDir("prop-merge") + "/t"
      ParquetTable.merge(spark, path, valid, Seq("order_id"))
      val after1 = ParquetTable.read(spark, path)
      val n1 = after1.count()
      assert(after1.select("order_id").distinct().count() === n1)
      ParquetTable.merge(spark, path, valid, Seq("order_id")) // replay
      assert(ParquetTable.read(spark, path).count() === n1)
    }
  }
}
