package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class EmbedNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("standardized dimensions have mean 0 and std 1") {
    val z = EmbedNormalize.standardize(emb, "vec_id", "embedding")
    val stats = EmbedNormalize.dimStats(z, "zvec").collect()
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-9, s"dim ${r.getInt(0)} mean")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"dim ${r.getInt(0)} std")
    }
  }

  test("z-transform is affine per dimension: within-dim ordering preserved") {
    val z = EmbedNormalize.standardize(emb, "vec_id", "embedding")
      .join(emb, "vec_id")
      .select(col("embedding").cast("array<double>").as("xv"), col("zvec"))
    val bad = z.select(posexplode(arrays_zip(col("xv"), col("zvec"))).as(Seq("pos", "p")))
      .select(col("pos"), col("p.xv").as("x"), col("p.zvec").as("zz"))
      .groupBy("pos")
      .agg(corr(col("x"), col("zz")).as("c"))
      .filter(col("c") < 0.999999)
    assert(bad.isEmpty)
  }

  test("constant dimension is guarded by eps, not a division by zero") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val z = EmbedNormalize.standardize(df, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Seq[Double])].collect()
    assert(z.forall(_._2.forall(v => !v.isNaN && !v.isInfinite)))
    assert(z(0)._2(0) == 0.0 && z(1)._2(0) == 0.0) // constant dim → centered 0
  }

  test("apply pass is map-only: no exchange in the standardize plan") {
    // plain read (Tables.embeddings adds a fan-out repartition on the
    // single-file testdata, which is input-side, not the operator's)
    val plain = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = EmbedNormalize.standardize(plain, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
