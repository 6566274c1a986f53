package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The native codegen'd vector expressions must be bit-identical to the
  * HOF formulation (which itself was verified bit-identical to DuckDB's
  * list_cosine_similarity).
  */
class VecExpressionsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("b", ArrayType(FloatType, containsNull = false), nullable = true)))

  private def vecs(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(13)
    frame(schema, Seq.fill(n)(Row(
      Seq.fill(dim)(rnd.nextGaussian().toFloat),
      Seq.fill(dim)(rnd.nextGaussian().toFloat))))
  }

  test("native dot/cosine/euclidean are bit-identical to the HOF spec") {
    val df = vecs(200, 64)
    val out = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d1"),
      VectorFunctions.dotHof(col("a"), col("b")).as("d2"),
      VectorFunctions.cosine(col("a"), col("b")).as("c1"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("c2"),
      VectorFunctions.euclidean(col("a"), col("b")).as("e1"),
      VectorFunctions.euclideanHof(col("a"), col("b")).as("e2")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact, no tolerance
      assert(r.getDouble(2) === r.getDouble(3))
      assert(r.getDouble(4) === r.getDouble(5))
    }
  }

  test("SQL registration: vec_cosine usable from spark.sql") {
    GraftFunctions.register(spark)
    vecs(3, 8).createOrReplaceTempView("vec_test")
    val rows = spark.sql(
      """SELECT vec_cosine(a, b) AS c, vec_dot(a, b) AS d, vec_euclidean(a, b) AS e
        |FROM vec_test""".stripMargin).collect()
    assert(rows.length === 3)
    rows.foreach(r => assert(!r.isNullAt(0) && math.abs(r.getDouble(0)) <= 1.0))
  }

  test("null input yields null, mismatched lengths use common prefix") {
    GraftFunctions.register(spark)
    val df = frame(schema, Seq(Row(null, Seq(1.0f)), Row(Seq(1.0f, 2.0f), Seq(3.0f))))
    val out = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 3.0)
  }

  test("nearestCells matches the per-centroid-literal argmin, including ties") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val nCentroids = 64
    val dim = 16
    val centroids = Array.fill(nCentroids)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // duplicated centroid → every vector ties between ids 7 and 23; the
    // lexicographic struct(dist, id) order keeps the smaller id
    centroids(23) = centroids(7).clone()
    val df = vecs(100, dim)
    def literalRanking(k: Int) = {
      val cells = centroids.zipWithIndex.map { case (c, i) =>
        struct(
          VectorFunctions.euclidean(col("a"), array(c.map(v => lit(v)).toSeq: _*)).as("dist"),
          lit(i).as("centroid_id"))
      }
      transform(slice(array_sort(array(cells.toSeq: _*)), 1, k),
        s => s.getField("centroid_id"))
    }
    for (k <- Seq(1, 4, nCentroids)) {
      val out = df.select(
        VectorFunctions.nearestCells(col("a"), centroids, k).as("fast"),
        literalRanking(k).as("ref")).collect()
      out.foreach { r =>
        assert(r.getSeq[Int](0) === r.getSeq[Int](1), s"k=$k")
      }
    }
  }
}
