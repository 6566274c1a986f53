package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.queries.Tables

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val tau = 0.3

  // iterated k-means (the path q86's maxIter=0 oracle does NOT cover)
  private lazy val corpus = Tables.embeddings(spark, sf)
  private lazy val kept = SemDedup.dedup(corpus, "vec_id", "embedding",
    nCentroids = 4, tau = tau, maxIter = 3)

  private lazy val assigned = IvfAnn.build(corpus, "vec_id", "embedding",
    nCentroids = 4, maxIter = 3).assigned

  test("kept set has no same-cell pair at or above tau") {
    val k = assigned.join(kept.select("vec_id"), Seq("vec_id"))
    val a = k.select(col("centroid_id"), col("vec_id").as("ia"), col("embedding").as("va"))
    val b = k.select(col("centroid_id"), col("vec_id").as("ib"), col("embedding").as("vb"))
    val close = a.join(b, Seq("centroid_id"))
      .filter(col("ia") < col("ib") &&
        VectorFunctions.cosine(col("va"), col("vb")) >= tau)
    assert(close.isEmpty)
  }

  test("every dropped vector has a smaller-id same-cell witness at tau") {
    val dropped = assigned.join(kept.select("vec_id"), Seq("vec_id"), "left_anti")
    assert(dropped.count() > 0, "fixture should actually drop something")
    val a = assigned.select(col("centroid_id"), col("vec_id").as("ia"), col("embedding").as("va"))
    val d = dropped.select(col("centroid_id"), col("vec_id").as("ib"), col("embedding").as("vb"))
    val witnessed = d.join(a, Seq("centroid_id"))
      .filter(col("ia") < col("ib") &&
        VectorFunctions.cosine(col("va"), col("vb")) >= tau)
      .select("ib").distinct()
    assert(witnessed.count() == dropped.count())
  }

  test("kept + dropped partition the corpus; result is deterministic") {
    val again = SemDedup.dedup(corpus, "vec_id", "embedding",
      nCentroids = 4, tau = tau, maxIter = 3)
    assert(kept.count() + // dropped
      corpus.join(kept.select("vec_id"), Seq("vec_id"), "left_anti").count() ==
      corpus.count())
    assert(kept.select("vec_id").exceptAll(again.select("vec_id")).isEmpty)
  }

  test("BlockGuard fails fast naming the hot cell before the quadratic join") {
    val e = intercept[IllegalArgumentException] {
      SemDedup.dedup(corpus, "vec_id", "embedding",
        nCentroids = 2, tau = tau, maxIter = 0, maxCellRows = 5L)
    }
    assert(e.getMessage.contains("SemDedup") && e.getMessage.contains("centroid_id"))
  }
}
