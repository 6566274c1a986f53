package graft

import org.apache.spark.sql.functions._

/** ScaleGen must preserve the invariants SCALING.md's methodology leans on:
  * linear row fan-out, PK uniqueness and FK closure across replicas,
  * shape-preserving text transform (bijective on words, length-preserving)
  * and orthogonal embedding transform (norm/cosine-preserving within a
  * replica, disjoint across replicas).
  */
class ScaleGenSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen").toString
    ScaleGen.generate(spark, src, dir, 3)
    dir
  }

  test("row counts fan out exactly replicas x (dims fixed)") {
    for ((t, mult) <- Seq("region" -> 1, "nation" -> 1, "customer" -> 3,
        "orders" -> 3, "lineitem" -> 3, "events" -> 3, "documents" -> 3,
        "embeddings" -> 3)) {
      val n0 = spark.read.parquet(s"$src/$t.parquet").count()
      val n1 = spark.read.parquet(s"$out/$t.parquet").count()
      assert(n1 == n0 * mult, s"$t: $n0 -> $n1 (expected x$mult)")
    }
  }

  test("primary keys stay unique and foreign keys stay closed") {
    val orders = spark.read.parquet(s"$out/orders.parquet")
    val lineitem = spark.read.parquet(s"$out/lineitem.parquet")
    val customer = spark.read.parquet(s"$out/customer.parquet")
    assert(orders.select("o_orderkey").distinct.count() == orders.count())
    assert(customer.select("c_custkey").distinct.count() == customer.count())
    // FK closure: every lineitem order and every order customer resolves
    assert(lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"),
      "left_anti").isEmpty)
    assert(orders.join(customer, orders("o_custkey") === customer("c_custkey"),
      "left_anti").isEmpty)
  }

  test("caesar text transform preserves lengths; replicas share no shingles") {
    val d0 = spark.read.parquet(s"$src/documents.parquet")
    val d1 = spark.read.parquet(s"$out/documents.parquet")
    // length multiset preserved per replica: total chars is 3x the source
    val chars0 = d0.agg(sum(length(col("text")))).head().getLong(0)
    val chars1 = d1.agg(sum(length(col("text")))).head().getLong(0)
    assert(chars1 == chars0 * 3)
    // replica 0 is byte-identical to the source
    val docStride = d0.agg(max("doc_id")).head().getLong(0) + 1
    val r0 = d1.filter(col("doc_id") < docStride)
    assert(r0.exceptAll(d0).isEmpty && d0.exceptAll(r0).isEmpty)
    // cross-replica: word sets of replica 0 and replica 1 are disjoint
    // (caesar shift-1 moves every letter), so shingle joins cannot pair
    // rows across replicas
    def words(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("[a-z]")).distinct()
    val w0 = words(r0)
    val w1 = words(d1.filter(col("doc_id") >= docStride && col("doc_id") < docStride * 2))
    assert(w0.join(w1, "w").isEmpty)
  }

  test("embedding transform is orthogonal: norms preserved bit-for-bit shape") {
    val e0 = spark.read.parquet(s"$src/embeddings.parquet")
    val e1 = spark.read.parquet(s"$out/embeddings.parquet")
    def norms(df: org.apache.spark.sql.DataFrame) = df.select(
      aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2"))
      .agg(sum("n2")).head().getDouble(0)
    val n0 = norms(e0)
    val n1 = norms(e1)
    // permutation + sign flips preserve each norm exactly (float ops are
    // reordered only across elements of a sum here, so allow 1e-6 rel tol)
    assert(math.abs(n1 - n0 * 3) / (n0 * 3) < 1e-6, s"$n0 vs $n1")
    // replica 0 identical to source
    val vecStride = e0.agg(max("vec_id")).head().getLong(0) + 1
    val r0 = e1.filter(col("vec_id") < vecStride).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
    val s0 = e0.orderBy("vec_id").select("vec_id", "embedding").collect()
    assert(r0.sameElements(s0))
  }
}
