package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class AnnSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)))

  // deterministic corpus: 60 vectors in 3 tight clusters around axes
  private def corpus() = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i % 3) = 1.0f // cluster direction
      val v = base.map(x => x + rnd.nextGaussian().toFloat * 0.05f)
      Row(i.toLong, v.toSeq)
    }
    frame(schema, rows)
  }

  test("bruteForceTopK: neighbors share the query's cluster, ranked by cosine") {
    val c = corpus()
    val out = Ann.bruteForceTopK(c, c.filter("vec_id < 3"), "vec_id", "embedding", k = 5)
      .collect()
    assert(out.length === 15) // 3 queries × 5
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      // every neighbor is from the query's own cluster (cosine ≈ 1)
      rows.foreach(r => assert(r.getLong(1) % 3 === q % 3))
      // ranks ordered by non-increasing cosine
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hardNegatives: positives never rank; result == brute-force over the complement") {
    import spark.implicits._
    val c = corpus()
    val qs = c.filter("vec_id < 3")
    // positives: the query's own cluster (vec_id % 3 == query % 3) — so
    // hard negatives must all come from OTHER clusters
    val pos = qs.select(org.apache.spark.sql.functions.col("vec_id").as("qid"))
      .crossJoin(c.select(org.apache.spark.sql.functions.col("vec_id").as("nid")))
      .filter("qid % 3 = nid % 3")
    val negs = Ann.hardNegatives(c, qs, pos,
      "vec_id", "embedding", "qid", "nid", k = 4).collect()
    assert(negs.length === 12) // 3 queries × 4
    negs.foreach { r =>
      assert(r.getLong(1) % 3 !== r.getLong(0) % 3,
        s"positive ${r.getLong(1)} mined as a negative of ${r.getLong(0)}")
    }
    // equivalence: brute-force over the positives' complement
    val expected = Ann.bruteForceTopK(
      c.filter("vec_id % 3 <> 0"), qs.filter("vec_id = 0"),
      "vec_id", "embedding", k = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val got = negs.filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === expected)
  }

  test("lshTopK with multi-probe recovers most of the exact top-k") {
    val c = corpus()
    val q = c.filter("vec_id < 3")
    val exact = Ann.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(c, q, "vec_id", "embedding", k = 5,
        numPlanes = 8, dim = 8, probes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low: $approx vs $exact")
  }

  test("cosineNearDupPairs finds only same-cluster pairs at high threshold") {
    val pairs = Ann.cosineNearDupPairs(corpus(), "vec_id", "embedding",
        threshold = 0.9).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) % 3 === r.getLong(1) % 3)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("hyperplane signatures are deterministic across invocations") {
    val p1 = Ann.hyperplanes(4, 8)
    val p2 = Ann.hyperplanes(4, 8)
    assert(p1 === p2)
  }

  test("decontaminateByEmbedding drops exactly the rows near a bench vector") {
    val c = corpus()
    // bench = 2 vectors from cluster 0 → every cluster-0 corpus row is
    // contaminated at high threshold; clusters 1 and 2 survive intact
    val bench = c.filter("vec_id IN (0, 3)")
    val kept = Ann.decontaminateByEmbedding(c, bench, "embedding", 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = (0 until 60).map(_.toLong).filter(_ % 3 != 0).toSet
    assert(kept === expected)
    // schema unchanged; no helper columns leak
    assert(Ann.decontaminateByEmbedding(c, bench, "embedding", 0.95)
      .columns.toSeq === c.columns.toSeq)
  }

  test("decontaminateByEmbedding: the anti join never shuffles the corpus") {
    val c = corpus()
    val plan = Ann.decontaminateByEmbedding(
        c, c.limit(2), "embedding", 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("LeftAnti"),
      s"bench side must broadcast under the anti join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
