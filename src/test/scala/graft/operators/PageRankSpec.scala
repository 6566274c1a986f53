package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 20): Map[Long, Double] =
    PageRank.run(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .as[(Long, Double)].collect().toMap

  test("rank mass is conserved (sums to 1) with dangling nodes present") {
    // 3 is dangling: no out-edges
    val r = ranks(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r)
  }

  test("symmetric cycle converges to uniform ranks") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9, r))
  }

  test("a sink pointed at by everyone outranks its sources") {
    val r = ranks(Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)))
    assert(r(9L) > r(1L) && r(1L) > r(2L))
    assert(math.abs(r(2L) - r(3L)) < 1e-12) // symmetric sources tie
  }

  test("edge weights steer rank: heavier edge gets more mass") {
    val w = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0))
      .toDF("s", "d", "w")
    val r = PageRank.run(w, "s", "d", Some("w"), iterations = 20)
      .as[(Long, Double)].collect().toMap
    assert(r(2L) > r(3L), r)
  }

  test("matches the closed-form two-node solution") {
    // 1 <-> 2: uniform by symmetry at any damping
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
  }
}
