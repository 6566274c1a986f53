package graft.operators

import graft.SparkSpec

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private def frameOf(rows: (Long, Long, Int)*) =
    rows.toDF("q", "d", "r")

  test("matches the hand-computed RRF formula; cross-list docs outrank") {
    val a = frameOf((1L, 10L, 1), (1L, 11L, 2))
    val b = frameOf((1L, 11L, 1), (1L, 12L, 2))
    val out = RankFusion.rrf(Seq(a, b), "q", "d", "r", c = 60, k = 10)
      .orderBy("rank").as[(Long, Int, Long, Double, Long)].collect().toSeq
    // doc 11: 1/62 + 1/61; doc 10: 1/61; doc 12: 1/62
    assert(out.map(_._3) == Seq(11L, 10L, 12L))
    assert(math.abs(out(0)._4 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(out(0)._5 == 2L && out(1)._5 == 1L)
  }

  test("exact ties break by doc id deterministically") {
    val a = frameOf((1L, 30L, 1), (1L, 20L, 2), (1L, 40L, 2))
    // 20 and 40 tie exactly at 1/62
    val out = RankFusion.rrf(Seq(a), "q", "d", "r")
      .orderBy("rank").as[(Long, Int, Long, Double, Long)].collect()
    assert(out.map(_._3).toSeq == Seq(30L, 20L, 40L))
  }

  test("queries fuse independently and k bounds each") {
    val a = frameOf((1L, 10L, 1), (2L, 20L, 1), (2L, 21L, 2))
    val out = RankFusion.rrf(Seq(a), "q", "d", "r", k = 1)
      .as[(Long, Int, Long, Double, Long)].collect()
    assert(out.map(x => x._1 -> x._3).toSet == Set(1L -> 10L, 2L -> 20L))
  }
}
