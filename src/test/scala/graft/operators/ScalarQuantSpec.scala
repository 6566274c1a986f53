package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-dim SQ8: hand-computed ranges/levels, reconstruction-error bound,
  * degenerate dimensions, and search agreement with exact brute force.
  */
class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq(0.0f, 10.0f, 5.0f)),
    (2L, Seq(1.0f, 10.0f, 7.0f)),
    (3L, Seq(2.0f, 10.0f, 9.0f))).toDF("vec_id", "embedding")

  test("trainRanges finds per-dim min/max; degenerate dims stay (x, x)") {
    val r = ScalarQuant.trainRanges(corpus, "embedding")
    assert(r.toSeq == Seq((0.0, 2.0), (10.0, 10.0), (5.0, 9.0)))
  }

  test("encode levels match floor(x+0.5); degenerate dim stores 0") {
    val r = ScalarQuant.trainRanges(corpus, "embedding")
    val codes = ScalarQuant.encode(corpus, "vec_id", "embedding", r)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    // dim0 spans [0,2]: x=1 → floor(1/2*255+0.5) = floor(128.0) = 128
    assert(codes(0) == Seq(0, 0, 0))
    assert(codes(1) == Seq(128, 0, math.floor(2.0 / 4 * 255 + 0.5).toInt))
    assert(codes(2) == Seq(255, 0, 255))
  }

  test("reconstruction error is bounded by half a level per dimension") {
    val r = ScalarQuant.trainRanges(corpus, "embedding")
    val enc = ScalarQuant.encode(corpus, "vec_id", "embedding", r)
    val deq = enc.select(col("vec_id"),
      ScalarQuant.decodeExpr(col("codes"), r).as("dv"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val orig = corpus.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble))
    orig.indices.foreach { v =>
      r.indices.foreach { d =>
        val half = (r(d)._2 - r(d)._1) / 255 / 2 + 1e-9
        assert(math.abs(deq(v)(d) - orig(v)(d)) <= half,
          s"vec $v dim $d: ${deq(v)(d)} vs ${orig(v)(d)}")
      }
    }
  }

  test("encoding out-of-range values against a persisted model saturates") {
    // the serving flow: ranges trained on one shard, a NEW shard has
    // values outside [lo, hi] — levels must clamp to [0, 255] (faiss SQ8
    // saturates), never go negative or overflow one byte
    val r = ScalarQuant.trainRanges(corpus, "embedding")
    val shard = Seq(
      (9L, Seq(-5.0f, 12.0f, 100.0f)),
      (10L, Seq(99.0f, 3.0f, -1.0f))).toDF("vec_id", "embedding")
    val codes = ScalarQuant.encode(shard, "vec_id", "embedding", r)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    assert(codes(0) == Seq(0, 0, 255), codes(0))
    assert(codes(1) == Seq(255, 0, 0), codes(1))
    codes.flatten.foreach(c => assert(c >= 0 && c <= 255))
  }

  test("asymmetric search agrees with exact brute force on separated data") {
    // three well-separated directions — quantization noise cannot flip
    // the neighbor ordering
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)), (4L, Seq(0.0f, 0.9f, 0.1f)),
      (5L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id").isin(1L, 3L))
    val sq = ScalarQuant.bruteForceSqTopK(vecs, qs, "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Ann.bruteForceTopK(vecs, qs, "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(sq == exact)
  }
}
