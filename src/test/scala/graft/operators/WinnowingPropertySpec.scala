package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck properties for the winnowing guarantee (Schleimer et al.
  * 2003, theorem 1): any two documents sharing a token run of length
  * ≥ w + k − 1 share at least one selected fingerprint — over seeded
  * random corpora, arbitrary shared-run placement, and random noise
  * tokens on both sides.
  */
class WinnowingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val W = 4

  private def wordGen(alpha: Seq[String]): Gen[String] = Gen.oneOf(alpha)

  private def docGen(alpha: Seq[String], n: Int): Gen[List[String]] =
    Gen.listOfN(n, wordGen(alpha))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen"))

  test("property: a shared run of w+k-1 tokens always yields a shared fp") {
    // distinct vocabularies for noise (per side) and the shared run, so
    // the ONLY common structure is the planted run
    val runAlpha = ('a' to 'j').map("run" + _)
    val noiseA = ('a' to 'j').map("na" + _)
    val noiseB = ('a' to 'j').map("nb" + _)
    (1 to 12).foreach { i =>
      val runLen = W + K - 1 + sample(Gen.choose(0, 4), i * 31L)
      val run = sample(docGen(runAlpha, runLen), i * 131L)
      val preA = sample(docGen(noiseA, sample(Gen.choose(0, 8), i * 7L)), i * 17L)
      val sufA = sample(docGen(noiseA, sample(Gen.choose(0, 8), i * 11L)), i * 19L)
      val preB = sample(docGen(noiseB, sample(Gen.choose(0, 8), i * 13L)), i * 23L)
      val sufB = sample(docGen(noiseB, sample(Gen.choose(0, 8), i * 29L)), i * 37L)
      val d = Seq(
        (1L, (preA ++ run ++ sufA).mkString(" ")),
        (2L, (preB ++ run ++ sufB).mkString(" "))).toDF("id", "text")
      val pairs = TextDedup.winnowingPairs(d, "id", "text", K, W, minShared = 1)
        .collect()
      assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
        s"seed $i: run of $runLen tokens produced no shared fingerprint")
    }
  }

  test("property: disjoint-vocabulary documents never pair") {
    (1 to 8).foreach { i =>
      val a = sample(docGen(('a' to 'j').map("xa" + _), 30), i * 41L)
      val b = sample(docGen(('a' to 'j').map("xb" + _), 30), i * 43L)
      val d = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
        .toDF("id", "text")
      assert(TextDedup.winnowingPairs(d, "id", "text", K, W, minShared = 1)
        .count() == 0, s"seed $i: disjoint docs paired")
    }
  }

  test("property: sketch size stays a fraction of the gram count") {
    // winnowing selects ~2/(w+1) of positions in expectation; assert the
    // loose upper bound |fps| ≤ |grams| − w + 1 (one per window) and a
    // sanity lower bound of one per run of w windows
    (1 to 6).foreach { i =>
      val doc = sample(docGen(('a' to 'z').map("t" + _), 120), i * 53L)
      val fps = Seq((1L, doc.mkString(" "))).toDF("id", "text")
        .select(TextDedup.winnowingFingerprints(col("text"), K, W))
        .collect()(0).getSeq[Long](0)
      val nGrams = doc.length - K + 1
      assert(fps.length <= nGrams - W + 1)
      assert(fps.length >= (nGrams - W + 1) / W,
        s"seed $i: sketch suspiciously small (${fps.length} of $nGrams grams)")
    }
  }
}
