package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Scale guardrails on the two exact-pairs operators: the n-gram df-cap
  * (stop-gram posting lists) and the cosine block-size guard, plus the
  * LSH-bucketed alternative the guard points at.
  */
class GuardrailSpec extends SparkSpec {

  // ---- ngramJaccardPairs maxGramDf ---------------------------------------

  private val docSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** Every doc shares the planted stop-phrase "data pipeline"; only 1↔2
    * also share rare grams. 2-gram sets:
    * doc1 {alpha beta, beta gamma, gamma delta, delta data, data pipeline}
    * doc2 {alpha beta, beta gamma, gamma epsilon, epsilon data, data pipeline}
    * unfiltered j(1,2) = 3/7; with "data pipeline" (df=6) dropped: 2/6.
    */
  private val stopGramCorpus = frame(docSchema, Seq(
    Row(1L, "alpha beta gamma delta data pipeline"),
    Row(2L, "alpha beta gamma epsilon data pipeline"),
    Row(3L, "uniquethree wordsthree data pipeline"),
    Row(4L, "uniquefour wordsfour data pipeline"),
    Row(5L, "uniquefive wordsfive data pipeline"),
    Row(6L, "uniquesix wordssix data pipeline")))

  test("df-cap eliminates stop-gram candidate pairs entirely") {
    def pairsAtZero(cap: Option[Long]) =
      TextDedup.ngramJaccardPairs(stopGramCorpus, "id", "text",
        n = 2, threshold = 0.0, blockCols = Nil, maxGramDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // threshold 0 exposes the raw candidate set: the stop-gram joins
    // every doc to every other (all 15 pairs) without the cap …
    assert(pairsAtZero(None).size === 15)
    // … and exactly the one genuinely-related pair with it — the join
    // never materializes the quadratic stop-gram posting list
    assert(pairsAtZero(Some(3L)) === Set((1L, 2L)))
  }

  test("df-cap scores are exact Jaccard over the filtered gram space") {
    val uncapped = TextDedup.ngramJaccardPairs(stopGramCorpus, "id", "text",
      n = 2, threshold = 0.4, blockCols = Nil)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(uncapped.keySet === Set((1L, 2L)))
    assert(uncapped((1L, 2L)) === math.rint(3.0 / 7.0 * 1e4) / 1e4)

    val capped = TextDedup.ngramJaccardPairs(stopGramCorpus, "id", "text",
      n = 2, threshold = 0.3, blockCols = Nil, maxGramDf = Some(3L))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped.keySet === Set((1L, 2L)))
    assert(capped((1L, 2L)) === math.rint(2.0 / 6.0 * 1e4) / 1e4)
  }

  // ---- cosineNearDupPairs block guard + LSH alternative ------------------

  private val vecSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("label", StringType, nullable = true)))

  private def unit(dim: Int, seed: Int): Seq[Float] = {
    val rnd = new scala.util.Random(seed)
    val raw = Seq.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  private def jitter(v: Seq[Float], eps: Float): Seq[Float] =
    v.zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) eps else -eps) }

  private val base = unit(64, 7)
  private val vecs = frame(vecSchema,
    Row(1L, base, "x") +: Row(2L, jitter(base, 1e-3f), "x") +:
      (3L to 40L).map(i => Row(i, unit(64, i.toInt * 31), "x")))

  test("block guard fails fast on an oversized block, naming the fix") {
    val e = intercept[IllegalArgumentException] {
      Ann.cosineNearDupPairs(vecs, "id", "v", threshold = 0.9,
        blockCols = Seq("label"), maxBlockRows = 10L)
    }
    assert(e.getMessage.contains("lshNearDupPairs"))
    // same data under the default cap plans fine
    assert(Ann.cosineNearDupPairs(vecs, "id", "v", threshold = 0.9,
      blockCols = Seq("label")).count() === 1)
  }

  test("lshNearDupPairs finds the planted pair without any block column") {
    val exact = Ann.cosineNearDupPairs(vecs, "id", "v", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshNearDupPairs(vecs, "id", "v", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((1L, 2L)))
    assert(lsh === exact) // planted cosine ≈ 1 ⇒ signatures agree ⇒ found
  }
}
