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

  // ---- editDistancePairs block guard -------------------------------------

  /** One hot (en, web) block of 12 docs + a cold (de, web) block of 2 —
    * the exact shape the guard exists for: at scale the hot block is most
    * of the corpus and the within-block join goes quadratic in it.
    */
  private val blockedDocsSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("text", StringType, nullable = true)))

  private val blockedDocs = frame(blockedDocsSchema,
    (1L to 12L).map(i => Row(i, "en", "web", s"shared hot block doc $i")) ++
      Seq(Row(100L, "de", "web", "kalte kopie eins"),
        Row(101L, "de", "web", "kalte kopie zwei")))

  test("editDistancePairs fails fast on a hot block, naming it and the fix") {
    val e = intercept[IllegalArgumentException] {
      TextDedup.editDistancePairs(blockedDocs, "id", "text", maxDist = 5,
        blockCols = Seq("lang", "source"), maxBlockRows = 10L)
    }
    assert(e.getMessage.contains("lang=en")) // the offender is named
    assert(e.getMessage.contains("minHashLshPairs")) // and the alternative
    // under the default cap the same data plans and pairs correctly:
    // every hot-block prefix differs only in its trailing counter
    val pairs = TextDedup.editDistancePairs(blockedDocs, "id", "text",
      maxDist = 5, blockCols = Seq("lang", "source"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length === 12 * 11 / 2 + 1) // hot-block pairs + the cold pair
    assert(pairs.forall { case (a, b, d) => a < b && d <= 5 })
  }

  test("editDistancePairs matches a driver-side Levenshtein oracle") {
    val rows = blockedDocs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val expected = (for {
      (ia, la, sa, ta) <- rows
      (ib, lb, sb, tb) <- rows
      if ia < ib && la == lb && sa == sb
      d = lev(ta.toLowerCase.take(30), tb.toLowerCase.take(30))
      if d <= 5
    } yield (ia, ib, d)).toSet
    val got = TextDedup.editDistancePairs(blockedDocs, "id", "text",
      maxDist = 5, blockCols = Seq("lang", "source"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
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
