package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Differential property for the MinHash index maintenance path: for
  * RANDOM corpora split at a RANDOM point into a saved half and an
  * appended half, probing the incrementally-maintained index
  * ([[TextDedup.minHashIndexSave]] + [[TextDedup.minHashIndexAppend]])
  * must return EXACTLY what probing a one-shot index over the full
  * history returns — same pairs, same jaccard, both probe tiers. This
  * is the guarantee the streaming near-dup ingest
  * ([[graft.streaming.StreamingIngest.streamNearDupIngest]]) leans on
  * batch after batch.
  */
class IndexAppendPropertySpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Vector("alpha", "beta", "gamma", "delta", "run", "fox", "data",
      "spark", "merge", "shard")

  private def gen(seed: Long): (List[(Long, String)], List[(Long, String)], Int) = {
    def sentence: Gen[String] =
      Gen.choose(4, 9).flatMap(n => Gen.listOfN(n, Gen.oneOf(words)))
        .map(_.mkString(" "))
    val g = for {
      nHist <- Gen.choose(3, 12)
      hist <- Gen.listOfN(nHist, sentence)
      split <- Gen.choose(1, nHist - 1)
      nBatch <- Gen.choose(1, 8)
      batch <- Gen.listOfN(nBatch, Gen.frequency(
        2 -> sentence,
        1 -> Gen.oneOf(hist))) // replays guarantee some true pairs
    } yield (
      hist.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      batch.zipWithIndex.map { case (t, i) => (100L + i, t) },
      split)
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("batch_id", "hist_id", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("property: saved+appended index probes == one-shot index probes") {
    (1L to 10L).foreach { seed =>
      val (hist, batch, split) = gen(seed)
      val histDf = hist.toDF("id", "text")
      val batchDf = batch.toDF("id", "text")
      val (saved, appended) =
        (hist.take(split).toDF("id", "text"), hist.drop(split).toDF("id", "text"))

      val oneShot = tmpDir(s"idx-oneshot-$seed") + "/idx"
      TextDedup.minHashIndexSave(histDf, "id", "text", oneShot,
        n = 2, numHashes = 16, bands = 8)
      val maintained = tmpDir(s"idx-maint-$seed") + "/idx"
      TextDedup.minHashIndexSave(saved, "id", "text", maintained,
        n = 2, numHashes = 16, bands = 8)
      TextDedup.minHashIndexAppend(appended, "id", "text", maintained)

      // verify tier (exact jaccard) and estimate tier (signatures) both
      // answer identically through either index
      Seq(Some((histDf, "id", "text")), None).foreach { verify =>
        val a = pairs(TextDedup.minHashProbeHistory(
          batchDf, "id", "text", oneShot, threshold = 0.3, verify))
        val b = pairs(TextDedup.minHashProbeHistory(
          batchDf, "id", "text", maintained, threshold = 0.3, verify))
        assert(a === b, s"seed $seed verify=${verify.isDefined}")
      }
      // replays guarantee at least one exact pair when the batch drew one
      val replayed = batch.map(_._2).toSet.intersect(hist.map(_._2).toSet)
      if (replayed.nonEmpty) {
        val got = pairs(TextDedup.minHashProbeHistory(
          batchDf, "id", "text", maintained, threshold = 0.3,
          Some((histDf, "id", "text"))))
        assert(got.exists(_._3 == 1.0), s"seed $seed: no j=1.0 pair found")
      }
    }
  }
}
