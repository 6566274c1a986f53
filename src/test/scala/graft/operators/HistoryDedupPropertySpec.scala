package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Differential properties for the Bloom-guarded history dedup: for
  * RANDOM corpora with injected exact/normalized/batch-internal
  * duplicates, (a) `dedupAgainstHistoryBloom` must equal
  * `incrementalExactDedup` row-for-row (the bloom only reroutes), and
  * (b) `novelByBloom` must drop EVERY true duplicate (no false
  * negatives) while keeping only truly-novel rows — the two guarantees
  * tested as properties, not hand-picked fixtures (those live in
  * TextDedupSpec).
  */
class HistoryDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Vector("alpha", "beta", "gamma", "delta", "run", "fox", "data", "spark")

  /** Random docs; ~1/3 of batch rows replay a history text (verbatim or
    * case/whitespace-mangled), and some batch texts repeat internally.
    */
  private def corpus(seed: Long): (List[(Long, String)], List[(Long, String)]) = {
    def sentence: Gen[String] =
      Gen.choose(3, 7).flatMap(n => Gen.listOfN(n, Gen.oneOf(words)))
        .map(_.mkString(" "))
    def mangle(s: String): Gen[String] =
      Gen.oneOf(s, s.toUpperCase, "  " + s.replace(" ", "   ") + " ")
    val gen = for {
      nHist <- Gen.choose(2, 10)
      hist <- Gen.listOfN(nHist, sentence)
      nBatch <- Gen.choose(1, 12)
      batch <- Gen.listOfN(nBatch, Gen.frequency(
        2 -> sentence,
        1 -> Gen.oneOf(hist).flatMap(mangle),
        1 -> Gen.oneOf(hist))) // verbatim replay
    } yield (
      hist.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      batch.zipWithIndex.map { case (t, i) => (100L + i, t) })
    gen.apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))
  }

  test("property: bloom tier == incremental tier on random duplicated corpora") {
    (1L to 12L).foreach { seed =>
      val (hist, batch) = corpus(seed)
      val histDf = hist.toDF("id", "text")
      val batchDf = batch.toDF("id", "text")
      val (_, store) = TextDedup.incrementalExactDedup(
        histDf, "id", "text",
        Seq.empty[Long].toDF("fp"))
      val bloom = TextDedup.historyBloom(store, expectedItems = 64)
      val (novelB, fpsB) =
        TextDedup.dedupAgainstHistoryBloom(batchDf, "id", "text", store, bloom)
      val (novelE, fpsE) =
        TextDedup.incrementalExactDedup(batchDf, "id", "text", store)
      assert(novelB.orderBy("id").collect().toSeq ===
        novelE.orderBy("id").collect().toSeq, s"novel mismatch at seed $seed")
      assert(fpsB.collect().map(_.getLong(0)).sorted.toSeq ===
        fpsE.collect().map(_.getLong(0)).sorted.toSeq, s"fps mismatch at seed $seed")
    }
  }

  test("property: novelByBloom never passes a true duplicate") {
    (20L to 28L).foreach { seed =>
      val (hist, batch) = corpus(seed)
      val histDf = hist.toDF("id", "text")
      val batchDf = batch.toDF("id", "text")
      val (_, store) = TextDedup.incrementalExactDedup(
        histDf, "id", "text", Seq.empty[Long].toDF("fp"))
      val bloom = TextDedup.historyBloom(store, expectedItems = 64)
      val kept = TextDedup.novelByBloom(batchDf, "text", bloom)
        .select("id").collect().map(_.getLong(0)).toSet
      def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
      val histTexts = hist.map(h => norm(h._2)).toSet
      val dupIds = batch.collect {
        case (id, t) if histTexts.contains(norm(t)) => id
      }.toSet
      assert(kept.intersect(dupIds).isEmpty,
        s"seed $seed: bloom passed a true duplicate ${kept.intersect(dupIds)}")
    }
  }
}
