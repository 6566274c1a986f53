package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class TextDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("block", StringType, nullable = true)))

  private def docs(rows: (Long, String, String)*) =
    frame(schema, rows.map(r => Row(r._1, r._2, r._3)))

  private val corpus = docs(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "the quick brown fox jumps over the lazy cat", "a"), // near-dup of 1
    (3L, "completely different content about spark engines here", "a"),
    (4L, "the quick brown fox jumps over the lazy dog", "a"), // exact dup of 1
    (5L, "THE  QUICK brown fox jumps over the lazy dog", "a"), // normalized dup of 1
    (6L, "unrelated text talking about large scale data pipelines", "b"))

  test("exactDedup keeps lowest id per exact text") {
    val out = TextDedup.exactDedup(corpus, "id", "text").select("id")
      .collect().map(_.getLong(0)).sorted
    assert(out === Seq(1L, 2L, 3L, 5L, 6L)) // 4 removed (exact dup of 1)
  }

  test("exactDedup with normalization also folds case/whitespace variants") {
    val out = TextDedup.exactDedup(corpus, "id", "text", normalize = true)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(out === Seq(1L, 2L, 3L, 6L)) // 4 and 5 both fold into 1
  }

  test("incrementalExactDedup: batch-internal + store dedup, store growth") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType => LT, StructField => SF, StructType => ST}
    val emptyStore = frame(ST(Seq(SF("fp", LT, nullable = false))), Seq.empty)
    // batch 1: doc 4 duplicates doc 1, doc 5 is a normalized variant of 1
    val (novel1, fps1) = TextDedup.incrementalExactDedup(corpus, "id", "text", emptyStore)
    assert(novel1.select("id").collect().map(_.getLong(0)).sorted === Seq(1L, 2L, 3L, 6L))
    val store1 = emptyStore.unionByName(fps1)
    assert(store1.count() === 4)
    // batch 2: one replay of doc 2's text (new id) + one genuinely new doc
    val batch2 = docs(
      (10L, "the quick brown fox jumps over the lazy cat", "a"), // dup of stored 2
      (11L, "fresh unseen content in the second batch", "b"))
    val (novel2, fps2) = TextDedup.incrementalExactDedup(batch2, "id", "text", store1)
    assert(novel2.select("id").collect().map(_.getLong(0)).toSeq === Seq(11L))
    assert(store1.unionByName(fps2).count() === 5)
  }

  test("dedupAgainstHistoryBloom == incrementalExactDedup (bloom only reroutes)") {
    // history = the deduped corpus; batch mixes exact dups, normalized
    // dups, batch-internal dups and genuinely novel rows
    val (_, histFps) = TextDedup.incrementalExactDedup(
      corpus, "id", "text",
      frame(StructType(Seq(StructField("fp", LongType, nullable = false))), Seq.empty))
    val batch = docs(
      (20L, "the quick brown fox jumps over the lazy dog", "a"),   // dup of history 1
      (21L, "The Quick  Brown fox jumps over the lazy dog", "a"),  // normalized dup of 1
      (22L, "novel row one about streaming watermark semantics", "b"),
      (23L, "novel row one about streaming watermark semantics", "b"), // internal dup of 22
      (24L, "novel row two about bloom filter reroute paths", "b"))
    val (novelB, fpsB) = TextDedup.dedupAgainstHistoryBloom(
      batch, "id", "text", histFps,
      TextDedup.historyBloom(histFps, expectedItems = 100))
    val (novelE, fpsE) = TextDedup.incrementalExactDedup(batch, "id", "text", histFps)
    assert(novelB.select("id").collect().map(_.getLong(0)).sorted ===
      novelE.select("id").collect().map(_.getLong(0)).sorted)
    assert(novelB.select("id").collect().map(_.getLong(0)).sorted === Seq(22L, 24L))
    assert(fpsB.collect().map(_.getLong(0)).sorted ===
      fpsE.collect().map(_.getLong(0)).sorted)
  }

  test("novelByBloom: no false negatives — every true dup is dropped") {
    val (_, histFps) = TextDedup.incrementalExactDedup(
      corpus, "id", "text",
      frame(StructType(Seq(StructField("fp", LongType, nullable = false))), Seq.empty))
    val bloom = TextDedup.historyBloom(histFps, expectedItems = 100)
    val batch = docs(
      (20L, "the quick brown fox jumps over the lazy dog", "a"), // dup
      (21L, "unrelated  TEXT talking about large scale data pipelines", "b"), // norm dup
      (22L, "a genuinely novel document mentioning nothing familiar", "b"))
    val kept = TextDedup.novelByBloom(batch, "text", bloom)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(20L) && !kept.contains(21L)) // bloom never misses a dup
    // kept ⊆ truly-novel (false positives may drop novel rows, never add dups)
    assert(kept.subsetOf(Set(22L)))
  }

  test("dedupAgainstHistoryBloom plan: history side broadcast-probed, not shuffled") {
    val (_, histFps) = TextDedup.incrementalExactDedup(
      corpus, "id", "text",
      frame(StructType(Seq(StructField("fp", LongType, nullable = false))), Seq.empty))
    val batch = docs((20L, "the quick brown fox jumps over the lazy dog", "a"),
      (22L, "a genuinely novel document mentioning nothing familiar", "b"))
    val (novel, _) = TextDedup.dedupAgainstHistoryBloom(
      batch, "id", "text", histFps,
      TextDedup.historyBloom(histFps, expectedItems = 100))
    val plan = novel.queryExecution.executedPlan.toString
    // both history-touching joins are broadcast hash joins: the store is
    // scanned (streamed) but never exchanged by the confirm path
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.toLowerCase.contains("mightcontain") ||
      plan.contains("might_contain") || plan.contains("BloomFilterMightContain"))
  }

  test("minHashProbeHistory: verified tier finds cross near-dups, exact jaccard") {
    val dir = tmpDir("mhidx") + "/index"
    TextDedup.minHashIndexSave(corpus, "id", "text", dir)
    val batch = docs(
      (20L, "the quick brown fox jumps over the lazy dog", "a"), // = hist 1/4/5
      (22L, "a genuinely novel document mentioning nothing familiar", "b"))
    val got = TextDedup.minHashProbeHistory(
        batch, "id", "text", dir, threshold = 0.5,
        verifyAgainst = Some((corpus, "id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact copies (j = 1.0) share every band — LSH can never miss them
    val exact = got.filter(_._3 == 1.0).map(p => (p._1, p._2)).toSet
    assert(Set((20L, 1L), (20L, 4L), (20L, 5L)).subsetOf(exact))
    // the novel doc pairs with nothing; every returned pair clears the bar
    assert(!got.exists(_._1 == 22L))
    assert(got.forall(_._3 >= 0.5))
  }

  test("minHashProbeHistory: signature-estimate tier needs no corpus access") {
    val dir = tmpDir("mhidx-est") + "/index"
    TextDedup.minHashIndexSave(corpus, "id", "text", dir)
    val batch = docs((20L, "the quick brown fox jumps over the lazy dog", "a"))
    val got = TextDedup.minHashProbeHistory(
        batch, "id", "text", dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical text → identical signature → estimate exactly 1.0
    assert(got.filter(_._3 == 1.0).map(p => p._2).toSet
      .intersect(Set(1L, 4L, 5L)) === Set(1L, 4L, 5L))
  }

  test("poly64 base hash: pinned in meta, append hashes with it, estimate tier answers") {
    val dir = tmpDir("mhidx-poly") + "/index"
    val half1 = corpus.filter(org.apache.spark.sql.functions.col("id") <= 3L)
    val half2 = corpus.filter(org.apache.spark.sql.functions.col("id") > 3L)
    TextDedup.minHashIndexSave(half1, "id", "text", dir, baseHash = "poly64")
    // the append must READ base_hash from the pinned meta — appended rows
    // hashing with the xxh64 default would never bucket with the build's
    TextDedup.minHashIndexAppend(half2, "id", "text", dir)
    val oneShot = tmpDir("mhidx-poly1") + "/index"
    TextDedup.minHashIndexSave(corpus, "id", "text", oneShot, baseHash = "poly64")
    val batch = docs((20L, "the quick brown fox jumps over the lazy dog", "a"))
    def probe(d: String) = TextDedup.minHashProbeHistory(
        batch, "id", "text", d, threshold = 0.5) // estimate tier, no corpus
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = probe(dir)
    assert(got == probe(oneShot))
    // exact copies sit in the APPENDED half (4, 5) and the saved half (1):
    // identical text → identical poly64 signatures → estimate exactly 1.0
    assert(Set(1L, 4L, 5L).subsetOf(got.filter(_._3 == 1.0).map(_._2)))
    assert(TextDedup.minHashSignatures(batch, "id", "text", 3, 32,
      baseHash = "poly64").collect().head.getSeq[Long](1).length === 32)
    intercept[IllegalArgumentException] {
      TextDedup.minHashSignatures(batch, "id", "text", 3, 32,
        baseHash = "md5").collect()
    }
  }

  test("ngramJaccardPairs finds near-dups within blocks only") {
    val pairs = TextDedup.ngramJaccardPairs(corpus, "id", "text",
        n = 2, threshold = 0.5, blockCols = Seq("block"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // near-dup pair found
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L)) // other block
    assert(!pairs.contains((1L, 3L))) // dissimilar
  }

  test("minHash LSH candidates ⊇ true near-dup pairs (planted high-jaccard)") {
    val cands = TextDedup.minHashLshPairs(corpus, "id", "text",
        n = 2, numHashes = 32, bands = 16) // r=2: high recall at low j
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 4L))) // identical text: sig equal, must appear
    assert(cands.contains((1L, 2L))) // j≈0.78 2-grams: expected with r=2
  }

  test("minHashDedupPairs = LSH candidates verified by exact jaccard") {
    val out = TextDedup.minHashDedupPairs(corpus, "id", "text",
        threshold = 0.99, n = 2, numHashes = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 5 tokenizes identically to 1/4 (lowercase + whitespace collapse),
    // so all three mutual pairs are true jaccard-1.0 duplicates
    assert(out === Set((1L, 4L), (1L, 5L), (4L, 5L)))
  }

  test("minHash signature is deterministic and length numHashes") {
    val s1 = TextDedup.minHashSignatures(corpus, "id", "text", 2, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val s2 = TextDedup.minHashSignatures(corpus, "id", "text", 2, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(s1 === s2)
    assert(s1(1L).length === 16)
    assert(s1(1L) === s1(4L)) // identical docs → identical signatures
  }

  test("simHash: identical docs equal, near-dups within small hamming") {
    val sigs = TextDedup.simHashes(corpus, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
  }

  test("simHashPairs finds exact dup at hamming 0") {
    val pairs = TextDedup.simHashPairs(corpus, "id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("contaminationScores: exact copy scores 1.0, disjoint doc 0.0, short doc absent") {
    val bench = docs((100L, "the quick brown fox jumps over the lazy dog", "x"))
    val c = docs(
      (1L, "the quick brown fox jumps over the lazy dog", "a"), // full copy
      (2L, "intro words the quick brown fox jumps over the lazy dog outro", "a"), // contains it
      (3L, "completely different content about spark engines here", "a"), // disjoint
      (4L, "too short", "a")) // < 3 tokens → no grams → no row
    val out = TextDedup.contaminationScores(c, bench, "id", "text", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((7L, 7L, 1.0)))
    assert(out(2L)._2 === 7L) // all 7 benchmark grams leak into doc 2
    assert(out(2L)._3 < 1.0) // but doc 2 has extra grams of its own
    assert(out(3L) === ((5L, 0L, 0.0))) // 7 tokens → 5 trigrams, none shared
    assert(!out.contains(4L))
  }

  test("decontaminate drops flagged docs, keeps clean and short docs") {
    val bench = docs((100L, "the quick brown fox jumps over the lazy dog", "x"))
    val c = docs(
      (1L, "the quick brown fox jumps over the lazy dog", "a"),
      (3L, "completely different content about spark engines here", "a"),
      (4L, "too short", "a"))
    val kept = TextDedup.decontaminate(c, bench, "id", "text", "text", maxOverlap = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept === Seq(3L, 4L))
    // absolute-count cap flags doc 1 even at a permissive fraction
    val keptAbs = TextDedup.decontaminate(c, bench, "id", "text", "text",
        maxOverlap = 1.0, maxMatchedGrams = 5)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(keptAbs === Seq(3L, 4L))
  }

  test("winnowingFingerprints: JVM replay of gram hashes + window minima") {
    import org.apache.spark.sql.functions.col
    val text = "a b c d e f g h"
    val got = docs((1L, text, "x"))
      .select(TextDedup.winnowingFingerprints(col("text"), k = 3, w = 4))
      .collect()(0).getSeq[Long](0)
    // JVM ground truth: PolyHash64 over each 3-gram, min per 4-window
    def poly(s: String): Long =
      graft.functions.expressions.PolyHash64.Parts.zipWithIndex.map {
        case ((b, p), i) =>
          s.foldLeft(0L)((h, c) => (h * b + c.toInt) % p) << (i * 16)
      }.reduce(_ | _)
    val toks = text.split("\\s+")
    val hs = toks.sliding(3).map(g => poly(g.mkString(" "))).toSeq
    val want = hs.sliding(4).map(_.min).toSeq.distinct
    assert(got.toSeq == want)
  }

  test("winnowing guarantee: docs sharing a long run share a fingerprint") {
    val run = "one two three four five six seven eight nine"
    val d = docs(
      (1L, s"prefix words here $run", "x"),
      (2L, s"$run totally different suffix", "x"),
      (3L, "nothing in common with the others at all", "x"))
    val pairs = TextDedup.winnowingPairs(d, "id", "text",
        k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // shared 9-token run ≥ w+k−1 = 6
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowingProbeHistory == direct cross pairing; params pinned on disk") {
    val dir = tmpDir("wnidx") + "/idx"
    TextDedup.winnowingIndexSave(corpus, "id", "text", dir, k = 3, w = 4)
    val batch = docs(
      (20L, "the quick brown fox jumps over the lazy dog", "a"), // = hist 1/4/5
      (21L, "a genuinely novel document mentioning nothing familiar", "b"))
    val probed = TextDedup.winnowingProbeHistory(batch, "id", "text", dir,
        minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // direct formulation: batch fps × history fps (recomputed)
    import org.apache.spark.sql.functions.{col, explode}
    val hp = corpus.select(col("id").as("hist_id"),
      explode(TextDedup.winnowingFingerprints(col("text"), 3, 4)).as("fp"))
    val bp = batch.select(col("id"),
      explode(TextDedup.winnowingFingerprints(col("text"), 3, 4)).as("fp"))
    val direct = bp.join(hp, "fp").groupBy("id", "hist_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probed == direct)
    assert(probed.exists(p => p._1 == 20L && p._2 == 1L))
    assert(!probed.exists(_._1 == 21L))
  }

  test("winnowingIndexAppend: saved+appended index probes == one-shot index") {
    val half1 = corpus.filter(org.apache.spark.sql.functions.col("id") <= 3L)
    val half2 = corpus.filter(org.apache.spark.sql.functions.col("id") > 3L)
    val oneShot = tmpDir("wnidx-oneshot") + "/idx"
    TextDedup.winnowingIndexSave(corpus, "id", "text", oneShot, k = 3, w = 4)
    val maintained = tmpDir("wnidx-maint") + "/idx"
    TextDedup.winnowingIndexSave(half1, "id", "text", maintained, k = 3, w = 4)
    TextDedup.winnowingIndexAppend(half2, "id", "text", maintained)
    val batch = docs(
      (20L, "the quick brown fox jumps over the lazy dog", "a"),
      (21L, "a genuinely novel document mentioning nothing familiar", "b"))
    def probe(dir: String) = TextDedup.winnowingProbeHistory(
        batch, "id", "text", dir, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = probe(maintained)
    assert(got == probe(oneShot))
    // the APPENDED half answers probes (4/5 are dups of the batch doc)
    assert(got.exists(p => p._1 == 20L && p._2 == 4L))
    assert(got.exists(p => p._1 == 20L && p._2 == 5L))
  }

  test("winnowingProbeHistory is replay-insensitive: duplicated append does not inflate n_shared") {
    val clean = tmpDir("wnidx-clean") + "/idx"
    TextDedup.winnowingIndexSave(corpus, "id", "text", clean, k = 3, w = 4)
    val replayed = tmpDir("wnidx-replay") + "/idx"
    TextDedup.winnowingIndexSave(corpus, "id", "text", replayed, k = 3, w = 4)
    // an at-least-once restart re-appends the SAME documents: posting rows
    // duplicate, but n_shared (and therefore the minShared cut) must not move
    TextDedup.winnowingIndexAppend(corpus, "id", "text", replayed)
    val batch = docs((20L, "the quick brown fox jumps over the lazy dog", "a"))
    def probe(dir: String) = TextDedup.winnowingProbeHistory(
        batch, "id", "text", dir, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe(replayed) == probe(clean))
  }

  test("winnowing short-doc tiers: < k tokens empty, < w grams one global min") {
    import org.apache.spark.sql.functions.col
    val fps = docs((1L, "a b", "x"), (2L, "a b c d", "x"))
      .select(col("id"), TextDedup.winnowingFingerprints(col("text"), 3, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L).isEmpty)     // 2 tokens < k=3
    assert(fps(2L).length == 1) // 2 grams < w=4 → single global minimum
  }
}
