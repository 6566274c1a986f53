package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("disjoint pairs form separate components") {
    val got = components(Seq((1L, 2L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("transitive chain collapses to one component (multi-hop)") {
    // 5-4, 4-3, 3-2, 2-1: diameter 4, needs pointer-halving rounds
    val got = components(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("long chain converges within the round cap (log-diameter halving)") {
    val n = 200L // pure propagation would need ~200 rounds; halving ~O(log)
    val chain = (1L until n).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size === n.toInt)
    assert(got.values.toSet === Set(1L))
  }

  test("cycles and redundant edges are harmless") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 2L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty pair list yields empty components") {
    assert(components(Seq.empty).isEmpty)
  }

  test("LSH→components composition: clusters from banded candidates (q138)") {
    // the 100-TB dedup path: minHashDedupPairs (sub-quadratic banded
    // equi-join + exact-Jaccard confirm) feeding dedupClusters — q47's
    // closure but WITHOUT the quadratic exact-tier edge generator
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // j≈0.78 vs 1
      (3L, "completely different text about spark engines and shuffles"),
      (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (5L, "entirely unrelated musings on parquet footers and bloom filters"))
      .toDF("id", "text")
    val pairs = TextDedup.minHashDedupPairs(docs, "id", "text",
        threshold = 0.5, n = 2, numHashes = 32, bands = 16)
      .select(col("id_a"), col("id_b"))
    val got = Components.dedupClusters(docs, "id", pairs, "id_a", "id_b")
      .select(col("id"), col("component"), col("is_canonical"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((1L, true)))
    assert(got(2L) === ((1L, false)))
    assert(got(4L) === ((1L, false)))
    // dissimilar docs stay singleton canonical clusters
    assert(got(3L) === ((3L, true)))
    assert(got(5L) === ((5L, true)))
  }

  test("reliable checkpointing (checkpointDir) computes the same labels") {
    val dir = tmpDir("graft_ckpt")
    // multi-hop chain so several checkpointed rounds actually run
    val pairs = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)).toDF("a", "b")
    val got = Components
      .connectedComponents(pairs, "a", "b", checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // the rounds really went through the reliable dir, not local blocks
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0)
  }

  test("one giant cluster (hot label) stays within log-diameter rounds") {
    // mostly-duplicate corpus: 2000 nodes, ONE cluster, built as a hub
    // star + a 100-node chain tail — the worst label-concentration shape
    // (every row converges onto label 0) plus real multi-hop diameter.
    // maxRounds stays at the default 20: if the hot label inflated the
    // round count rather than per-task work, this would blow the cap.
    val star = (1L until 1900L).map(i => (0L, i))
    val chain = (1900L until 2000L).map(i => (i - 1, i))
    val got = components(star ++ chain)
    assert(got.size === 2000)
    assert(got.values.toSet === Set(0L))
  }

  test("dedupClusters labels singletons as their own canonical cluster") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 3L)).toDF("id_a", "id_b")
    val got = Components.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .select(col("doc_id"), col("component"), col("is_canonical"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, true), (3L, 1L, false), // clustered: min id is canonical
      (2L, 2L, true), (9L, 9L, true))) // singletons
  }

  test("dedupClustersKeepBest keeps the quality argmax, id breaks ties") {
    val docs = Seq(
      (1L, 0.2), (3L, 0.9),            // cluster {1,3}: 3 wins on quality
      (4L, 0.5), (6L, 0.5),            // cluster {4,6}: tie → lower id 4
      (9L, 0.1))                       // singleton: always best
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 3L), (4L, 6L)).toDF("id_a", "id_b")
    val got = Components.dedupClustersKeepBest(
        docs, "doc_id", pairs, "id_a", "id_b", "quality")
      .select(col("doc_id"), col("component"), col("is_best"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, false), (3L, 1L, true),
      (4L, 4L, true), (6L, 4L, false),
      (9L, 9L, true)))
    // rounding decides rank: a 5th-digit difference is a tie (id wins)
    val close = Seq((1L, 0.50001), (2L, 0.50002)).toDF("doc_id", "quality")
    val best = Components.dedupClustersKeepBest(
        close, "doc_id", Seq((1L, 2L)).toDF("id_a", "id_b"),
        "id_a", "id_b", "quality")
      .filter(col("is_best")).select("doc_id").as[Long].collect().toSeq
    assert(best == Seq(1L))
  }
}
