package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learns merges in frequency order with deterministic tie-breaks") {
    // corpus: "aaab" x3, "ab" x2 → pairs round 1: (a a): 2*3=6, (a b): 5
    val docs = Seq("aaab aaab ab", "aaab ab").toDF("text")
    val m = BpeTrain.train(docs, "text", nMerges = 3)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(m(0) == ((1, "a a", "aa", 6L)))
    // after merge 1: aaab → "aa a b" (left-to-right non-overlap), ab → "a b"
    // pairs: (aa a): 3, (a b): 3+2=5 → next is (a b)
    assert(m(1) == ((2, "a b", "ab", 5L)))
    // after merge 2: "aa ab" and "ab" → pair (aa ab): 3
    assert(m(2) == ((3, "aa ab", "aaab", 3L)))
  }

  test("identical-token runs follow the documented replace contract") {
    // 5 a's: the space-consuming replace merges (1,2) and (4,5) →
    // "aa a aa" (canonical greedy would give "aa aa a"; see scaladoc —
    // the oracle replays THIS contract exactly)
    val docs = Seq("aaaaa").toDF("text")
    val m = BpeTrain.train(docs, "text", nMerges = 2)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(m(0)._2 == "a a" && m(0)._4 == 4L) // all 4 adjacent pairs counted
    // round 2 pairs over "aa a aa": (aa a): 1, (a aa): 1 → tie broken
    // lexicographically: "a aa" < "aa a"
    assert(m(1)._2 == "a aa")
  }

  test("stops early when the vocabulary runs out of pairs") {
    val docs = Seq("ab ab").toDF("text")
    val m = BpeTrain.train(docs, "text", nMerges = 10).collect()
    assert(m.length == 1) // after (a b) → "ab", no pairs remain
  }

  test("segment applies the learned merges and reconstructs the input") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = BpeTrain.train(docs, "text", nMerges = 6)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    val seg = BpeTrain.segment(docs, "text", merges)
    // lossless: concatenating a word's tokens yields the word
    val bad = seg.select(
      lower(regexp_replace(col("text"), "\\s+", "")).as("flat"),
      array_join(col("tokens"), "").as("joined"))
      .filter(col("flat") =!= col("joined"))
    assert(bad.isEmpty)
    // compression: learned merges reduce token count below char count
    val counts = seg.select(
      sum(size(col("tokens"))).as("toks"),
      sum(length(regexp_replace(lower(col("text")), "\\s+", ""))).as("chars"))
      .head()
    assert(counts.getLong(0) < counts.getLong(1))
  }
}
