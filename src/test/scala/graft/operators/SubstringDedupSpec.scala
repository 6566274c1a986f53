package graft.operators

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], L: Int) =
    SubstringDedup.duplicatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long)].collect().toSet

  private def cleaned(docs: Seq[(Long, String)], L: Int) =
    SubstringDedup.removeDuplicatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a cross-document shared trigram span is cut from BOTH docs") {
    val docs = Seq((1L, "a b c d e f"), (2L, "x y c d e z"))
    assert(spans(docs, 3) === Set((1L, 2L, 5L), (2L, 2L, 5L)))
    val out = cleaned(docs, 3)
    assert(out(1L) === ((6L, 3L, "a b f")))
    assert(out(2L) === ((6L, 3L, "x y z")))
  }

  test("overlapping within-document repeats merge into one span (whole doc here)") {
    val docs = Seq((1L, "p q r s p q r s"), (2L, "unrelated words only"))
    assert(spans(docs, 3) === Set((1L, 0L, 8L)))
    val out = cleaned(docs, 3)
    assert(out(1L) === ((8L, 8L, "")))
    assert(out(2L) === ((3L, 0L, "unrelated words only")))
  }

  test("adjacent-but-distinct duplicated grams coalesce; unique middles survive") {
    // 'a b c' dups (docs 1,2); 'c x a' etc unique; doc1 repeats 'a b c'
    // at both ends with unique middle tokens
    val docs = Seq((1L, "a b c m n a b c"), (2L, "a b c"))
    // doc1: starts {0, 5}; [0,3) and [5,8) stay separate (5 > 3)
    assert(spans(docs, 3) === Set((1L, 0L, 3L), (1L, 5L, 8L), (2L, 0L, 3L)))
    assert(cleaned(docs, 3)(1L) === ((8L, 6L, "m n")))
  }

  test("documents shorter than minLen pass through untouched") {
    val docs = Seq((1L, "a b"), (2L, "a b"))
    assert(spans(docs, 3) === Set.empty[(Long, Long, Long)])
    assert(cleaned(docs, 3)(1L) === ((2L, 0L, "a b")))
  }

  test("minLen < 2 is refused") {
    intercept[IllegalArgumentException] {
      SubstringDedup.duplicatedSpans(
        Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text", 1)
    }
  }
}
