package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import TextFunctions._

class TextFunctionsSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("t", StringType, nullable = true)))
  private def one(s: String) = frame(schema, Seq(Row(s)))
  private def eval(s: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    one(s).select(c(col("t"))).head().get(0)

  test("tokenCount splits on whitespace runs") {
    assert(eval("a b  c\td", tokenCount) === 4)
  }

  test("bpeTokenCount: letter runs, digit runs, single punct") {
    assert(eval("hello world42, ok!", bpeTokenCount) === 6)
    // hello | world | 42 | , | ok | !
  }

  test("wordNGrams: distinct n-grams, short text → empty") {
    assert(eval("a b c d", wordNGrams(_, 2)) ===
      Seq("a b", "b c", "c d"))
    assert(eval("a b a b", wordNGrams(_, 2)) === Seq("a b", "b a")) // distinct
    assert(eval("a", wordNGrams(_, 3)) === Seq())
  }

  test("native wordNGrams equals the HOF spec on varied inputs") {
    val texts = Seq("a b c d e", "a", "", "x  Y\tz x y z x y", "w w w w",
      "The Quick the quick THE QUICK")
    val df = frame(schema, texts.map(Row(_)))
    val out = df.select(
      wordNGrams(col("t"), 3).as("native"),
      wordNGramsHof(col("t"), 3).as("hof")).collect()
    out.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("jaccard on distinct sets") {
    val df = frame(StructType(Seq(
      StructField("a", ArrayType(StringType), nullable = true),
      StructField("b", ArrayType(StringType), nullable = true))),
      Seq(Row(Seq("x", "y", "z"), Seq("y", "z", "w"))))
    assert(df.select(jaccard(col("a"), col("b"))).head().getDouble(0) === 0.5)
  }

  test("alpha/punct ratios") {
    assert(eval("ab!?", alphaRatio) === 0.5)
    assert(eval("ab!?", punctRatio) === 0.5)
    assert(eval("", alphaRatio) === 0.0)
  }

  test("langId picks the language with most marker hits, und when none") {
    assert(eval("the cat is on the mat", langId) === "en")
    assert(eval("der hund und die katze ist", langId) === "de")
    assert(eval("el perro y la casa es que", langId) === "es")
    assert(eval("xyzzy plugh qwerty", langId) === "und")
  }

  test("fingerprint: deterministic rolling hash; normalization folds variants") {
    val a = eval("Hello World", normalizedFingerprint)
    val b = eval("  hello   world ", normalizedFingerprint)
    val c = eval("hello world!", normalizedFingerprint)
    assert(a === b)
    assert(a !== c)
    // known value: fold of "a" = ascii('a') = 97
    assert(eval("a", fingerprint) === 97L)
  }

  test("qualityScore in [0,1], higher for clean english prose") {
    val clean = eval("the quick brown fox jumps over the lazy dog and runs to the hills",
      qualityScore).asInstanceOf[Double]
    val junk = eval("@@@@ #### !!!! %%%% ^^^^", qualityScore).asInstanceOf[Double]
    assert(clean > junk)
    assert(clean <= 1.0 && junk >= 0.0)
  }

  test("tokenChunks: stride overlap, short tail, single-chunk doc") {
    // 7 tokens, size 4, stride 2 → ceil(7/2) = 4 chunks
    val chunks = eval("a b c d e f g", t => tokenChunks(t, 4, 2))
      .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(chunks === Seq(
      (0L, "a b c d", 4), (1L, "c d e f", 4), (2L, "e f g", 3), (3L, "g", 1)))
    val one = eval("tiny doc", t => tokenChunks(t, 32, 24))
      .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(one.size === 1 && one.head.getString(1) === "tiny doc")
  }

  test("collapseRepeats folds immediate repeats only") {
    assert(eval("the the cat cat cat sat the", collapseRepeats) === "the cat sat the")
    assert(eval("a b a b", collapseRepeats) === "a b a b") // non-adjacent kept
  }

  test("scrubPii redacts phones and emails, counts match") {
    val t = "mail bob.smith+x@corp.example.org or call +1-555-0042 today"
    assert(eval(t, scrubPii) === "mail <EMAIL> or call <PHONE> today")
    assert(eval(t, emailCount) === 1)
    assert(eval(t, phoneCount) === 1)
    // grouped without +, and international undelimited, both redact
    assert(eval("call 020-7946-0958 now", phoneCount) === 1)
    assert(eval("call +442079460958 now", phoneCount) === 1)
  }

  test("scrubPii leaves dates, order ids, and long integers alone") {
    // the round-2 pattern redacted all of these (any 7+ digit/hyphen run)
    val negatives = Seq(
      "shipped on 2024-01-01 and 1999-12-31",  // ISO dates
      "order 12345678 confirmed",              // 8-digit order id
      "tracking 4711081526171 in transit",     // long integer
      "ref 123-45 short groups",               // too few digits
      // US-style dates: the round-4 pattern ate these (day-of-month is
      // ≤ 2 digits; the middle-group ≥ 3 floor now rejects them)
      "due 12-31-2024 or 1-5-2024",
      "born 07-04-1976, see 3-15-99 note")     // 2-digit year too
    negatives.foreach { t =>
      assert(eval(t, scrubPii) === t, s"corrupted: $t")
      assert(eval(t, phoneCount) === 0, s"counted a phone in: $t")
    }
    // tightening must not lose the canonical grouped shapes
    assert(eval("call 555-123-4567 or 1-234-5678", phoneCount) === 2)
    assert(eval("call +49 30 901820 now", phoneCount) === 1)
  }
}
