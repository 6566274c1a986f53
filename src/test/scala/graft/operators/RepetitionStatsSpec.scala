package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher repetition signals: hand-computed fixtures per signal, edge
  * cases (empty/short/null docs), and the threshold filter.
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(rows: (Long, String)*) =
    RepetitionStats.gopherStats(rows.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap

  test("duplicate-line fractions match hand computation") {
    // lines: [a b, a b, c d] → dup count 1 - 2/3; dup chars (2·3)/(3·3)
    val s = statsOf((1L, "a b\na b\nc d"))(1L)
    assert(math.abs(s._1 - (1.0 - 2.0 / 3)) < 1e-12)
    assert(math.abs(s._2 - 6.0 / 9) < 1e-12)
  }

  test("duplicate-paragraph fraction splits on blank lines") {
    // paragraphs: [p one, p one, p two] → 1 - 2/3
    val s = statsOf((1L, "p one\n\np one\n\np two"))(1L)
    assert(math.abs(s._3 - (1.0 - 2.0 / 3)) < 1e-12)
    // the paragraphs are distinct LINES too — their inner lines repeat
    assert(s._1 > 0)
  }

  test("top 2-gram coverage: count × gram length over text length") {
    // tokens [a, b, a, b, c, d]; "a b" occurs twice, len 3 → 6/11
    val s = statsOf((1L, "a b\na b\nc d"))(1L)
    assert(math.abs(s._4 - 6.0 / 11) < 1e-12)
    // every 3-gram is unique → 0
    assert(s._5 === 0.0)
  }

  test("edge cases: empty, single-token and null docs score 0 everywhere") {
    val df = Seq((1L, ""), (2L, "one"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = RepetitionStats.gopherStats(df, "doc_id", "text").collect()
    assert(got.length === 3)
    got.foreach { r =>
      (1 to 5).foreach(i => assert(r.getDouble(i) === 0.0,
        s"doc ${r.getLong(0)} col $i"))
    }
  }

  test("the Gopher filter drops boilerplate-repetition docs, keeps prose") {
    val spam = (1 to 10).map(_ => "buy cheap deals now").mkString("\n")
    val prose = "the quick brown fox jumps over a lazy dog " +
      "while seven wizards brew quirky potions beyond the misty fjord"
    val docs = Seq((1L, spam), (2L, prose)).toDF("doc_id", "text")
    val kept = RepetitionStats.gopherRepetitionFilter(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
  }
}
