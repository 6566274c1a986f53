package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.TextFunctions._

/** Pins the native text expressions (PolyFold fingerprint, TokenSetHits
  * word-set counting) bit-for-bit against the declarative HOF
  * formulations they replaced — the HOFs remain the executable spec the
  * DuckDB oracles were written against, so native==HOF ⇒ oracle parity
  * is untouched.
  */
class NativeTextParitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("text", StringType)))

  private def corpus: Seq[String] = {
    val word = Gen.oneOf("the", "der", "el", "le", "ของ", "añ", "x1", "a",
      "und", "nicht", "la", "de", "done.", "Mixed", "中", "")
    val gen = for {
      n <- Gen.choose(0, 30)
      ws <- Gen.listOfN(n, word)
      seps <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", "\t", "\n"))
    } yield ws.zipAll(seps, "", "").map { case (a, b) => a + b }.mkString
    (1 to 150).map(i => gen.apply(Gen.Parameters.default, Seed(i * 7919L)).get)
  }

  private def df = frame(schema,
    corpus.zipWithIndex.map { case (t, i) => Row(i, t) })

  test("fingerprint: native PolyFold == HOF char fold (incl. multi-byte)") {
    val rows = df.select(fingerprint(col("text")).as("n"),
      fingerprintHof(col("text")).as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("wordListRatio: native TokenSetHits == HOF filter/contains") {
    val rows = df.select(
      wordListRatio(col("text"), EnglishStopwords).as("n"),
      wordListRatioHof(col("text"), EnglishStopwords).as("h")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("langId and qualityScore keep their pre-native outputs") {
    // executable spec of the OLD formulations, inlined
    def langIdHof(text: org.apache.spark.sql.Column) = {
      val toks = tokens(text)
      val scores = LangMarkers.map { case (lang, words) =>
        lang -> size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
      }
      val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
      scores.foldRight(lit("und"): org.apache.spark.sql.Column) {
        case ((lang, s), els) => when(best > 0 && s === best, lit(lang)).otherwise(els)
      }
    }
    def qualityHof(text: org.apache.spark.sql.Column) =
      round(
        alphaRatio(text) * 0.4
          + (lit(1.0) - punctRatio(text)) * 0.2
          + least(tokenCount(text).cast("double") / 50.0, lit(1.0)) * 0.2
          + least(wordListRatioHof(text, EnglishStopwords) * 5.0, lit(1.0)) * 0.2,
        4)
    val rows = df.select(
      langId(col("text")).as("l"), langIdHof(col("text")).as("lh"),
      qualityScore(col("text")).as("q"), qualityHof(col("text")).as("qh"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("native text expressions stay codegen-compiled") {
    val plan = df.select(fingerprint(col("text")),
        langId(col("text")), qualityScore(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
