package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.expressions.RepetitionStats
import org.apache.spark.unsafe.types.UTF8String

/** Pins RepetitionStats against hand-computed fixtures, a declarative HOF
  * cross-check (the executable spec of the same formulas), and property
  * inputs — the q73 oracle then re-pins the same semantics against DuckDB.
  */
class RepetitionStatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("text", StringType)))

  private def stats(text: String): (Double, Double, Double, Double) = {
    val r = RepetitionStats.compute(UTF8String.fromString(text), 2, 3)
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("hand-computed fixture: duplicate lines and repeated grams") {
    // lines: ["a b", "c", "a b"]  → 1 dup of 3; chars 3+1+3=7, distinct 4
    val (dlf, dlcf, _, _) = stats("a b\nc\na b")
    assert(dlf === 1.0 / 3.0)
    assert(dlcf === 3.0 / 7.0)
  }

  test("hand-computed fixture: top 2-gram coverage") {
    // text "x y x y x" (len 9): 2-grams = x y, y x, x y, y x →
    // counts {x y: 2, y x: 2}, coverage 2*3=6 → 6/9
    val (_, _, tgcf, _) = stats("x y x y x")
    assert(tgcf === 6.0 / 9.0)
    // no gram repeats 3-grams: "x y x"(2) "y x y"(1) → dup = 2*5/9
    val (_, _, _, dgcf) = stats("x y x y x")
    assert(dgcf === 10.0 / 9.0) // overlapping occurrences both count
  }

  test("degenerate inputs") {
    assert(stats("") === ((0.0, 0.0, 0.0, 0.0)))
    assert(stats("one") === ((0.0, 0.0, 0.0, 0.0))) // 1 line, <n tokens
    // repetition-free text: every signal is 0 — a single-occurrence gram
    // contributes nothing even if it is long
    assert(stats("alpha beta gamma delta") === ((0.0, 0.0, 0.0, 0.0)))
    // identical lines, single token each: no 2-grams per line but the
    // joined token stream "a a" yields one 2-gram (not repeated)
    val (dlf, dlcf, _, _) = stats("a\na")
    assert(dlf === 0.5 && dlcf === 0.5)
  }

  /** Declarative replay of the same formulas with Spark HOFs — the
    * cross-engine executable spec (mirrors the DuckDB oracle's shape).
    */
  private def hofStats(textCol: org.apache.spark.sql.Column) = {
    val lines = split(textCol, "\n")
    val w = split(lower(textCol), "\\s+")
    def grams(n: Int) =
      when(size(w) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n)))))
    val g2 = grams(2)
    val g3 = grams(3)
    val lineChars = aggregate(lines, lit(0L), (a, l) => a + length(l))
    val distinctChars =
      aggregate(array_distinct(lines), lit(0L), (a, l) => a + length(l))
    struct(
      ((size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
        .as("dlf"),
      when(lineChars === 0, 0.0)
        .otherwise((lineChars - distinctChars).cast("double") / lineChars)
        .as("dlcf"),
      when(length(textCol) === 0, 0.0).otherwise(
        coalesce(array_max(transform(array_distinct(g2),
          g => when(size(filter(g2, x => x === g)) > 1,
            size(filter(g2, x => x === g)) * length(g)).otherwise(0))),
          lit(0)).cast("double")
          / length(textCol)).as("tgcf"),
      when(length(textCol) === 0, 0.0).otherwise(
        coalesce(aggregate(array_distinct(g3), lit(0L),
          (a, g) => a + when(size(filter(g3, x => x === g)) > 1,
            size(filter(g3, x => x === g)).cast("long") * length(g)).otherwise(0L)),
          lit(0L)).cast("double") / length(textCol)).as("dgcf"))
  }

  test("native matches the declarative HOF replay on generated corpora") {
    val word = Gen.oneOf("scan", "merge", "sort", "a", "bb", "x1")
    val textGen = for {
      n <- Gen.choose(0, 24)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "\n", "  "))
    } yield ws.zipAll(sep, "", "").map { case (a, b) => a + b }.mkString
    val texts = (1 to 120).map(i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong * 7919)).get)
    val df = frame(schema,
      texts.zipWithIndex.map { case (t, i) => Row(i, t) })
    val got = df.select(
        repetitionStats(col("text"), 2, 3).as("n"),
        hofStats(col("text")).as("h"))
      .collect()
    got.foreach { r =>
      val n = r.getStruct(0); val h = r.getStruct(1)
      (0 until 4).foreach { i =>
        assert(n.getDouble(i) === h.getDouble(i),
          s"field ${RepetitionStats.schema.fieldNames(i)}")
      }
    }
  }

  test("keep gate rejects repeated documents and passes clean ones") {
    val clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val loops = "spam ham spam ham spam ham spam ham spam ham spam ham"
    val df = frame(schema, Seq(Row(1, clean), Row(2, loops)))
      .select(col("id"), repetitionKeep(repetitionStats(col("text"))).as("keep"))
    val byId = df.collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(byId(1) === true)
    assert(byId(2) === false)
  }

  test("stays codegen-compiled (no interpreted fallback in the projection)") {
    val df = frame(schema, Seq(Row(1, "a b\na b")))
      .select(repetitionStats(col("text")).as("st"))
    // the "*(n)" prefix on the Project node is the whole-stage-codegen
    // marker in the compact plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
