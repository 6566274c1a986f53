package graft.operators

import graft.SparkSpec

class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    // doc 1: two long clean lines + one short + one blocked → keep
    (1L, "alpha beta gamma delta epsilon\nshort line\nzeta eta theta iota kappa\nbad { brace line here now"),
    // doc 2: only one surviving line → dropped by minLines
    (2L, "alpha beta gamma delta epsilon\ntiny"),
    // doc 3: lorem ipsum everywhere → nothing survives
    (3L, "lorem ipsum dolor sit amet consectetur\nlorem ipsum again and again here")
  ).toDF("doc_id", "text")

  private lazy val out = C4Filter.cleanLines(
    docs, "text", Seq("doc_id"), minWords = 5, minLines = 2)
    .orderBy("doc_id")
    .as[(Long, String, Int, Int, Boolean)].collect().toSeq

  test("line gate: word floor and blocklist; doc gate: min surviving lines") {
    assert(out == Seq(
      (1L, "alpha beta gamma delta epsilon\nzeta eta theta iota kappa", 4, 2, true),
      (2L, "alpha beta gamma delta epsilon", 2, 1, false),
      (3L, "", 2, 0, false)))
  }

  test("zero-shuffle plan: no exchange anywhere") {
    val plan = C4Filter.cleanLines(docs, "text", Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("empty blocklist means word floor only") {
    val one = Seq((9L, "a b c d e f\n{ x y z w v u")).toDF("doc_id", "text")
    val r = C4Filter.cleanLines(one, "text", Seq("doc_id"),
      minWords = 5, blocklist = Nil, minLines = 2)
      .select("n_lines_kept").as[Int].head()
    assert(r == 2)
  }
}
