package graft.operators

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sep = "\n\n"

  private lazy val docs = Seq(
    (1L, s"shared boilerplate${sep}unique one"),
    (2L, s"unique two${sep}shared boilerplate${sep}also here"),
    (3L, "shared boilerplate"), // every paragraph claimed by doc 1 → empty
    (4L, s"repeated${sep}repeated${sep}tail") // WITHIN-doc repeat too
  ).toDF("doc_id", "text")

  private lazy val out = ParagraphDedup.dedup(docs, "doc_id", "text")
    .orderBy("doc_id")
    .as[(Long, String, Long, Long)].collect().toSeq

  test("scrubSeenParagraphs: history paragraphs vanish, order survives, exact") {
    val history = Seq(
      (100L, s"common header${sep}history-only body")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"common header${sep}fresh body${sep}COMMON  HEADER"), // norm dups x2
      (11L, "common header"),                                      // fully scrubbed
      (12L, s"all new alpha${sep}all new beta")                    // untouched
    ).toDF("doc_id", "text")
    val store = ParagraphDedup.paragraphFps(history, "text")
    val bloom = TextDedup.historyBloom(store, expectedItems = 100)
    val got = ParagraphDedup
      .scrubSeenParagraphs(batch, "doc_id", "text", store, bloom)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (10L, "fresh body", 3L, 1L),
      (11L, "", 1L, 0L),
      (12L, s"all new alpha${sep}all new beta", 2L, 2L)))
  }

  test("repeated paragraphs survive only at their first (doc, pos) occurrence") {
    assert(out == Seq(
      (1L, s"shared boilerplate${sep}unique one", 2L, 2L),
      (2L, s"unique two${sep}also here", 3L, 2L),
      (3L, "", 1L, 0L),
      (4L, s"repeated${sep}tail", 3L, 2L)))
  }

  test("paragraph order inside a document is preserved after dedup") {
    val d = Seq((1L, s"z last${sep}a first"), (2L, s"a first${sep}middle${sep}z last"))
      .toDF("doc_id", "text")
    val r = ParagraphDedup.dedup(d, "doc_id", "text").orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(r(0)._2 == s"z last${sep}a first") // original order, not sorted text
    assert(r(1)._2 == "middle")
  }

  test("winner selection is a partial-aggregable min, not a window sort") {
    val plan = ParagraphDedup.dedup(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"), plan)
  }
}
