package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // synthetic line structure, the q84 trick (the corpus has no newlines)
  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .withColumn("text", replace(col("text"), lit(" merge "), lit("\n")))
    .select("doc_id", "text")

  private def run() = CurationPipeline.run(spark, docs,
    minWordsPerLine = 4, blocklist = Seq("slow"), minLines = 1,
    lmCutQuantile = 0.10, nShards = 4, nMerges = 6)

  private lazy val result = run()

  test("optional stages: benchmark decontamination drops leaked docs; " +
    "temperature mix rebalances by lang") {
    val docsWithLang = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("text", replace(col("text"), lit(" merge "), lit("\n")))
      .select("doc_id", "text", "lang")
    // held-out set = verbatim copies of some corpus docs → 100% overlap
    val bench = docsWithLang.filter(col("doc_id") % 7 === 0).select("text")
    val r = CurationPipeline.run(spark, docsWithLang,
      minWordsPerLine = 4, blocklist = Seq("slow"), minLines = 1,
      lmCutQuantile = 0.10, nShards = 4, nMerges = 6,
      bench = Some(bench), mixBy = Some(("lang", 0.5)))
    val funnel = r.funnel.toMap
    assert(r.funnel.map(_._1).contains("decontaminate"))
    assert(funnel("decontaminate") < funnel("exact_dedup"),
      s"verbatim-leaked docs must drop: ${r.funnel}")
    assert(r.funnel.map(_._1).contains("temperature_mix(lang, 0.5)"))
    assert(funnel("temperature_mix(lang, 0.5)") <= funnel("lm_gate"))
    assert(funnel("temperature_mix(lang, 0.5)") > 0)
    // none of the leaked docs survive to the shards
    val leaked = docsWithLang.filter(col("doc_id") % 7 === 0)
      .select("doc_id").as[Long].collect().toSet
    val out = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(out.intersect(leaked) === Set.empty)
  }

  test("near-dup stage collapses planted clusters via the LSH path") {
    // plant one near-dup twin per %5 LONG doc: newlines flattened to
    // spaces (ONE paragraph, unique corpus-wide — paragraph dedup must
    // not strip it back to a stub) + a unique word tail (fingerprint
    // differs — exact dedup must not collapse it). Token stream ≈ the
    // original's ⇒ word-3-gram Jaccard ≈ n/(n+5) ≥ 0.9 on ≥50-token
    // docs — squarely in the LSH-confident region, must fall to stage 3c
    val planted = docs
      .filter(col("doc_id") % 5 === 0 &&
        size(split(col("text"), "\\s+")) >= 50)
      .withColumn("doc_id", col("doc_id") + 500000L)
      .withColumn("text",
        concat(replace(col("text"), lit("\n"), lit(" ")),
          lit(" unique tail words for "), col("doc_id")))
    val r = CurationPipeline.run(spark, docs.unionByName(planted),
      minWordsPerLine = 4, blocklist = Seq("slow"), minLines = 1,
      lmCutQuantile = 0.10, nShards = 4, nMerges = 6,
      nearDupThreshold = Some(0.5))
    val funnel = r.funnel.toMap
    val stage = r.funnel.find(_._1.startsWith("near_dedup")).get
    assert(stage._2 < funnel("exact_dedup"), r.funnel.toString)
    // each collapsed cluster kept exactly one member: surviving planted
    // twins and their originals are (near-)disjoint — allow a small LSH
    // tail for very short docs at j barely over the bar
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    val bothKept = ids.filter(_ >= 500000L).map(_ - 500000L).count(ids.contains)
    assert(bothKept === 0, s"$bothKept clusters kept both members")
    assert(ids.nonEmpty)
  }

  test("the funnel is observable, ordered, and monotone non-increasing") {
    val names = result.funnel.map(_._1)
    assert(names == Seq("input", "c4_filter", "para_dedup", "exact_dedup",
      "repetition_gate", "lm_gate"))
    val counts = result.funnel.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${result.funnel}")
    assert(counts.head > counts.last, "fixture should actually filter something")
    assert(counts.last > 0, "fixture should keep something")
  }

  test("output shards are well-formed: unique ids, bounded shards, dense positions") {
    val c = result.corpus.cache()
    assert(c.select("doc_id").distinct().count() == c.count())
    assert(c.filter(col("shard") < 0 || col("shard") >= 4).isEmpty)
    // positions are 1..n within each shard
    val bad = c.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.isEmpty)
  }

  test("surviving corpus honors the gates it passed") {
    // no two surviving docs share a text (exact dedup held)
    val c = result.corpus
    assert(c.select("text").distinct().count() == c.count())
    // every survivor passes the repetition keep-gate
    import graft.functions.TextFunctions
    assert(c.filter(!TextFunctions.repetitionKeep(
      TextFunctions.repetitionStats(col("text")))).isEmpty)
  }

  test("tokenizer learned from the curated corpus; whole run is deterministic") {
    val m1 = result.merges.orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m1.nonEmpty && m1.map(_._1) == (1 to m1.length))
    val again = run()
    val m2 = again.merges.orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m1 == m2)
    val s1 = result.corpus.select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect().toSet
    val s2 = again.corpus.select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect().toSet
    assert(s1 == s2)
  }
}
