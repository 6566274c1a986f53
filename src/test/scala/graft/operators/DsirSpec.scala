package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance weighting: hand-computed add-k log-ratios on a tiny
  * corpus, ordering invariants, and the deterministic top-k selection.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // raw corpus: 2 docs; target = doc 1 only.
  //   doc 1 (target-ish): "wiki wiki facts"
  //   doc 2 (crawl-ish):  "spam spam spam buy"
  private val raw = Seq(
    (1L, "wiki wiki facts", "en"),
    (2L, "spam spam spam buy", "xx")).toDF("doc_id", "text", "lang")
  private val target = raw.filter(col("lang") === "en")

  // Hand model (k = 0.5): raw tokens N_r = 7, vocab V = 4
  //   cr: wiki 2, facts 1, spam 3, buy 1;  target N_t = 3
  //   ct: wiki 2, facts 1, spam 0, buy 0
  private def lr(ct: Long, cr: Long): Double =
    math.log((ct + 0.5) / (3 + 0.5 * 4)) - math.log((cr + 0.5) / (7 + 0.5 * 4))

  test("importance weights match the hand-computed add-k log-ratios") {
    val got = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val w1 = 2 * lr(2, 2) + lr(1, 1)
    val w2 = 3 * lr(0, 3) + lr(0, 1)
    assert(got(1L)._1 == 3 && got(2L)._1 == 4)
    assert(math.abs(got(1L)._2 - w1) < 1e-9, s"doc1 ${got(1L)._2} vs $w1")
    assert(math.abs(got(2L)._2 - w2) < 1e-9, s"doc2 ${got(2L)._2} vs $w2")
    // the target-like doc must out-score the crawl-like doc
    assert(got(1L)._2 > got(2L)._2)
  }

  test("selectTop ranks by rounded weight with id tiebreak and caps at k") {
    val sel = Dsir.selectTop(raw, target, "doc_id", "text", topK = 1)
      .collect()
    assert(sel.length == 1)
    assert(sel(0).getLong(0) == 1L && sel(0).getInt(3) == 1)
  }

  test("identical raw and target distributions give near-zero weights") {
    // target == raw → p_t and p_r differ only via N_t vs N_r normalization
    // with identical counts; weights are equal across docs of equal length
    // composition-independently? No — but with target == raw, ct == cr and
    // nt == nr, so every term's log-ratio is exactly 0.
    val got = Dsir.importanceWeights(raw, raw, "doc_id", "text")
      .collect().map(r => r.getDouble(2))
    got.foreach(w => assert(math.abs(w) < 1e-12))
  }

  test("persisted model reproduces the recompute tier on the training corpus") {
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString
    Dsir.trainModel(raw, target, "doc_id", "text", dir)
    val persisted = Dsir.scoreWithModel(spark, dir, raw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val recompute = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(persisted.keySet == recompute.keySet)
    persisted.foreach { case (id, (n, w)) =>
      assert(n == recompute(id)._1)
      assert(math.abs(w - recompute(id)._2) < 1e-12, s"doc $id")
    }
    // held-out scoring: model-vocab terms score, unknown terms drop
    val heldOut = Seq((7L, "wiki unknownterm")).toDF("doc_id", "text")
    val ho = Dsir.scoreWithModel(spark, dir, heldOut, "doc_id", "text")
      .collect()(0)
    assert(ho.getLong(1) == 1) // only "wiki" matched
    assert(math.abs(ho.getDouble(2) - lr(2, 2)) < 1e-9)
  }

  test("zero-token documents are absent, never null-scored") {
    val withEmpty = raw.unionByName(
      Seq((3L, "", "en")).toDF("doc_id", "text", "lang"))
    val ids = Dsir.importanceWeights(withEmpty, target, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }
}
