package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-k bigram probabilities") {
    // corpus: "a b a b" and "a c". bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    // contexts: a→3, b→1. V = 3. k = 1.
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = LmScore.scoreBigram(docs, "doc_id", "text", k = 1.0)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val pAB = (2.0 + 1) / (3 + 1.0 * 3) // 0.5
    val pBA = (1.0 + 1) / (1 + 1.0 * 3) // 0.5
    val pAC = (1.0 + 1) / (3 + 1.0 * 3)
    val d1 = (math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3
    val d2 = math.log(pAC)
    assert(got.map(_._2) == Seq(3L, 1L))
    assert(math.abs(got(0)._3 - d1) < 1e-12 && math.abs(got(1)._3 - d2) < 1e-12)
  }

  test("repetitive gibberish scores above(ish) average, rare-sequence docs below") {
    // common bigrams score high; a doc of unique-context bigrams scores low
    val docs = (Seq.fill(20)("the cat sat") :+ "zq xv wj").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val scores = LmScore.scoreBigram(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scores(20L) < scores(0L)) // the rare doc scores lowest
  }

  test("single-token documents yield zero bigrams and a null score") {
    val docs = Seq((1L, "loner"), (2L, "a b")).toDF("doc_id", "text")
    val got = LmScore.scoreBigram(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 0L && got(0).isNullAt(2))
    assert(got(1).getLong(1) == 1L && !got(1).isNullAt(2))
  }

  test("persisted model tier == recompute tier on the training corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "b c a"), (4L, "loner"))
      .toDF("doc_id", "text")
    val dir = tmpDir("lmbg") + "/model"
    LmScore.trainBigram(docs, "doc_id", "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, Long, Option[Double])].collect().toSeq
    val rec = rows(LmScore.scoreBigram(docs, "doc_id", "text", k = 0.5))
    val per = rows(LmScore.scoreWithModel(spark, dir, docs, "doc_id", "text", k = 0.5))
    assert(per.map(r => (r._1, r._2)) === rec.map(r => (r._1, r._2)))
    per.zip(rec).foreach { case (p, r) =>
      (p._3, r._3) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12)
        case (a, b) => assert(a === b)
      }
    }
  }

  test("held-out scoring: unseen bigrams get the add-k floor, score is finite") {
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val dir = tmpDir("lmheld") + "/model"
    LmScore.trainBigram(train, "doc_id", "text", dir)
    val held = Seq((9L, "z q")).toDF("doc_id", "text") // bigram never trained
    val got = LmScore.scoreWithModel(spark, dir, held, "doc_id", "text", k = 1.0)
      .collect().head
    // c2 = 0, c1 = 0, V = 3 → p = (0+1)/(0+1·3) = 1/3
    assert(got.getLong(1) === 1L)
    assert(math.abs(got.getDouble(2) - math.log(1.0 / 3)) < 1e-12)
  }

  test("perplexityBuckets: every doc gets a tier; unscorable docs land in tail, " +
    "hot-group guard fires") {
    val docs = ((1L to 9L).map(i => (i, s"the cat sat on mat $i", "en")) :+
      ((10L, "loner", "en"))).toDF("doc_id", "text", "lang")
    val out = LmScore.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select("doc_id", "bucket", "tier").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out.size === 10, "no doc may be silently dropped")
    assert(out(10L)._2 === "tail", s"null-score doc must rank last: $out")
    assert(out.values.count(_._2 == "head") > 0)
    val e = intercept[IllegalArgumentException] {
      LmScore.perplexityBuckets(docs, "doc_id", "text", "lang",
        maxGroupRows = 5L)
    }
    assert(e.getMessage.contains("lang=en"))
  }

  test("fingerprint diet holds in the PLAN: no shuffle carries a string column") {
    // the scale claim is that bigram strings never leave the map pass —
    // every Exchange in the scoring plan must move only fp longs /
    // counts / doubles. Long doc ids so any string in a shuffle schema
    // is a leaked token.
    val docs = Seq((1L, "a b c a b"), (2L, "b c d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val df = LmScore.scoreBigram(docs, "doc_id", "text")
    df.collect()
    def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] = {
      import org.apache.spark.sql.execution._
      val self = p match {
        case e: exchange.ShuffleExchangeExec => Seq(e)
        case _ => Nil
      }
      val kids = p match {
        case a: adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: adaptive.QueryStageExec => Seq(q.plan)
        case r: exchange.ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      self ++ kids.flatMap(exchanges)
    }
    val exs = exchanges(df.queryExecution.executedPlan)
    assert(exs.nonEmpty, "expected shuffles in the scoring plan")
    exs.foreach { e =>
      val stringy = e.child.output.filter(
        _.dataType == org.apache.spark.sql.types.StringType)
      assert(stringy.isEmpty,
        s"shuffle carries string column(s) ${stringy.map(_.name).mkString(",")}")
    }
  }

  test("trigram JM interpolation matches the hand-computed count ratios") {
    import spark.implicits._
    // corpus: "a b a b a" (doc 1), "a b c" (doc 2)
    //   unigrams: a×4, b×3, c×1 → N = 8, V = 3
    //   bigrams:  ab×3, ba×2, bc×1 → contexts a·×4? no: c(a·)=3 (a b ×3),
    //   wait doc1 bigrams: ab,ba,ab,ba? tokens a b a b a → ab,ba,ab,ba;
    //   doc2: ab,bc. So ab×3, ba×2, bc×1; c(a·)=3, c(b·)=3.
    //   trigrams doc1: aba, bab, aba; doc2: abc.
    //   c(aba)=2, c(bab)=1, c(abc)=1; ctx c(ab·)=3 (aba×2+abc), c(ba·)=1.
    val corpus = Seq((1L, "a b a b a"), (2L, "a b c")).toDF("doc_id", "text")
    val got = LmScore.scoreTrigramJM(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def p(c123: Double, c12: Double, c23: Double, c2: Double, c3: Double) =
      0.5 * c123 / c12 + 0.3 * c23 / c2 + 0.15 * c3 / 8 + 0.05 / 3
    val pAba = p(2, 3, 2, 3, 4) // w3=a: c(ba)=2, c(b·)=3, c(a)=4
    val pBab = p(1, 1, 3, 3, 3) // w3=b: c(ab)=3, c(a·)=3, c(b)=3
    val pAbc = p(1, 3, 1, 3, 1) // w3=c: c(bc)=1, c(b·)=3, c(c)=1
    val want1 = (math.log(pAba) + math.log(pBab) + math.log(pAba)) / 3
    assert(got(1L)._1 == 3)
    assert(math.abs(got(1L)._2 - want1) < 1e-9, s"${got(1L)._2} vs $want1")
    assert(got(2L)._1 == 1)
    assert(math.abs(got(2L)._2 - math.log(pAbc)) < 1e-9)
    // < 3 tokens → absent, never null
    val short = Seq((9L, "a b")).toDF("doc_id", "text")
    assert(LmScore.scoreTrigramJM(corpus.unionByName(short), "doc_id", "text")
      .filter($"doc_id" === 9L).count() == 0)
  }
}
