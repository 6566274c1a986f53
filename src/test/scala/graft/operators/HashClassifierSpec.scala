package graft.operators

import graft.SparkSpec
import graft.functions.expressions.PolyHash64

class HashClassifierSpec extends SparkSpec {
  import spark.implicits._

  // explicit tiny model: bucket j gets weight (j+1)*10 milli-units, so
  // expected sums are hand-derivable from the bucket indices alone
  private val w: Array[Long] = Array.tabulate(8)(j => (j + 1) * 10L)

  private def bucket(tok: String): Int = (PolyHash64.hash(tok) % 8).toInt

  test("bow_sum equals the hand-computed bucket-weight sum; score is the mean/1000") {
    val text = "Spark Merges TABLES fast"
    val expected = text.toLowerCase.split("\\s+")
      .map(t => w(bucket(t))).sum
    val out = HashClassifier.score(
        Seq((1L, text)).toDF("doc_id", "text"), "text", w)
      .select("n_tokens", "bow_sum", "score")
      .as[(Long, Long, Double)].head()
    assert(out._1 == 4L)
    assert(out._2 == expected)
    assert(out._3 == expected.toDouble / 4000.0)
  }

  test("scoring is case-insensitive and length-invariant (mean formulation)") {
    val df = Seq((1L, "alpha beta"), (2L, "ALPHA beta Alpha BETA"))
      .toDF("doc_id", "text")
    val scores = HashClassifier.score(df, "text", w)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(scores(1L) == scores(2L))
  }

  test("seededWeights are deterministic, bounded, and seed-sensitive") {
    val a = HashClassifier.seededWeights("m1", 64)
    assert(a.toSeq == HashClassifier.seededWeights("m1", 64).toSeq)
    assert(a.forall(x => x >= -1000L && x <= 1000L))
    assert(a.toSeq != HashClassifier.seededWeights("m2", 64).toSeq)
  }

  test("filterByScore keeps exactly the docs clearing the threshold") {
    // one doc of all-high buckets, one of all-low: thresholds split them
    val high = (0 until 8).map(j => (j, w(j))).maxBy(_._2)
    val low = (0 until 8).map(j => (j, w(j))).minBy(_._2)
    // find concrete tokens landing in those buckets
    def tokenIn(b: Int): String =
      Iterator.from(0).map(i => s"tok$i").find(t => bucket(t) == b).get
    val df = Seq(
      (1L, Seq.fill(3)(tokenIn(high._1)).mkString(" ")),
      (2L, Seq.fill(3)(tokenIn(low._1)).mkString(" "))
    ).toDF("doc_id", "text")
    val mid = (high._2 + low._2) / 2.0 / 1000.0
    val kept = HashClassifier.filterByScore(df, "text", w, mid)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("the scoring plan is map-only (no exchange) and codegen'd") {
    val dir = tmpDir("hashclf")
    Seq((1L, "a b c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val plan = HashClassifier.score(
        spark.read.parquet(dir), "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
  }

  test("trainNaiveBayes counts tokens per bucket exactly; totals reconcile") {
    val df = Seq(
      (true, "alpha alpha beta"),
      (false, "beta gamma")
    ).toDF("label", "text")
    val m = HashClassifier.trainNaiveBayes(df, "text", "label", 8)
    assert(m.counts(bucket("alpha"))._1 >= 2L)
    assert(m.counts.map(_._1).sum == 3L) // pos tokens
    assert(m.counts.map(_._2).sum == 2L) // neg tokens
    // hand-check one weight: bucket of 'gamma' (assuming no collision
    // with alpha/beta, which holds for these tokens at dim=8 -> verify)
    val gb = bucket("gamma")
    if (Seq("alpha", "beta").forall(t => bucket(t) != gb)) {
      val expected = math.floor(
        (math.log(1.0 / (3 + 8)) - math.log(2.0 / (2 + 8))) * 1000.0 + 0.5)
      assert(m.weights(gb) == expected.toLong)
    }
  }

  test("a trained model separates the classes it was trained on") {
    val pos = (1 to 20).map(i => (true, s"good clean prose number $i"))
    val neg = (1 to 20).map(i => (false, s"spam junk casino click $i"))
    val df = scala.util.Random.shuffle(pos ++ neg).toDF("label", "text")
    val m = HashClassifier.trainNaiveBayes(df, "text", "label", 64)
    val scored = HashClassifier.score(df, "text", m.weights)
      .select("label", "score")
      .as[(Boolean, Double)].collect()
    val posMin = scored.filter(_._1).map(_._2).min
    val negMax = scored.filterNot(_._1).map(_._2).max
    assert(posMin > negMax,
      s"positive scores must dominate: posMin=$posMin negMax=$negMax")
    assert(m.biasMilli == 0L) // balanced classes -> ln(21/21) = 0
  }

  test("training is partitioning-invariant (exact integer statistics)") {
    val df = (1 to 50).map(i => (i % 3 == 0, s"tok$i word${i % 7} x$i"))
      .toDF("label", "text")
    val m1 = HashClassifier.trainNaiveBayes(df.repartition(1), "text", "label", 32)
    val m2 = HashClassifier.trainNaiveBayes(df.repartition(7), "text", "label", 32)
    assert(m1.weights.toSeq == m2.weights.toSeq)
    assert(m1.biasMilli == m2.biasMilli)
    assert(m1.counts.toSeq == m2.counts.toSeq)
  }

  test("null text propagates null; empty text is ONE empty token (tokens convention)") {
    val df = frame(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))),
      Seq(org.apache.spark.sql.Row(1L, null),
        org.apache.spark.sql.Row(2L, "")))
    val rows = HashClassifier.score(df, "text", w)
      .select("doc_id", "n_tokens", "score")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(1) && rows(1L).isNullAt(2))
    assert(rows(2L).getLong(1) == 1L) // "" -> [""], one token
    assert(rows(2L).getDouble(2) == w(0).toDouble / 1000.0) // hash("")=0 -> bucket 0
  }
}
