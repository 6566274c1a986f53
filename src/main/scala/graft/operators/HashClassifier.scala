package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.{HashedBowSum, PolyHash64}

/** fastText-style hashed linear text classifier — the APPLY side of the
  * standard web-corpus quality model (a linear model over hashed
  * bag-of-words features, the CCNet/LLaMA-pipeline "quality classifier"
  * shape). Training happens offline; what a 100 TB pipeline needs from
  * the engine is scoring every document with the frozen weights as a
  * map-only scan — which is exactly what [[HashedBowSum]] compiles to:
  * no vocabulary broadcast, no explode, no shuffle, one codegen'd pass
  * per document.
  *
  * Weights are integer milli-units (exact sums → replayable scores, see
  * [[HashedBowSum]]). [[seededWeights]] derives a deterministic
  * pseudo-model from a seed — the spec/oracle harness stand-in for
  * trained weights, built on the same SQL-replayable [[PolyHash64]] so
  * an external engine can reconstruct the identical table.
  */
object HashClassifier {

  /** Deterministic weight table: w(j) = polyHash64(seed|j) mod 2001 −
    * 1000 ∈ [−1000, 1000] milli-units.
    */
  def seededWeights(seed: String, dim: Int): Array[Long] = {
    require(dim > 0, s"dim must be positive, got $dim")
    Array.tabulate(dim)(j => PolyHash64.hash(s"$seed|$j") % 2001L - 1000L)
  }

  /** Σ tokens weights[polyHash64(token) mod D] as a column (exact long,
    * milli-units).
    */
  def bowSum(text: Column, weights: Array[Long]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HashedBowSum(
        org.apache.spark.sql.GraftColumnBridge.expression(text), weights))

  /** Score every document: adds `n_tokens`, `bow_sum` (milli-units) and
    * `score` = mean token weight in [-1, 1]. The mean — not the raw
    * sum — is the fastText formulation (average of bucket embeddings),
    * so score is length-invariant. One exact-integer division per doc;
    * no floating accumulation anywhere. (Splitting follows the
    * `TextFunctions.tokens` convention: `""` yields one empty token, so
    * `n_tokens` ≥ 1 and the 0-guard only covers null-text rows.)
    */
  def score(
      df: DataFrame, textCol: String, weights: Array[Long]): DataFrame = {
    val n = size(TextFunctions.tokens(col(textCol)))
    df.withColumn("n_tokens", n.cast("long"))
      .withColumn("bow_sum", bowSum(col(textCol), weights))
      .withColumn("score",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("bow_sum").cast("double") /
            (lit(1000.0) * col("n_tokens"))))
  }

  /** A trained hashed-NB model: per-bucket log-odds weights in
    * milli-units (feed straight into [[score]]/[[filterByScore]]) plus
    * the class-prior bias, and the raw per-bucket counts for audit.
    */
  final case class NbModel(
      weights: Array[Long],
      biasMilli: Long,
      counts: Array[(Long, Long)])

  /** TRAIN the classifier: multinomial Naive Bayes over the same hashed
    * buckets, Laplace-smoothed — w(j) = ln P(bucket j | pos) − ln
    * P(bucket j | neg), quantized to milli-units. NB is the one
    * classical text classifier whose training statistic is a pure COUNT
    * aggregation, which is exactly what makes it right for a 100 TB
    * engine: ONE explode + hash-aggregate by (bucket) with map-side
    * combine — integer arithmetic end-to-end, so the trained model is
    * bit-deterministic under any partitioning (a gradient-descent
    * trainer's float sums are summation-order-dependent; its Spark
    * formulation would not be replayable). The collect is `dim` rows —
    * model-sized, not data-sized.
    *
    * `labelCol` must be boolean (positive class = true). Quantization
    * is floor(x·1000 + 0.5) — explicitly NOT Math.round-on-negatives
    * ambiguous; an external SQL engine replays it verbatim.
    */
  def trainNaiveBayes(
      df: DataFrame, textCol: String, labelCol: String, dim: Int): NbModel = {
    require(dim > 0, s"dim must be positive, got $dim")
    val bucket = TextFunctions.polyHash64(col("term")) % dim
    val rows = df
      .select(col(labelCol).cast("boolean").as("pos"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .select(col("pos"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("c_neg"))
      .collect()
    val counts = Array.fill(dim)((0L, 0L))
    rows.foreach(r =>
      counts(r.getLong(0).toInt) = (r.getLong(1), r.getLong(2)))
    val nPos = counts.map(_._1).sum
    val nNeg = counts.map(_._2).sum
    def logp(c: Long, n: Long): Double =
      math.log((c + 1.0) / (n + dim.toDouble))
    val w = counts.map { case (cp, cn) =>
      math.floor((logp(cp, nPos) - logp(cn, nNeg)) * 1000.0 + 0.5).toLong
    }
    val docs = df.select(col(labelCol).cast("boolean").as("pos"))
      .groupBy(col("pos")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val bias = math.floor(math.log(
      (docs.getOrElse(true, 0L) + 1.0) / (docs.getOrElse(false, 0L) + 1.0))
      * 1000.0 + 0.5).toLong
    NbModel(w, bias, counts)
  }

  /** Gate: keep documents whose mean weight clears `threshold` — the
    * quality-filter composition (`score` ≥ threshold ⇒ keep). Same
    * map-only shape: the gate evaluates inside the scan stage, nothing
    * shuffles.
    */
  def filterByScore(
      df: DataFrame, textCol: String, weights: Array[Long],
      threshold: Double): DataFrame =
    score(df, textCol, weights).filter(col("score") >= threshold)
}
