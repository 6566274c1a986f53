package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *   - `bruteForceTopK`: exact cosine top-k. The query set is broadcast
  *     (it is small by construction); the corpus streams through one
  *     codegen'd join stage — no corpus shuffle, linear scale-out. Use as
  *     the baseline / oracle and whenever |queries| is modest.
  *   - `lshTopK`: random-hyperplane LSH — corpus and queries are bucketed
  *     by signature, candidates come from an equi-join on the bucket key,
  *     then exact cosine ranks within candidates. Sub-linear per query at
  *     the cost of recall; `probes` > 0 also searches buckets within
  *     Hamming distance 1 of the query signature (multi-probe) to win
  *     recall back without more planes.
  */
object Ann {

  /** Rank scored pairs down to k per query via the custom `top_k`
    * bounded-heap aggregate (graft.functions.expressions.TopKAgg): map-side
    * partial heaps mean only k rows per query per partition reach the
    * shuffle, and nothing is globally sorted — unlike the window-rank
    * formulation, which sorts EVERY scored row (`topKWindow` below, kept
    * as the executable spec). Tiebreak: cosine DESC, neighbor_id ASC.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val tk = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.TopKAgg(
        org.apache.spark.sql.GraftColumnBridge.expression(
          struct(col("__cos"), col("neighbor_id"))), k)
        .toAggregateExpression())
    scored
      .groupBy(col("query_id"))
      .agg(tk.as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")))
      .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
        round(col("col.__cos"), 4).as("cosine"), (col("pos") + 1).as("rank"))
  }

  private[graft] def topKWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("__cos"), 4).as("cosine"), col("rank"))
  }

  /** Exact top-k by cosine for each query vector. Output: one row per
    * (query, rank): query_id, neighbor_id, cosine, rank.
    *
    * The query side is broadcast only while its size ESTIMATE stays small
    * (Broadcasting.broadcastIfSmall) — a huge query set degrades to a
    * shuffle nested-loop rather than a driver OOM.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = Broadcasting.broadcastIfSmall(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("__cos"))
    rankTopK(scored, k)
  }

  /** Hard-negative mining for retrieval training data (the DPR/ANCE
    * recipe: a query's best negatives are its nearest NON-relevant
    * corpus items — random negatives are too easy and the trained
    * retriever plateaus): exact cosine top-k per query with the query's
    * POSITIVE pairs excluded by an anti-join BEFORE the ranking, so a
    * positive can never occupy a negative slot. `positives` is a
    * (queryIdCol, posIdCol) pair frame — it rides the scored frame as
    * one equi-anti-join, never a collect. Output shape matches
    * [[bruteForceTopK]]: (query_id, neighbor_id, cosine, rank). The
    * scorer inherits the broadcast/bounded-heap discipline; at 100 TB
    * swap the all-pairs score for an IVF/LSH candidate generator
    * upstream and mine from its candidate frame the same way.
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      positives: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      posIdCol: String,
      k: Int): DataFrame = {
    val q = Broadcasting.broadcastIfSmall(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val pos = positives.select(col(queryIdCol).as("query_id"),
      col(posIdCol).as("neighbor_id")).distinct()
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .join(pos, Seq("query_id", "neighbor_id"), "left_anti")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("__cos"))
    rankTopK(scored, k)
  }

  /** Deterministic Gaussian hyperplane normals (fixed seed). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH top-k: candidates share a signature bucket with the query (or, with
    * `probes` ≥ 1, a bucket within Hamming distance 1), ranked by exact
    * cosine within the candidate set.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 12,
      dim: Int = 64,
      probes: Int = 1,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val sig = hyperplaneSignature(col(vecCol), planes)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      sig.as("__bucket"))
    // multi-probe: the query also visits every bucket flipping one bit
    val probeBuckets =
      if (probes <= 0) array(sig)
      else array((sig +: (0 until numPlanes).map(i =>
        sig.bitwiseXOR(shiftleft(lit(1L), i)))): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(probeBuckets).as("__bucket"))

    val scored = q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("__cos"))
      .distinct() // a pair can meet in several probe buckets
    rankTopK(scored, k)
  }

  /** All pairs (a < b) with cosine ≥ threshold — embedding near-dup.
    * Exact variant blocked by an optional column (e.g. a cluster label);
    * for unblocked corpora use `lshNearDupPairs`.
    *
    * Guardrail: the join is quadratic WITHIN a block, so one hot block at
    * 100× scale silently becomes the whole job. The call fails fast
    * (one cheap linear count-by-block job at plan-build time) when any
    * block exceeds `maxBlockRows`, naming the offender and pointing at
    * `lshNearDupPairs`; raise the cap explicitly to accept the cost.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blockCols: Seq[String] = Nil,
      maxBlockRows: Long = 1000000L): DataFrame = {
    BlockGuard.check("cosineNearDupPairs", df, blockCols, maxBlockRows,
      "lshNearDupPairs")
    val proj = df.select((col(idCol) +: blockCols.map(col)) :+ col(vecCol).as("__v"): _*)
    val a = proj.as("a")
    val b = proj.as("b")
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col(s"a.$idCol") < col(s"b.$idCol"))(_ && _)
    a.join(b, cond)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosine(col("a.__v"), col("b.__v")).as("__cos"))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__cos"), 4).as("cosine"))
  }

  /** Near-dup pairs via hyperplane-LSH buckets — the scale path for
    * UNBLOCKED corpora: candidates are pairs sharing a signature bucket
    * (multi-probe widens each row to buckets within Hamming distance 1 for
    * recall), verified by exact cosine. Expected bucket population is
    * n/2^numPlanes — tune numPlanes so buckets stay small; candidate
    * generation is an equi-join on the bucket key, never a cross product.
    * Approximate: a pair hashing into disjoint probe sets is missed;
    * P(all planes agree) ≥ 1 - numPlanes·θ/π for angle θ, so recall is
    * high precisely for the high-similarity pairs dedup cares about.
    */
  def lshNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numPlanes: Int = 12,
      dim: Int = 64,
      probes: Int = 1,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val sig = hyperplaneSignature(col(vecCol), planes)
    val probeBuckets =
      if (probes <= 0) array(sig)
      else array((sig +: (0 until numPlanes).map(i =>
        sig.bitwiseXOR(shiftleft(lit(1L), i)))): _*)
    val rows = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      sig.as("__home"), explode(probeBuckets).as("__bucket"))
    val l = rows.as("l")
    val r = rows.as("r")
    l.join(r,
        col("l.__bucket") === col("r.__bucket") && col("l.__id") < col("r.__id") &&
          // count each candidate pair once: in the bucket that is one
          // side's HOME bucket (dedups the probe×probe multiplicity
          // before cosine, instead of a distinct() after)
          (col("l.__home") === col("l.__bucket") || col("r.__home") === col("r.__bucket")))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        cosine(col("l.__v"), col("r.__v")).as("__cos"))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__cos"), 4).as("cosine"))
      .distinct()
  }

  /** Embedding-space benchmark decontamination — the semantic twin of
    * `TextDedup.decontaminate` (n-gram leakage): drop every corpus row
    * whose embedding lies within cosine `threshold` of ANY held-out
    * benchmark embedding (paraphrased contamination that token overlap
    * misses; the Phi/FineWeb decontamination recipe).
    *
    * Scale shape: the benchmark side is small by construction (eval sets
    * are thousands of rows against a 100 TB corpus), so it broadcasts —
    * guarded by plan stats ([[Broadcasting.broadcastIfSmall]]) — and the
    * corpus streams through ONE anti-join stage: no corpus shuffle, no
    * pair materialization, nothing driver-side. The anti join IS the
    * "no contaminating neighbor exists" predicate, so there is no
    * groupBy/max-cosine reduction at all.
    *
    * Returns the SURVIVING corpus rows (schema unchanged). Benchmark rows
    * whose id also appears in the corpus still contaminate (id equality
    * is not exempted — the benchmark text itself must leave).
    */
  def decontaminateByEmbedding(
      corpus: DataFrame,
      bench: DataFrame,
      vecCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"decontaminateByEmbedding: threshold $threshold outside (0, 1]")
    val b = Broadcasting.broadcastIfSmall(
      bench.select(col(vecCol).as("__bench_v")))
    corpus.join(b, cosine(col(vecCol), col("__bench_v")) >= threshold, "left_anti")
  }
}
