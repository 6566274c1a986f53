package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
  * the standard hybrid-search combiner: given per-query rankings from
  * heterogeneous scorers (BM25 lexical, embedding cosine, …), the fused
  * score of a document is Σ over rankings of 1/(c + rank). Rank-based,
  * so it needs NO score calibration between scorers — and every fused
  * value is a small sum of exact dyadic-ish rationals, so fusion is
  * bit-deterministic across engines (ties are exact and break by doc
  * id).
  *
  * Scale shape: union of the (already top-k-bounded) ranking frames →
  * one groupBy (query, doc) — input is Σ k·|queries| rows, never
  * corpus-sized — then a per-query window over ≤ Σk candidates.
  */
object RankFusion {

  /** @param rankings frames each holding (queryCol, docCol, rankCol);
    *                 ranks are 1-based within each (ranking, query)
    * @return (query, rank, doc, fused, n_lists): top-k per query by
    *         fused score descending, doc ascending on (exact) ties;
    *         n_lists = how many input rankings contained the doc.
    */
  def rrf(
      rankings: Seq[DataFrame],
      queryCol: String,
      docCol: String,
      rankCol: String,
      c: Int = 60,
      k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrf: no rankings")
    val unioned = rankings
      .map(_.select(col(queryCol).as("query"), col(docCol).as("doc"),
        col(rankCol).as("__r")))
      .reduce(_.unionByName(_))
    val fused = unioned.groupBy(col("query"), col("doc"))
      .agg(sum(lit(1.0) / (lit(c) + col("__r"))).as("fused"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("fused").desc, col("doc"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query"), col("rank"), col("doc"), col("fused"), col("n_lists"))
  }
}
