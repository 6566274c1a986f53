package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** BM25 document ranking (Robertson & Walker 1994; the Okapi weighting) —
  * the retrieval scorer data-curation pipelines use for query-targeted
  * corpus selection (e.g. "collect documents relevant to these seed
  * queries"):
  *
  *   score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
  *                            / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *
  * with idf(t) = ln( (N − df + 0.5)/(df + 0.5) + 1 ) (the Lucene-style
  * always-positive form).
  *
  * Scale shape — one inverted-index pass, the q49 TF-IDF discipline:
  * term frequencies and document lengths in one explode + two groupBys;
  * df per term; queries decompose to (query_id, term) rows and join the
  * POSTINGS equi-keyed by term — so each query only ever touches the
  * postings of its own terms (never a corpus scan per query); per-doc
  * partial scores sum keyed by (query, doc); top-k per query by window.
  * The two scalars (N, avgdl) broadcast as literals.
  */
object Bm25 {

  /** @param queries (queryIdCol, queryTextCol) frame
    * @return (query_id, rank, doc_id, score) — top-k docs per query by
    *         BM25 descending, doc id ascending on ties.
    */
  def topK(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(docIdCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val n = docs.count().toDouble
    val avgdl = dl.agg(avg(col("dl"))).head.getDouble(0)

    val qTerms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(array_distinct(tokens(col(queryTextCol)))).as("term"))

    val idf = log(((lit(n) - col("df") + 0.5) / (col("df") + 0.5)) + 1.0)
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))
    val partial = qTerms
      .join(tf, Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(dfreq, Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (idf * col("tf") * lit(k1 + 1) / norm).as("s"))

    val scored = partial.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}
