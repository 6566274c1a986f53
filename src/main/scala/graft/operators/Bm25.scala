package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * Fingerprint diet (the SubstringDedup/LmScore discipline): terms are
  * shuffle/join/index KEYS only — they never appear in any output — so
  * every tier keys on `xxhash64(term)` instead of the string. The
  * (doc_id, term) partial-agg shuffle, the df shuffle, the query-term
  * joins and the persisted postings all carry fixed 8-byte longs. Two
  * distinct terms colliding (p ≈ V²/2⁶⁵, ~5·10⁻⁸ at a 1M-term vocab)
  * would merge their tf/df statistics; the driver's q96/q104 oracles
  * replay the STRING formulation in DuckDB, re-proving the equivalence
  * on every run.
  */
object Bm25 {

  /** (id, term-string) explode → (id, xxhash64 fingerprint). The hash is
    * applied AFTER the explode (term is an attribute, one hash per row) —
    * hashing inside a `transform` lambda over the computed token array
    * would re-evaluate the tokenizer per element access (the HOF-lambda
    * quadratic, see TextFunctions.bindArray).
    */
  private def fpTokens(src: DataFrame, idAs: String, idCol: Column, terms: Column): DataFrame =
    src.select(idCol.as(idAs), explode(terms).as("__t"))
      .select(col(idAs), xxhash64(col("__t")).as("term"))

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
    val toks = fpTokens(docs, "doc_id", col(docIdCol), tokens(col(textCol)))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // dl = Σ tf per doc — identical integers to counting raw tokens, but
    // it rides the already-shuffled (and much smaller) tf frame instead
    // of tokenizing the corpus a second time
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // the two corpus scalars ride INSIDE the plan as a 1-row cross join
    // (the LmScore vocab pattern) instead of separate .count()/.head()
    // driver actions — each of those was one more full tokenize pass
    val scalars = docs.agg(count(lit(1)).cast("double").as("n"))
      .crossJoin(dl.agg(avg(col("dl")).as("avgdl")))
    score(tf, dl, dfreq, scalars, queries, queryIdCol, queryTextCol, k, k1, b)
  }

  /** The query-side scoring over prepared index frames — shared by the
    * recompute tier ([[topK]]) and the persisted tier ([[topKIndexed]]).
    * `scalars` is a 1-row (n, avgdl) frame, cross-joined as a broadcast
    * literal.
    */
  private def score(
      tf: DataFrame, dl: DataFrame, dfreq: DataFrame,
      scalars: DataFrame,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double, b: Double): DataFrame = {
    val qTerms = fpTokens(queries, "query_id", col(queryIdCol),
      array_distinct(tokens(col(queryTextCol))))
    val idf = log(((col("n") - col("df") + 0.5) / (col("df") + 0.5)) + 1.0)
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val partial = qTerms
      .join(tf, Seq("term"))
      .join(dl, Seq("doc_id"))
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(scalars))
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

  /** Persist the inverted index: postings (doc_id, term-fingerprint, tf),
    * document lengths, per-term document frequencies, and the two corpus
    * scalars. The stored `term` column is the xxhash64 fingerprint (LONG),
    * never the string — see the class doc's fingerprint-diet note.
    * The corpus tokenization + counting — the dominant cost of [[topK]] —
    * is paid ONCE per corpus version; every later search is only the
    * query-side joins ([[topKIndexed]]). The same amortization shape as
    * [[IvfAnn.save]] for vectors. At serving scale, register the postings
    * as a term-bucketed table ([[graft.sources.Bucketing]]) so the query
    * join is exchange-free on the index side.
    */
  def buildIndex(
      docs: DataFrame, docIdCol: String, textCol: String, dir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = fpTokens(docs, "doc_id", col(docIdCol), tokens(col(textCol)))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // cache: postings feed BOTH the write and the df aggregation below —
    // without it the tokenize+count pass runs twice
    tf.cache()
    try {
      // index artifacts are byte-sized at write (guide §6): tiny
      // corpora write ONE file per dir instead of one per reduce
      // partition — every later probe pays the listing + footer count
      graft.sources.ParquetTable.sizedForWriteShuffled(tf)
        .write.mode("overwrite").parquet(s"$dir/postings")
      graft.sources.ParquetTable.sizedForWriteShuffled(
          tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
        .write.mode("overwrite").parquet(s"$dir/termstats")
      // Σ tf per doc == raw token count, riding the CACHED tf frame
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      dl.cache()
      try {
        graft.sources.ParquetTable.sizedForWriteShuffled(dl)
          .write.mode("overwrite").parquet(s"$dir/doclens")
        // N must be the same statistic [[topK]] uses (docs.count(), i.e.
        // ALL docs including null/empty-text ones), not dl.count() (docs
        // with >=1 token) — otherwise the two tiers compute different idf
        // on corpora containing tokenless rows
        val n = docs.count().toDouble
        val avgdl = dl.agg(avg(col("dl"))).head.getDouble(0)
        // n_postings is the torn-index marker: meta commits LAST, so any
        // earlier crash leaves it disagreeing with the postings dir and
        // [[requireConsistent]] refuses to serve (ADVICE r9 low)
        Seq((n, avgdl, tf.count()))
          .toDF("n", "avgdl", "n_postings")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
      } finally { dl.unpersist(); () }
    } finally { tf.unpersist(); () }
  }

  /** Fail fast when the persisted index is torn: [[appendToIndex]] is a
    * multi-step update (postings append → doclens append → termstats swap
    * → meta swap, meta LAST), so a crash mid-sequence leaves the postings
    * row count disagreeing with the `n_postings` marker the last complete
    * update committed — without the check, every later [[topKIndexed]]
    * would silently score against inconsistent tf/df statistics.
    * Pre-marker indexes (no `n_postings` column) skip the check. The
    * postings count is a column-less parquet scan (footer-driven, no
    * column I/O) — cheap relative to the query joins it guards.
    */
  private def requireConsistent(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    // meta through the cached 1-row reader and the postings count from
    // parquet footers — the guard used to cost a meta job plus a
    // scheduled column-less scan per probe call; footers carry the same
    // exact row counts with zero jobs
    val meta = SmallMeta.headRow(spark, s"$dir/meta")
    if (meta.schema.fieldNames.contains("n_postings")) {
      val expected = meta.getLong(meta.fieldIndex("n_postings"))
      val actual = graft.sources.DataSkipping.footerRowCount(
        spark, s"$dir/postings")
      require(actual == expected,
        s"BM25 index at $dir is torn: postings hold $actual rows but the " +
          s"meta marker committed $expected — an appendToIndex crashed " +
          "mid-update. Rebuild the index (buildIndex) before serving.")
    }
  }

  /** Append NEW documents to a [[buildIndex]]-persisted index without a
    * rebuild: tokenize + count ONLY the new docs, append their postings
    * and doclens files, merge the per-term df deltas, and refresh the
    * two scalars — O(new docs) work against an O(corpus) rebuild, the
    * same amortization as the streaming ANN index maintenance. The
    * updated index is equivalent to `buildIndex(old ∪ new)` — integer
    * count statistics merge exactly, and the scalars recompute over the
    * full doclens/docs (spec-pinned: incremental == rebuild, identical
    * topKIndexed results).
    *
    * New doc ids must be DISJOINT from the indexed corpus (probed
    * against the postings' doc set, fail-fast): BM25 count statistics
    * cannot distinguish an update from a duplicate, so re-ingesting a
    * changed document needs delete-then-append or a rebuild.
    */
  def appendToIndex(
      newDocs: DataFrame, docIdCol: String, textCol: String, dir: String): Unit = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    // refuse to compound a torn index — appending onto inconsistent
    // postings/termstats would bake the skew in permanently
    requireConsistent(spark, dir)
    val dup = spark.read.parquet(s"$dir/postings")
      .select(col("doc_id")).distinct()
      .join(newDocs.select(col(docIdCol).as("doc_id")), Seq("doc_id"), "left_semi")
      .limit(1).collect()
    require(dup.isEmpty, s"appendToIndex: doc_id ${dup.headOption.map(_.get(0))
      .getOrElse("")} is already indexed at $dir — BM25 statistics cannot " +
      "distinguish an update from a duplicate; delete-then-append or rebuild")
    val oldMeta = SmallMeta.headRow(spark, s"$dir/meta")
    val oldN = oldMeta.getDouble(oldMeta.fieldIndex("n"))
    val oldPostings =
      if (oldMeta.schema.fieldNames.contains("n_postings"))
        oldMeta.getLong(oldMeta.fieldIndex("n_postings"))
      else graft.sources.DataSkipping.footerRowCount(
        spark, s"$dir/postings") // pre-marker index
    val nNew = newDocs.count().toDouble
    val toks = fpTokens(newDocs, "doc_id", col(docIdCol), tokens(col(textCol)))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.cache()
    try {
      val nTf = tf.count() // materializes the cache; the delta's marker share
      graft.sources.ParquetTable.sizedForWriteShuffled(tf)
        .write.mode("append").parquet(s"$dir/postings")
      graft.sources.ParquetTable.sizedForWriteShuffled(
          tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
        .write.mode("append").parquet(s"$dir/doclens")
      // termstats is read AND replaced — stage to a sibling dir, then
      // swap (overwriting a path the plan is lazily reading corrupts it)
      val mergedStats = spark.read.parquet(s"$dir/termstats")
        .unionByName(tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
        .groupBy(col("term")).agg(sum(col("df")).as("df"))
      replaceDir(spark, s"$dir/termstats", mergedStats)
      val avgdl = spark.read.parquet(s"$dir/doclens")
        .agg(avg(col("dl"))).head.getDouble(0)
      // meta LAST: its n_postings marker is what declares the whole
      // multi-step update complete (see [[requireConsistent]])
      replaceDir(spark, s"$dir/meta",
        Seq((oldN + nNew, avgdl, oldPostings + nTf))
          .toDF("n", "avgdl", "n_postings").coalesce(1))
    } finally { tf.unpersist(); () }
  }

  private def replaceDir(
      spark: org.apache.spark.sql.SparkSession, path: String, df: DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "_staged")
    val fs = p.getFileSystem(conf)
    graft.sources.ParquetTable.sizedForWriteShuffled(df)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    require(fs.rename(tmp, p), s"replaceDir: rename $tmp -> $p failed")
  }

  /** BM25 top-k over a [[buildIndex]]-persisted index — identical results
    * to [[topK]] on the same corpus (spec-pinned), at query-side cost.
    */
  def topKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    requireConsistent(spark, dir)
    score(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclens"),
      spark.read.parquet(s"$dir/termstats"),
      spark.read.parquet(s"$dir/meta").select(col("n"), col("avgdl")),
      queries, queryIdCol, queryTextCol, k, k1, b)
  }
}
