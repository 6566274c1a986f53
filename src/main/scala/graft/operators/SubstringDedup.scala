package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact duplicated-SUBSTRING dedup — the ExactSubstr tier of Lee et
  * al., "Deduplicating Training Data Makes Language Models Better"
  * (arXiv:2107.06499): find every span of >= `minLen` consecutive tokens
  * that occurs more than once ANYWHERE in the corpus, and cut every
  * occurrence. Document-level dedup ([[TextDedup]]) misses boilerplate
  * shared across otherwise-distinct pages (licenses, navigation, quote
  * chains); this operator removes exactly those.
  *
  * The paper's implementation builds a suffix array; that is a
  * single-machine design. The Spark-first equivalence: a span of length
  * >= L duplicates iff each of its L-token windows duplicates, so the
  * duplicated-span union is EXACTLY the union of [p, p+L) over all
  * positions p whose L-gram fingerprint occurs >= 2 times corpus-wide.
  * That reduces the whole problem to equi-joins and bounded windows:
  *
  *  1. one shuffle by doc: tokens in position order; each position's
  *     L-gram is built with a `lead` chain inside ONE window pass (no
  *     per-row HOF, no token-array blowup) and fingerprinted to 8 bytes
  *     ([[TextFunctions.polyHash64]]) — the shuffle that follows carries
  *     (doc, pos, fp), never gram strings;
  *  2. one aggregation by fingerprint + a semi-join back marks
  *     duplicated start positions (map-side combine bounds the
  *     fingerprint shuffle at distinct-gram cardinality);
  *  3. per doc, covered tokens fall out of a BOUNDED rows-frame window
  *     (a token is covered iff some duplicated start lies within the
  *     last L rows) — no interval join, no explode-by-L blowup;
  *  4. the cleaned text is re-joined in position order.
  *
  * 64-bit fingerprints stand in for gram equality (the [[TextDedup]]
  * trade); a collision merges two gram families and can only OVER-cut.
  * Scale: every stage is linear in corpus tokens with two shuffles
  * total (by doc, by fingerprint) — no suffix array, no global sort.
  */
object SubstringDedup {

  /** Merged duplicated spans per document: (doc, span_start, span_end)
    * with `span_end` exclusive, token-indexed from 0; adjacent and
    * overlapping spans coalesce. Documents with no duplicated span are
    * absent.
    */
  def duplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame = {
    val starts = dupStarts(docs, idCol, textCol, minLen)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevMaxEnd = max(col("pos") + minLen)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val island = when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1)
      .otherwise(0)
    starts
      .withColumn("grp", sum(island).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + minLen).as("span_end"))
      .drop("grp")
  }

  /** Cut every duplicated span, keeping surviving tokens in order:
    * (doc, n_tokens, n_removed, cleaned) — `cleaned` single-space
    * joined, empty when the whole document was duplicated boilerplate.
    * Removal is ALL-occurrences (the released deduplicate-text-datasets
    * tool's semantics): a span that appears twice vanishes from both
    * documents — downstream doc-level dedup is the keep-one tier.
    */
  def removeDuplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame = {
    val toks = tokenized(docs, idCol, textCol)
    val starts = dupStarts(docs, idCol, textCol, minLen)
      .withColumn("dup_start", lit(true))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val covered = max(when(col("dup_start"), col("pos")))
      .over(w.rowsBetween(-(minLen - 1), 0)).isNotNull
    toks
      .join(starts, Seq(idCol, "pos"), "left")
      .withColumn("covered", covered)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("covered"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("covered"), struct(col("pos"), col("term"))))),
            x => x.getField("term")),
          " ").as("cleaned"))
  }

  /** (doc, pos, term) in position order — one posexplode, no shuffle
    * until a window asks for doc partitioning.
    */
  private def tokenized(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))

  /** Positions whose L-gram occurs >= 2 times corpus-wide: (doc, pos).
    * The gram is assembled with a lead-chain inside the per-doc window
    * (stays in codegen) and reduced to its 64-bit fingerprint before
    * anything shuffles by gram.
    */
  private def dupStarts(
      docs: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val gramCols = col("term") +:
      (1 until minLen).map(j => lead(col("term"), j).over(w))
    val grams = tokenized(docs, idCol, textCol)
      .withColumn("last_tok", gramCols.last)
      .withColumn("fp",
        TextFunctions.polyHash64(concat_ws(" ", gramCols: _*)))
      // a full L-gram exists only where the last lead resolved
      .filter(col("last_tok").isNotNull)
      .select(col(idCol), col("pos"), col("fp"))
    val dup = grams.groupBy(col("fp"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .select(col("fp"))
    grams.join(dup, Seq("fp"), "left_semi").select(col(idCol), col("pos"))
  }
}
