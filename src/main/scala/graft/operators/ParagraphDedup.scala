package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level deduplication (the C4/RefinedWeb "remove
  * repeated boilerplate passages" pass): every paragraph that occurs in
  * more than one place is kept ONLY at its first occurrence — ordered by
  * (doc_id, position) — and documents are reassembled from their
  * surviving paragraphs.
  *
  * Scale shape — two linear shuffles, no windows over hot keys:
  *
  *   1. posexplode paragraphs → groupBy(paragraph) with
  *      `min(struct(doc, pos))` — a partial-aggregable MIN, so a
  *      boilerplate paragraph occurring 10^9 times collapses map-side
  *      instead of sorting one giant window partition (the row_number
  *      formulation the DuckDB oracle uses would do exactly that);
  *   2. join the winners back on (paragraph, doc, pos) — equi-join keyed
  *      by the same paragraph hash, exchange reused — then
  *      groupBy(doc) re-assembles surviving paragraphs in position order.
  *
  * Documents whose every paragraph was claimed elsewhere come back with
  * an empty `clean_text` and `n_paras_kept = 0` (callers gate on it).
  */
object ParagraphDedup {

  /** @param paraSep separator that bounds paragraphs in `textCol`
    * @return (idCol, clean_text, n_paras_in, n_paras_kept)
    */
  def dedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      paraSep: String = "\n\n"): DataFrame = {
    val exploded = df
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(paraSep)))
          .as(Seq("pos", "para")))
      .withColumn("para", trim(col("para")))

    // renamed winner columns break the self-join lineage ambiguity
    val firstSeen = exploded
      .groupBy(col("para"))
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
      .select(col("para").as("__wpara"), col(s"w.$idCol").as("__wid"),
        col("w.pos").as("__wpos"))

    val survivors = exploded.join(firstSeen,
      col("para") === col("__wpara") &&
        col(idCol) === col("__wid") && col("pos") === col("__wpos"))
      .select(col(idCol), col("pos"), col("para"))

    val counts = exploded.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_paras_in"))

    survivors
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("para")))),
            s => s("para")),
          paraSep).as("clean_text"),
        count(lit(1)).as("n_paras_kept"))
      .join(counts, Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_paras_in"),
        coalesce(col("n_paras_kept"), lit(0L)).as("n_paras_kept"))
  }

  // ---- Paragraph scrub against a persisted history -----------------------

  /** The distinct normalized paragraph fingerprints of a corpus — the
    * HISTORY STORE for [[scrubSeenParagraphs]] (one `fp` long column;
    * ~8 bytes per distinct paragraph, billions of rows stay joinable).
    * Maintain it like the exact-dedup store: union each ingested batch's
    * fps back in.
    */
  def paragraphFps(
      df: DataFrame, textCol: String, paraSep: String = "\n\n"): DataFrame =
    df.select(
        explode(split(col(textCol), java.util.regex.Pattern.quote(paraSep)))
          .as("para"))
      .select(graft.functions.TextFunctions
        .normalizedFingerprint(trim(col("para"))).as("fp"))
      .distinct()

  /** Strip from every batch document each paragraph the HISTORY has
    * already seen — the paragraph-granular dedup-against-history pass
    * (the Dolma/BFF shape: dedup a new crawl's boilerplate against the
    * accumulated corpus, keeping the rest of each document). EXACT, via
    * the [[graft.operators.TextDedup.dedupAgainstHistoryBloom]]
    * discipline: every batch paragraph probes the history Bloom filter
    * map-side; bloom-NEGATIVE paragraphs are definitely unseen and skip
    * the history entirely; the bloom-positive candidates (batch-bounded)
    * broadcast against the fingerprint store, which is scanned once and
    * never shuffles. Documents reassemble from surviving paragraphs in
    * position order; a fully-scrubbed document comes back with empty
    * `clean_text` and `n_paras_kept = 0` (callers gate on it).
    *
    * @param store [[paragraphFps]]-shaped history store (one long col)
    * @return (idCol, clean_text, n_paras_in, n_paras_kept)
    */
  def scrubSeenParagraphs(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      store: DataFrame,
      bloomBytes: Array[Byte],
      paraSep: String = "\n\n"): DataFrame = {
    val fpCol = store.columns.head
    val exploded = batch
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(paraSep)))
          .as(Seq("pos", "para")))
      .withColumn("para", trim(col("para")))
      .withColumn("__fp",
        graft.functions.TextFunctions.normalizedFingerprint(col("para")))
    val probe = graft.operators.BloomJoin.mightContain(bloomBytes, col("__fp"))
    val candidates = exploded.filter(probe)
    val seen = store.join(
      broadcast(candidates.select(col("__fp").as(fpCol)).distinct()),
      Seq(fpCol), "left_semi")
    // ONE pass over the exploded batch: mark each paragraph seen/unseen
    // with a broadcast left join against the confirmed-seen set
    // (bloom-negative fps cannot be in `seen` — seen ⊆ the bloom-positive
    // candidates — so the mark equals the old negatives ∪ confirmedUnseen
    // routing), then compute kept-text AND the total paragraph count in
    // ONE aggregation. The previous formulation re-evaluated the
    // explode+fingerprint scan once per branch (4×) and paid two
    // groupBy shuffles plus a join to reunite them (guide §2.3/§2.4).
    // distinct: a caller-supplied store with duplicate fps must not fan
    // the left join out (the old semi/anti routing was fanout-immune)
    val marked = exploded.join(
      broadcast(seen.select(col(fpCol).as("__fp")).distinct()
        .withColumn("__seen", lit(true))),
      Seq("__fp"), "left")
    marked
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(
            when(col("__seen").isNull, struct(col("pos"), col("para"))))),
            s => s("para")),
          paraSep).as("clean_text"),
        count(lit(1)).as("n_paras_in"),
        count(when(col("__seen").isNull, lit(1))).as("n_paras_kept"))
      .select(col(idCol), col("clean_text"), col("n_paras_in"),
        col("n_paras_kept"))
  }
}
