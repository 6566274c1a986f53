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
}
