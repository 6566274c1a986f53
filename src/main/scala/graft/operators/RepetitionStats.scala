package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Gopher/MassiveText repetition signals (Rae et al. 2021,
  * arXiv:2112.11446 §A1.1 — the "repetitious text" quality family the
  * C4/Gopher/Dolma pipelines all apply before training): per-document
  * duplicate-LINE and duplicate-PARAGRAPH fractions (by unit count and
  * by character mass) and the top word-n-gram character fraction. A
  * document whose text is largely one repeated boilerplate line (nav
  * bars, cookie walls, SEO keyword stuffing) scores high on all of
  * them and is dropped by [[gopherRepetitionFilter]]'s thresholds
  * (Gopher's own: 0.30 dup-line / dup-paragraph, 0.20 dup-line-chars,
  * 0.20 top-2-gram chars, 0.18 top-3-gram chars).
  *
  * Scale shape: every aggregation keys on (doc id, unit fingerprint)
  * then folds to the doc id — the corpus shuffles only on per-document
  * keys, nothing global, no cross-document state (the signals are
  * pure per-document functions, unlike the dedup family). Units
  * shuffle as `xxhash64` fingerprints + a length, never strings (the
  * house fingerprint diet; the q126 oracle replays the STRING
  * formulation in DuckDB, re-proving the equivalence every round).
  * The duplicate-count fraction alone would be map-only
  * (`1 − size(array_distinct(units))/size(units)`), but the char-mass
  * twin needs per-unit counts anyway, so both ride one grouped pass.
  *
  * Definition pinned for the top-n-gram signal: the fraction of the
  * document's characters covered by the duplicated n-gram with the
  * LARGEST character coverage, i.e. `max(count·len(gram))/len(text)`
  * (Gopher's prose says "most frequently-occurring n-gram"; taking
  * the max of the count×length product is deterministic under count
  * ties and measures the same boilerplate mass).
  */
object RepetitionStats {

  private def trimmedUnits(text: Column, sep: String): Column =
    filter(transform(split(text, sep), l => trim(l)), l => l =!= "")

  /** Per-(doc, unit-family) duplicate fractions from one explode +
    * count: (dup count fraction, dup char fraction).
    */
  private def dupFractions(
      docs: DataFrame, idCol: String, units: Column,
      cntName: String, charName: String): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(units).as("__u"))
      .select(col(idCol), xxhash64(col("__u")).as("__fp"),
        length(col("__u")).as("__len"))
    exploded
      .groupBy(col(idCol), col("__fp"))
      .agg(count(lit(1)).as("__c"), first(col("__len")).as("__len"))
      .groupBy(col(idCol))
      .agg(
        (lit(1.0) - count(lit(1)) / sum(col("__c"))).as(cntName),
        (sum(when(col("__c") > 1, col("__c") * col("__len")).otherwise(0L)) /
          sum(col("__c") * col("__len"))).as(charName))
  }

  /** Per-(doc, n-gram) top duplicated-gram character coverage:
    * max(count × gram length) over grams occurring ≥ 2 times, 0.0 when
    * none repeats.
    */
  private def topGramCoverage(
      docs: DataFrame, idCol: String, textCol: String, n: Int,
      outName: String): DataFrame = {
    // materialize the token array as an ATTRIBUTE before the index HOF:
    // a lambda over the raw split(...) tree re-evaluates the tokenizer
    // per element access (the round-9 HOF quadratic)
    val toks = docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), filter(col("__t"), t => t =!= "").as("__t"))
    // guard short docs: sequence(0, negative) would DESCEND and feed
    // slice an index 0; an empty array explodes to no rows instead
    val gramArr = when(size(col("__t")) >= n,
      transform(sequence(lit(0), size(col("__t")) - n),
        i => concat_ws(" ", slice(col("__t"), i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val grams = toks.select(col(idCol), explode(gramArr).as("__g"))
    grams
      .select(col(idCol), xxhash64(col("__g")).as("__fp"),
        length(col("__g")).as("__len"))
      .groupBy(col(idCol), col("__fp"))
      .agg(count(lit(1)).as("__c"), first(col("__len")).as("__len"))
      .groupBy(col(idCol))
      .agg(coalesce(
        max(when(col("__c") > 1, col("__c") * col("__len"))), lit(0L))
        .as(outName))
  }

  /** The per-document signal frame: doc id + five repetition fractions,
    * each in [0, 1]; documents with no lines/tokens score 0 everywhere.
    * Column set: dup_line_frac, dup_line_char_frac, dup_para_frac,
    * top_2gram_char_frac, top_3gram_char_frac.
    */
  def gopherStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol),
      length(col(textCol)).as("__chars"))
    val lineF = dupFractions(docs, idCol,
      trimmedUnits(col(textCol), "\n"), "dup_line_frac", "dup_line_char_frac")
    val paraF = dupFractions(docs, idCol,
      trimmedUnits(col(textCol), "\\n{2,}"), "dup_para_frac", "__para_chars")
    val g2 = topGramCoverage(docs, idCol, textCol, 2, "__g2")
    val g3 = topGramCoverage(docs, idCol, textCol, 3, "__g3")
    base
      .join(lineF, Seq(idCol), "left")
      .join(paraF.drop("__para_chars"), Seq(idCol), "left")
      .join(g2, Seq(idCol), "left")
      .join(g3, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
        coalesce(col("dup_line_char_frac"), lit(0.0)).as("dup_line_char_frac"),
        coalesce(col("dup_para_frac"), lit(0.0)).as("dup_para_frac"),
        coalesce(col("__g2") / col("__chars"), lit(0.0)).as("top_2gram_char_frac"),
        coalesce(col("__g3") / col("__chars"), lit(0.0)).as("top_3gram_char_frac"))
  }

  /** Gopher's repetition thresholds as a keep-filter: the surviving
    * documents joined back by id (left-semi — the text never rides
    * through the stats aggregation).
    */
  def gopherRepetitionFilter(
      docs: DataFrame, idCol: String, textCol: String,
      maxDupLine: Double = 0.30,
      maxDupLineChar: Double = 0.20,
      maxDupPara: Double = 0.30,
      maxTop2: Double = 0.20,
      maxTop3: Double = 0.18): DataFrame = {
    val keep = gopherStats(docs, idCol, textCol)
      .filter(col("dup_line_frac") <= maxDupLine &&
        col("dup_line_char_frac") <= maxDupLineChar &&
        col("dup_para_frac") <= maxDupPara &&
        col("top_2gram_char_frac") <= maxTop2 &&
        col("top_3gram_char_frac") <= maxTop3)
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }
}
