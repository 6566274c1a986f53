package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level corpus cleaning (Raffel et al. 2020 §2.2: drop
  * short/boilerplate lines, then drop documents left with too little):
  * each document's lines are filtered by a word-count floor and a
  * bad-substring blocklist, surviving lines are rejoined, and the
  * document keeps a boolean gate (enough lines survived).
  *
  * Deliberately ZERO-shuffle: line filtering is per-document work, so it
  * runs as one projection over the scan — `split` → `filter` →
  * `array_join` higher-order functions, no explode/groupBy round trip.
  * At 100 TB that is the difference between a map-only pass and shuffling
  * the whole corpus once; the per-line predicates here are a handful of
  * comparisons, nowhere near the interpreted-HOF regime that forced
  * QuantileBucket/PolyFold native (those were ~500 evals/row — see
  * SCALING.md §4).
  */
object C4Filter {

  /** @param lineSep   line separator to split on
    * @param minWords  a line survives only with at least this many
    *                  whitespace words
    * @param blocklist a line containing ANY of these substrings is dropped
    *                  (C4 drops "lorem ipsum"/"{" lines; callers pass
    *                  corpus-appropriate markers)
    * @param minLines  a document keeps `keep = true` only if at least this
    *                  many lines survive
    * @return idCols ++ (clean_text, n_lines_in, n_lines_kept, keep)
    */
  def cleanLines(
      df: DataFrame,
      textCol: String,
      idCols: Seq[String],
      lineSep: String = "\n",
      minWords: Int = 5,
      blocklist: Seq[String] = Seq("lorem ipsum", "{"),
      minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(lineSep))
    def lineKeep(l: Column): Column = {
      val enoughWords = size(split(trim(l), "\\s+")) >= minWords
      val blocked = blocklist.map(b => contains(l, lit(b)))
        .reduceOption(_ || _).getOrElse(lit(false))
      enoughWords && !blocked
    }
    val kept = filter(lines, lineKeep _)
    df.select(idCols.map(col) ++ Seq(
      array_join(kept, lineSep).as("clean_text"),
      size(lines).as("n_lines_in"),
      size(kept).as("n_lines_kept"),
      (size(kept) >= minLines).as("keep")): _*)
  }
}
