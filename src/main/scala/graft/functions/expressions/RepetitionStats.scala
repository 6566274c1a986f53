package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition quality signals (Rae et al. 2021, table A1) for
  * one document, computed natively in a single pass:
  *
  *   - `dup_line_frac`: fraction of lines ('\n'-split, raw case) that are
  *     repeats of an earlier line — `(|lines| - |distinct lines|) / |lines|`.
  *   - `dup_line_char_frac`: fraction of line characters contained in the
  *     occurrences BEYOND each line's first —
  *     `(Σ len(line) - Σ len(distinct line)) / Σ len(line)`. (The "excess
  *     occurrence" formulation: O(lines) and insensitive to how overlap
  *     between duplicates is attributed.)
  *   - `top_gram_char_frac`: over word `topN`-grams (tokens =
  *     whitespace-split of the lowercased text, Spark `split` semantics
  *     with limit -1), the best char coverage any single REPEATED gram
  *     achieves: `max_{g: count(g)>1} count(g)·len(g) / len(text)`, 0 when
  *     no gram repeats. Max-coverage (not "coverage of the most frequent
  *     gram") removes the tie-break ambiguity between equally-frequent
  *     grams of different lengths; restricting to count>1 keeps it a pure
  *     repetition signal — a repetition-free document scores 0 instead of
  *     len(longest adjacent pair)/len(text), which for short documents
  *     sits above any useful threshold.
  *   - `dup_gram_char_frac`: total char coverage of repeated `dupN`-grams:
  *     `Σ_{g: count(g)>1} count(g)·len(g) / len(text)`. Overlapping
  *     occurrences are each counted, so the ratio can exceed 1 on
  *     degenerate inputs — it is a repetition signal, not a probability.
  *
  * All four are exactly replayable in DuckDB list/lambda SQL (see the
  * q73_repetition_quality oracle), which is why the denominators and
  * duplicate-attribution rules above are pinned so precisely.
  *
  * One expression rather than four so the tokenizer and gram count maps run
  * once per row; the interpreted-HOF alternative re-splits the text per
  * lambda element and cannot enter whole-stage codegen (see WordNGrams).
  */
case class RepetitionStats(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression {
  require(topN >= 1 && dupN >= 1, "gram sizes must be >= 1")

  override def dataType: DataType = RepetitionStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires a string input, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String], topN, dupN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RepetitionStats.compute($c, $topN, $dupN)")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_gram_char_frac", DoubleType, nullable = false),
    StructField("dup_gram_char_frac", DoubleType, nullable = false)))

  /** count(g)·len(g) folded over the gram multiset of `toks`; `top` picks
    * max coverage, otherwise sums coverage of grams with count > 1.
    */
  private def gramCoverage(toks: Array[String], n: Int, top: Boolean): Long = {
    if (toks.length < n) return 0L
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      counts.merge(sb.toString, 1, Integer.sum)
      i += 1
    }
    var acc = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) { // both signals measure REPEATED grams only
        val cov = e.getValue.toLong * cpLen(e.getKey)
        if (top) { if (cov > acc) acc = cov }
        else acc += cov
      }
    }
    acc
  }

  /** Code points, matching Spark's `length()` / DuckDB's `length()` (Java
    * String.length counts UTF-16 units and diverges on non-BMP input).
    */
  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  def compute(text: UTF8String, topN: Int, dupN: Int): InternalRow = {
    val s = text.toString
    // line stats — raw case, limit -1 so trailing empties survive exactly
    // as in Spark's split / DuckDB's string_split
    val lines = s.split("\n", -1)
    var totalLineChars = 0L
    lines.foreach(l => totalLineChars += cpLen(l))
    val seen = new java.util.HashSet[String]()
    var distinctCount = 0
    var distinctChars = 0L
    lines.foreach { l =>
      if (seen.add(l)) { distinctCount += 1; distinctChars += cpLen(l) }
    }
    val dupLineFrac =
      if (lines.length == 0) 0.0
      else (lines.length - distinctCount).toDouble / lines.length
    val dupLineCharFrac =
      if (totalLineChars == 0L) 0.0
      else (totalLineChars - distinctChars).toDouble / totalLineChars

    // UTF8String.toLowerCase = Spark's lower(): locale-independent, unlike
    // java.lang.String.toLowerCase under e.g. a Turkish default locale
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val denom = text.numChars()
    val topFrac =
      if (denom == 0) 0.0 else gramCoverage(toks, topN, top = true).toDouble / denom
    val dupFrac =
      if (denom == 0) 0.0 else gramCoverage(toks, dupN, top = false).toDouble / denom

    new GenericInternalRow(
      Array[Any](dupLineFrac, dupLineCharFrac, topFrac, dupFrac))
  }
}
