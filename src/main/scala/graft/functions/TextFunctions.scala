package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting. All pure Catalyst `Column` expressions (no UDFs) — they
  * stay inside whole-stage codegen and run at scan speed; every one is also
  * expressible in ANSI-ish SQL so the DuckDB oracle can replay it.
  */
object TextFunctions {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, and single
    * punctuation marks each count as one token — the shape of a byte-pair
    * pre-tokenizer's word-splitting regex.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-grams over the token list, joined with single spaces, distinct
    * (first-occurrence order); empty array when the text is shorter than n.
    * Native codegen'd expression — see expressions.WordNGrams for why the
    * HOF formulation (kept below as the executable spec) is disqualifying
    * at scale.
    */
  def wordNGrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.WordNGrams(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Declarative formulation of `wordNGrams` — interpreted and
    * O(tokens²) per row; for tests/cross-checks only.
    */
  def wordNGramsHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // guard: sequence(0, negative) counts DOWN in Spark, so short texts
    // must short-circuit to an empty array instead
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** |A ∩ B| / |A ∪ B| over two DISTINCT element arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(a) === 0 && size(b) === 0, lit(1.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  // ---- quality scoring --------------------------------------------------

  def charCount(text: Column): Column = length(text)

  /** Fraction of characters that are letters. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))

  /** Fraction of characters that are punctuation (not letter/digit/space). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") / length(text))

  /** One-pass token count + per-word-set hit counts (native; see
    * expressions.TokenSetHits for why the filter/array_contains HOF
    * formulation is disqualifying at scale).
    */
  private def tokenSetHits(text: Column, sets: Seq[Seq[String]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.TokenSetHits(
        org.apache.spark.sql.GraftColumnBridge.expression(text), sets))

  /** Fraction of tokens found in `words` (duplicates counted). */
  def wordListRatio(text: Column, words: Seq[String]): Column = {
    val h = tokenSetHits(text, Seq(words))
    val n = h.getField("n_tokens")
    when(n === 0, lit(0.0))
      .otherwise(h.getField("hits").getItem(0).cast("double") / n)
  }

  /** Declarative formulation of `wordListRatio` — interpreted lambda, one
    * extra tokenization per call; tests/cross-checks only.
    */
  def wordListRatioHof(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
    when(size(toks) === 0, lit(0.0)).otherwise(hits.cast("double") / size(toks))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Composite [0,1] quality heuristic: mostly-alphabetic text, little
    * punctuation, reasonable length, some stopword glue. Weights are fixed
    * so the score is deterministic and oracle-replayable.
    */
  def qualityScore(text: Column): Column = {
    // one tokenization pass serves both the length and stopword terms
    val h = tokenSetHits(text, Seq(EnglishStopwords))
    val n = h.getField("n_tokens")
    val stopRatio = when(n === 0, lit(0.0))
      .otherwise(h.getField("hits").getItem(0).cast("double") / n)
    round(
      alphaRatio(text) * 0.4
        + (lit(1.0) - punctRatio(text)) * 0.2
        + least(n.cast("double") / 50.0, lit(1.0)) * 0.2
        + least(stopRatio * 5.0, lit(1.0)) * 0.2,
      4)
  }

  // ---- language ID ------------------------------------------------------

  /** Marker words per language for the n-gram/stopword-hit heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "est"),
    "zh" -> Seq("的", "了", "是", "在", "和", "有"))

  /** Language with the most marker-word hits; ties break in the fixed
    * (alphabetical) marker order; no hits at all → "und".
    */
  def langId(text: Column): Column = {
    // all five marker sets counted in ONE tokenization pass
    val h = tokenSetHits(text, LangMarkers.map(_._2))
    val scores = LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> h.getField("hits").getItem(i)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(best > 0 && s === best, lit(lang)).otherwise(els)
    }
  }

  // ---- fingerprinting ---------------------------------------------------

  val FingerprintMod = 1000000007L

  /** Rolling polynomial hash of the raw text, base 31 mod 1e9+7 — the
    * classic content fingerprint, a native code-point fold inside codegen
    * (see expressions.PolyFold). Oracle-replayable (pure integer
    * arithmetic, no engine hash).
    */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.PolyFold(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        31L, FingerprintMod))

  /** Declarative formulation of `fingerprint` — materializes a per-char
    * array and folds interpreted; tests/cross-checks only.
    */
  def fingerprintHof(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (h, c) => (h * 31 + ascii(c)) % FingerprintMod)

  /** Fingerprint of the whitespace-normalized lowercase text — equal for
    * near-identical docs differing only in case/whitespace.
    */
  def normalizedFingerprint(text: Column): Column =
    fingerprint(normalizeText(text))

  /** Lowercase, trim, collapse internal whitespace. */
  def normalizeText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  // ---- PII scrubbing ------------------------------------------------------
  // Patterns stay inside the Java-regex ∩ RE2 common subset (no lookaround,
  // no backreferences) so the same literal replays in other engines, and
  // the scrub remains a codegen'd narrow map — at 100 TB, scrubbing is a
  // scan, never a shuffle.

  /** Email addresses (conservative RFC-ish shape). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-like shapes only, three alternatives:
    *   1. international undelimited (`+` then 7–15 digits — the `+` is
    *      the phone signal);
    *   2. `+`-prefixed GROUPED (`+49 30 901820`) — the `+` again carries
    *      the signal, so the group shapes stay permissive;
    *   3. bare grouped: 1–3 digit prefix then `-`/space-delimited groups
    *      where the MIDDLE group needs 3–4 digits. That middle-group
    *      floor is what keeps every day-of-month date shape out: ISO
    *      dates (2024-01-01) already failed the old pattern, but US-style
    *      MM-DD-YYYY (12-31-2024) matched it — days never exceed 2
    *      digits, so demanding 3+ in the middle rejects 12-31-2024 while
    *      keeping 555-123-4567 and 1-234-5678. (No lookahead allowed in
    *      the Java∩RE2 subset, so the alternative fix — "final 4-digit
    *      group only with more groups" — can't be expressed without
    *      partial-match artifacts.) Bare order ids (12345678: no
    *      separators) stay out; the cost, as before, is that undelimited
    *      domestic numbers ("5551234567") and short-grouped numbers with
    *      a 2-digit middle ("12 34 567") are deliberately left alone.
    * Non-capturing groups keep regexp_extract_all(…, 0) = the full match
    * in both Java regex and RE2.
    */
  val PhonePattern =
    "\\+[0-9]{7,15}" +
      "|\\+[0-9]{1,3}[- ][0-9]{2,4}[- ][0-9]{1,6}(?:[- ][0-9]{1,4})?" +
      "|[0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{3,4}(?:[- ][0-9]{1,4})?"

  /** Redact emails first (their local parts contain digits a phone pattern
    * could eat), then phone-like runs. Counting redactions must follow the
    * same order: emails on the raw text, phones on the email-scrubbed text.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
      lit(PhonePattern), lit("<PHONE>"))

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(
      regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
      lit(PhonePattern), lit(0)))

  // ---- chunking / normalization -----------------------------------------

  /** Overlapping fixed-size token chunks — the LLM pre-training document
    * splitter: chunk i covers tokens [i·stride, i·stride + chunkSize);
    * ceil(n/stride) chunks, the last possibly short. Returns
    * array<struct<chunk_idx, chunk_text, n_tokens>> — explode for one row
    * per chunk. Narrow map, no shuffle; at 100 TB chunking is a scan.
    */
  def tokenChunks(text: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      "tokenChunks: need 1 <= stride <= chunkSize (stride > chunkSize drops tokens)")
    bindArray(tokens(text)) { toks =>
      val nChunks = ceil(size(toks).cast("double") / stride).cast("int")
      transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1), i =>
        struct(
          i.cast("long").as("chunk_idx"),
          concat_ws(" ", slice(toks, i * stride + 1, lit(chunkSize))).as("chunk_text"),
          least(size(toks) - i * stride, lit(chunkSize)).as("n_tokens")))
    }
  }

  /** Evaluate `arr` ONCE per row and hand it to `body` as a lambda
    * VARIABLE: higher-order functions are CodegenFallback with no
    * subexpression elimination, so a lambda body that references a
    * computed array expression (e.g. `split(...)`) re-evaluates it on
    * every element ACCESS — O(n²) per row for a per-element reference.
    * Binding through a one-element transform makes each access O(1).
    * (Lambda bodies referencing plain column ATTRIBUTES are already
    * fine — attributes read the row, they don't recompute.)
    */
  def bindArray(arr: Column)(body: Column => Column): Column =
    element_at(transform(array(arr), body), 1)

  /** Tokens with immediate repeats collapsed ("the the" → "the") — cheap
    * stutter/boilerplate normalization ahead of dedup.
    */
  def collapsedTokens(text: Column): Column =
    bindArray(tokens(text)) { toks =>
      filter(toks, (t, i) => i === 0 || t =!= element_at(toks, i))
    }

  def collapseRepeats(text: Column): Column =
    concat_ws(" ", collapsedTokens(text))

  /** SQL-replayable 64-bit string hash (four packed 16-bit polynomial
    * parts) — see expressions.PolyHash64. Drop-in `baseHash` for the
    * signature operators when the run must be verifiable by an external
    * SQL engine; xxhash64 remains the default elsewhere.
    */
  def polyHash64(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.PolyHash64(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Declarative formulation of `polyHash64` (interpreted HOF fold per
    * part) — tests/cross-checks only.
    */
  def polyHash64Hof(text: Column): Column =
    graft.functions.expressions.PolyHash64.Parts.zipWithIndex.map {
      case ((base, p), i) =>
        shiftleft(
          aggregate(split(text, ""), lit(0L),
            (h, c) => (h * base + ascii(c)) % p),
          i * 16)
    }.reduce(_ bitwiseOR _)

  /** Gopher-style repetition signals as one struct column
    * `(dup_line_frac, dup_line_char_frac, top_gram_char_frac,
    * dup_gram_char_frac)` — single native pass per document; see
    * expressions.RepetitionStats for the pinned semantics.
    */
  def repetitionStats(text: Column, topN: Int = 2, dupN: Int = 3): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.RepetitionStats(
        org.apache.spark.sql.GraftColumnBridge.expression(text), topN, dupN))

  /** Gopher-style repetition gate: true ⇢ the document's repetition
    * signals are all under their thresholds and it should be KEPT.
    * Thresholds follow Rae et al. 2021 table A1 (dup line ≤ 0.30,
    * dup line chars ≤ 0.20, top 2-gram coverage ≤ 0.20, duplicated
    * 3-gram coverage ≤ 0.60 — the last relaxed vs the paper's n≥5 tiers
    * because coverage for short grams is structurally higher).
    */
  def repetitionKeep(stats: Column): Column =
    stats.getField("dup_line_frac") <= 0.30 &&
      stats.getField("dup_line_char_frac") <= 0.20 &&
      stats.getField("top_gram_char_frac") <= 0.20 &&
      stats.getField("dup_gram_char_frac") <= 0.60
}
