package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
  * top-`nMerges` byte-pair merges of a corpus by iterated
  * most-frequent-adjacent-pair merging.
  *
  * Scale shape — the reason BPE training is feasible at 100 TB: the
  * corpus is touched ONCE, by the word-frequency aggregation (explode +
  * groupBy, map-side partials). Every merge round after that runs on the
  * VOCABULARY-sized (word, freq, seg) frame — bounded like q77's vocab,
  * not corpus-sized — with one pair-count aggregation and one 1-row
  * argmax collect per round (the merge decision is inherently sequential;
  * 1 row per round to the driver is the minimum coordination, same
  * contract as IvfAnn's centroid pull). Each round's frame is
  * localCheckpointed so plan size stays constant in `nMerges`.
  *
  * Replay contract: a word's segmentation is represented as a
  * space-joined STRING (`"k e y"`), and a merge (l, r) is applied as the
  * literal replace `" l r " → " lr "` over the space-padded form — a
  * left-to-right, non-overlapping scan with IDENTICAL semantics in
  * Spark's UTF8String.replace and DuckDB's replace(), which is what
  * makes the q88 oracle able to replay whole training rounds
  * bit-for-bit. One DOCUMENTED variant vs canonical (HuggingFace)
  * greedy application: because a match consumes its boundary spaces, a
  * run of the same token (`a a a a`) merges at (1,2) and then skips
  * (3,4) — runs of identical tokens merge sparser than the canonical
  * scan. Pair COUNTING (all adjacent occurrences) and everything else
  * match the standard algorithm; natural-language vocabularies hit the
  * run case only on repeated-character words. Ties on pair frequency
  * break by the lexicographically smallest pair string (both engines
  * compare ASCII binary), so the learned merge list is fully
  * deterministic.
  */
object BpeTrain {

  /** @return one row per learned merge: (rank, pair "l r", merged "lr",
    *         freq at selection time), rank ascending. Stops early if the
    *         vocabulary runs out of adjacent pairs.
    */
  def train(
      corpus: DataFrame,
      textCol: String,
      nMerges: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // the ONE corpus-sized pass: word frequencies
    val wf = corpus
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

    // initial segmentation: characters joined by ' '
    var segs = wf.select(col("word"), col("freq"),
      array_join(split(col("word"), ""), " ").as("seg"))
      .localCheckpoint(true)

    // bindArray: the lambda would otherwise re-split `seg` per element
    // access (HOFs have no subexpression elimination) — O(len²) per word
    def adjacentPairs(seg: Column): Column =
      graft.functions.TextFunctions.bindArray(split(seg, " ")) { toks =>
        val n = size(toks)
        // sequence(1, 0) would yield a DESCENDING [1, 0] — guard 1-token segs
        val idx = when(n > 1, sequence(lit(1), n - 1)).otherwise(array())
        transform(idx, i =>
          concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))
      }

    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    // Lazy per-round checkpoints: each round is inherently sequential (the
    // next replace needs the chosen pair), but the EAGER checkpoint paid a
    // dedicated materialization job per round on top of the top-pair job —
    // 2 jobs/merge. Marking the round's segs as a lazy localCheckpoint
    // lets the NEXT round's top-pair aggregation materialize it as a side
    // effect: 1 job/merge, same constant-size plan. The parent is only
    // unpersisted AFTER an action ran on the child (the child's blocks
    // exist by then — unpersisting earlier would strand a lazy checkpoint
    // whose lineage was already truncated at the parent).
    var prev: DataFrame = null
    while (rank <= nMerges && !exhausted) {
      val top = segs
        .select(explode(adjacentPairs(col("seg"))).as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("pair").asc)
        .limit(1).collect()
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val f = top(0).getLong(1)
        val merged = pair.replace(" ", "")
        learned += ((rank, pair, merged, f))
        val next = segs.withColumn("seg",
          trim(replace(concat(lit(" "), col("seg"), lit(" ")),
            lit(s" $pair "), lit(s" $merged "))))
          .localCheckpoint(false)
        prev = segs
        segs = next
        rank += 1
      }
    }
    if (prev != null) prev.unpersist()
    segs.unpersist()
    learned.toSeq.toDF("rank", "pair", "merged", "freq")
  }

  /** Segment `textCol` with an already-learned merge list (rank order) —
    * the apply side of the tokenizer. Returns the input plus
    * `tokens: array<string>`.
    */
  def segment(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    def segWord(w: Column): Column = {
      val s0 = array_join(split(w, ""), " ")
      val sN = merges.foldLeft(s0) { case (seg, (pair, merged)) =>
        trim(replace(concat(lit(" "), seg, lit(" ")),
          lit(s" $pair "), lit(s" $merged ")))
      }
      split(sN, " ")
    }
    df.withColumn("tokens",
      flatten(transform(split(lower(col(textCol)), "\\s+"), segWord _)))
  }
}
