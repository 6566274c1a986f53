package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators._

/** End-to-end training-data curation: the composition proof that the
  * operator library actually chains into the pipeline a 100 TB pretraining
  * corpus needs — each stage is one of the independently oracle-checked
  * operators, plumbed output-to-input:
  *
  *   1. line hygiene    — [[C4Filter]] (zero-shuffle line + doc gates)
  *   2. paragraph dedup — [[ParagraphDedup]] (corpus-wide first-occurrence)
  *   3. exact dedup     — [[TextDedup.exactDedup]] (normalized fingerprint)
  *   3c. near-dup       — optional [[TextDedup.minHashDedupPairs]] →
  *                        [[Components.dedupClustersKeepBest]]: the
  *                        100-TB LSH→components path (q138) with the
  *                        FineWeb keep-best-quality retention (q133);
  *                        off by default — the threshold is corpus policy
  *   4. decontamination — [[TextDedup.decontaminate]] against an optional
  *                        held-out benchmark set (n-gram leakage; the
  *                        embedding tier is [[Ann.decontaminateByEmbedding]]
  *                        when the corpus carries vectors)
  *   5. quality gates   — [[graft.functions.expressions.RepetitionStats]]
  *                        keep-gate + [[LmScore]] bottom-percentile cut
  *   6. mixture         — optional [[MixtureSample.toTemperature]] (T5
  *                        c^alpha re-balancing over a grouping column)
  *   7. shard layout    — [[ShardLayout]] (seeded deterministic shuffle)
  *   8. tokenizer       — [[BpeTrain]] over the SURVIVING corpus
  *
  * Every stage is linear or candidate-bounded (see each operator's
  * scaladoc); the pipeline inherits determinism end-to-end — two runs
  * produce byte-identical shards and merge tables.
  *
  * Returns per-stage survivor counts alongside the artifacts, so the
  * funnel itself is observable (the "no silent caps" rule).
  */
object CurationPipeline {

  final case class Result(
      corpus: DataFrame,      // surviving (doc_id, text) + shard + pos
      merges: DataFrame,      // learned BPE merge table
      funnel: Seq[(String, Long)]) { // stage → surviving docs

    /** Release the two persisted result artifacts. `run` intentionally
      * leaves `corpus` and `merges` cached (they are materialized and
      * answer from their own blocks); a long-lived session running the
      * DAG repeatedly must call this once done with a Result, or the
      * caches accumulate.
      */
    def unpersist(): Unit = { corpus.unpersist(); merges.unpersist(); () }
  }

  def run(
      spark: SparkSession,
      docs: DataFrame,        // (doc_id, text)
      lineSep: String = "\n",
      minWordsPerLine: Int = 5,
      blocklist: Seq[String] = Seq("lorem ipsum", "{"),
      minLines: Int = 1,
      lmCutQuantile: Double = 0.05,
      // false (default): approxQuantile threshold (fast, ±1% rank error,
      // not externally replayable). true: EXACT count-based cut — see
      // the lm_gate stage below — deterministic and DuckDB-replayable,
      // at the cost of one extra model-sized aggregation
      lmCutExact: Boolean = false,
      nShards: Int = 8,
      nMerges: Int = 16,
      seed: String = "curation42",
      bench: Option[DataFrame] = None,          // held-out (any id, text)
      maxBenchOverlap: Double = 0.5,
      mixBy: Option[(String, Double)] = None,   // (group col in docs, alpha)
      nearDupThreshold: Option[Double] = None   // Jaccard bar for stage 3c
  ): Result = {
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    // Stage-output persist discipline (the Pipeline.processDataset rule,
    // load-bearing at DAG depth): every stage output is consumed at least
    // twice (its funnel count + the next stage; several stages read their
    // input twice more — LSH pairs + keep-best, LM score + join-back,
    // shards + BPE). Without caching, each action re-derives the WHOLE
    // upstream chain — measured 36 s at sf0.1 where the cached DAG runs
    // the chain once (~4x). Intermediates are dropped before returning;
    // the two result artifacts stay cached (they were just materialized —
    // the caller reads them next).
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def mark(name: String, df0: DataFrame): DataFrame = {
      val df = df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += df
      stages += name -> df.count(); df
    }

    stages += "input" -> docs.count()

    // 1. line hygiene
    val clean = mark("c4_filter",
      C4Filter.cleanLines(docs, "text", Seq("doc_id"),
          lineSep, minWordsPerLine, blocklist, minLines)
        .filter(col("keep"))
        .select(col("doc_id"), col("clean_text").as("text")))

    // 2. corpus-wide paragraph dedup (drop docs left empty)
    val paraDeduped = mark("para_dedup",
      ParagraphDedup.dedup(clean, "doc_id", "text", paraSep = lineSep)
        .filter(col("n_paras_kept") > 0)
        .select(col("doc_id"), col("clean_text").as("text")))

    // 3. exact near-identical removal (normalized fingerprint, keep-first)
    val exact0 = mark("exact_dedup",
      TextDedup.exactDedup(paraDeduped, "doc_id", "text"))

    // 3b. benchmark decontamination (only when a held-out set is given)
    val exact = bench match {
      case Some(b) => mark("decontaminate",
        TextDedup.decontaminate(exact0, b, "doc_id", "text", "text",
          maxOverlap = maxBenchOverlap))
      case None => exact0
    }

    // 3c. near-dup cluster retention (LSH banding → exact-Jaccard
    // confirm → connected components, each cluster keeping its
    // best-quality member — never the quadratic exact tier)
    val nearDeduped = nearDupThreshold match {
      case Some(t) => mark(s"near_dedup($t)", {
        val pairs = TextDedup.minHashDedupPairs(exact, "doc_id", "text",
            threshold = t)
          .select(col("id_a"), col("id_b"))
        Components.dedupClustersKeepBest(
            exact.withColumn("__q", TextFunctions.qualityScore(col("text"))),
            "doc_id", pairs, "id_a", "id_b", "__q")
          .filter(col("is_best"))
          .select(col("doc_id"), col("text"))
      })
      case None => exact
    }

    // 4a. repetition-quality gate (Gopher signals)
    val repOk = mark("repetition_gate",
      nearDeduped.filter(TextFunctions.repetitionKeep(
        TextFunctions.repetitionStats(col("text")))))

    // 4b. LM quality: drop the lowest-scoring quantile (scored is read
    // twice: the quantile probe and the gate join)
    val scored = LmScore.scoreBigram(repOk, "doc_id", "text")
      .filter(col("avg_logp").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached += scored
    val keepScored =
      if (!lmCutExact)
        scored.filter(col("avg_logp") >=
          scored.stat.approxQuantile("avg_logp", Array(lmCutQuantile), 0.01)(0))
      else {
        // EXACT count-based cut, scale-clean: quantize the (rounded, the
        // q103 determinism discipline) score onto a 1e-4 grid, histogram
        // the corpus by grid cell (ONE aggregation; the result is
        // bounded by the number of distinct rounded scores — model-
        // sized), take the longest prefix of whole cells holding at most
        // floor(q·n) documents, and drop exactly those cells. No global
        // sort, no single-partition window over the corpus, no
        // approxQuantile nondeterminism — ties share a cell and are
        // kept or dropped TOGETHER, so the gate is order-independent
        // and exactly replayable in external SQL.
        val grid = round(col("avg_logp") * 10000, 0).cast("long").as("g")
        val toDrop = math.floor(lmCutQuantile * scored.count()).toLong
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("g")) // over the model-sized histogram only
          .rowsBetween(Long.MinValue, 0)
        val gStarRow = scored.select(grid).groupBy(col("g"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(w))
          .filter(col("cum") <= toDrop)
          .agg(max(col("g"))).head()
        if (gStarRow.isNullAt(0)) scored
        else scored.filter(round(col("avg_logp") * 10000, 0).cast("long") >
          lit(gStarRow.getLong(0)))
      }
    val quality = mark("lm_gate",
      repOk.join(keepScored.select("doc_id"), Seq("doc_id"), "left_semi"))

    // 6. optional temperature re-balancing (group labels re-joined from
    // the INPUT frame — intermediate stages carry only doc_id + text)
    val mixed = mixBy match {
      case Some((groupCol, alpha)) =>
        mark(s"temperature_mix($groupCol, $alpha)",
          MixtureSample.toTemperature(
              quality.join(docs.select(col("doc_id"), col(groupCol)),
                Seq("doc_id")),
              groupCol, "doc_id", alpha)
            .select(col("doc_id"), col("text")))
      case None => quality
    }

    // 7. deterministic shard layout
    val sharded = ShardLayout.assign(mixed, "doc_id", nShards, seed)
      .select(col("doc_id"), col("text"), col("shard"), col("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 8. tokenizer trained on the CURATED corpus
    val merges = BpeTrain.train(mixed, "text", nMerges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // materialize the artifacts, then release every intermediate — the
    // result frames answer from their own cache, nothing upstream is
    // re-derivable-by-accident, and a long-lived session doesn't
    // accumulate stage blocks
    sharded.count(); merges.count()
    cached.foreach(_.unpersist())

    Result(sharded, merges, stages.toSeq)
  }
}
