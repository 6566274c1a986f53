package graft.queries

import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.Join

import graft.SparkSpec
import graft.SparkEntry

/** The anti-pattern sweep as a spec: build EVERY battery query's plan at
  * sf0.001 and refuse condition-less joins — a cartesian product that
  * sneaks into any of the 139 plans fails the suite, not a later manual
  * audit. Explicit `crossJoin`s against SINGLE-ROW aggregates or
  * model-sized literal frames are the one legitimate shape (corpus-wide
  * scalars riding beside every row: BM25's avgdl, DSIR's totals, the
  * LM's vocab size); they are whitelisted BY QUERY with the operator
  * that owns them, so a new unlisted cross shape anywhere else is an
  * error. Logical-plan level, so the check is AQE-independent and costs
  * only each query's build (the lakehouse queries do commit their
  * fixtures — same work the battery warmup pays).
  */
class PlanShapeSpec extends SparkSpec {

  /** query → owner of its documented single-row/model-sized crossJoin
    * (the exact set VERDICT r10's manual sweep found; measured here, so
    * a NEW cross shape in any of these queries still needs a count bump)
    */
  private val allowedCross: Map[String, Int] = Map(
    "q89_lm_score" -> 1, // LmScore: vocab-size scalar beside every gram
    "q96_bm25" -> 2, // Bm25: corpus-wide (N, avgdl) scalars
    "q97_hybrid_rrf" -> 2, // rides q96's BM25 leg
    "q103_ccnet_buckets" -> 1, // LmScore bucketing leg
    "q104_bm25_indexed" -> 1, // Bm25 probe-side scalar
    "q115_lm_persisted" -> 1, // persisted-LM scoring scalar
    "q128_dsir_select" -> 2, // Dsir: per-corpus total-count scalars
    "q135_lm_trigram" -> 1 // trigram JM: vocab-size scalar
    // q141 rode q89's vocab scalar until the stage-persist fix: the LM
    // stage now answers from its cached output, so the final plan has no
    // cross shape left to document (this sweep counts the OBSERVABLE
    // plan — a cached stage's internals were already swept via q89)
  )

  test("no undocumented condition-less joins anywhere in the battery") {
    val sf = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to build: $e") }
      val crosses = plan.collect {
        case j: Join if j.joinType == Cross => j
        case j: Join if j.joinType == Inner && j.condition.isEmpty => j
      }
      if (crosses.size != allowedCross.getOrElse(name, 0))
        offenders += name -> (s"${crosses.size} condition-less join(s), " +
          s"${allowedCross.getOrElse(name, 0)} documented")
    }
    assert(offenders.isEmpty,
      offenders.map { case (q, w) => s"$q: $w" }.mkString("\n"))
  }
}
