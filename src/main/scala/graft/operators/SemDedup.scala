package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDedup (Abbas et al., 2023, arXiv:2303.09540): semantic
  * deduplication of an embedded corpus — cluster the embedding space,
  * then inside each cluster drop every vector that has a near-identical
  * (cosine ≥ τ) peer with a smaller id, keeping exactly one
  * representative per near-duplicate community. The id-minimal witness
  * rule makes the kept set deterministic and replay-stable (no dependence
  * on comparison order), matching the keep-first discipline of
  * `Deduplicator`/`TextDedup`.
  *
  * Scale shape — this is WHY SemDedup clusters first: the quadratic
  * within-cluster pair scan is bounded by cell size (~n/k rows), an
  * equi-join on `centroid_id` rather than an all-pairs product. Both
  * stages ride the same machinery as the ANN index: [[IvfAnn.build]]'s
  * deterministic Lloyd's k-means (native `NearestCells` assignment, one
  * codegen reference object) and the codegen'd `VecCosine`. The
  * [[BlockGuard]] probe fails fast — naming the hot cell — before a
  * skewed clustering can build a quadratic plan (raise `maxCellRows`, or
  * `nCentroids`, to opt in / re-balance).
  */
object SemDedup {

  /** Cluster with k-means (`maxIter` Lloyd's rounds; 0 = seeded centroids
    * as-is) and dedup within cells. Returns the KEPT rows:
    * (id, centroid_id).
    */
  def dedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      tau: Double,
      maxIter: Int = 5,
      maxCellRows: Long = 100000L): DataFrame = {
    val idx = IvfAnn.build(corpus, idCol, vecCol, nCentroids, maxIter)
    dedupAssigned(idx.assigned, idCol, vecCol, tau, maxCellRows)
  }

  /** Dedup an already-assigned corpus (id, vec, centroid_id) — the entry
    * point when the IVF index is persisted ([[IvfAnn.save]]) and the
    * clustering cost is amortized across corpus versions.
    */
  def dedupAssigned(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      maxCellRows: Long = 100000L): DataFrame = {
    BlockGuard.check("SemDedup", assigned, Seq("centroid_id"), maxCellRows,
      "a larger nCentroids (smaller cells)")
    val l = assigned.select(col("centroid_id"),
      col(idCol).as("__ia"), col(vecCol).as("__va"))
    val r = assigned.select(col("centroid_id"),
      col(idCol).as("__ib"), col(vecCol).as("__vb"))
    // b is dropped iff some same-cell a < b has cosine(a, b) >= tau
    val dropped = l.join(r, Seq("centroid_id"))
      .filter(col("__ia") < col("__ib") &&
        VectorFunctions.cosine(col("__va"), col("__vb")) >= tau)
      .select(col("__ib").as(idCol))
      .distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("centroid_id"))
  }
}
