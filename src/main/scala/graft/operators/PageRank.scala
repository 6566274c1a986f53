package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge frame (Page et al. 1999; the power
  * iteration in its standard dangling-mass formulation):
  *
  *   rank'(v) = (1-d)/N + d · ( Σ_{u→v} rank(u) · w(u→v)/outW(u)
  *                              + danglingMass/N )
  *
  * where danglingMass is the rank held by nodes with no out-edges,
  * redistributed uniformly — so Σ rank stays 1 every iteration (the spec
  * pins this invariant).
  *
  * Scale shape, the [[Components]] discipline: per iteration exactly ONE
  * equi-join (edges ⋈ ranks on src) and ONE aggregation (sum by dst) —
  * both keyed by node id, so the exchange is reused; the tiny dangling
  * scalar is a 1-row aggregate broadcast into the next projection, never
  * a driver-side loop over nodes. Each iteration's ranks are
  * checkpointed (local by default, reliable with `checkpointDir`) to
  * truncate lineage — plan size stays constant in the iteration count.
  * Edges and out-weights are computed ONCE and cached via checkpoint;
  * iterations shuffle only the rank frame (2 columns).
  */
object PageRank {

  /** @param weightCol optional edge weight (unweighted = every edge 1.0)
    * @return (id, rank) for every node in src ∪ dst, Σ rank = 1
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        edges.sparkSession.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(true)
      case None => df => df.localCheckpoint(true)
    }

    val e = ckpt(edges.select(
      col(srcCol).as("src"), col(dstCol).as("dst"),
      weightCol.map(col(_).cast("double")).getOrElse(lit(1.0)).as("w")))

    val nodes = ckpt(
      e.select(col("src").as("id")).unionByName(e.select(col("dst").as("id")))
        .distinct())
    val n = nodes.count().toDouble

    // out-weight per source, joined once; src-normalized edge share
    val outW = e.groupBy("src").agg(sum("w").as("__outw"))
    val share = ckpt(e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("__outw")).as("share")))

    var ranks = ckpt(nodes.withColumn("rank", lit(1.0 / n)))
    // the dangling-node SET is iteration-invariant (it depends only on
    // the edge list) — computed once instead of re-deriving the
    // anti-join + distinct inside every iteration; when empty (every
    // node has out-edges, the common dedup/trade-graph case) the
    // per-iteration dangling job disappears entirely (dangling = 0.0,
    // exactly the value the old aggregation returned)
    val danglingIds = ckpt(nodes.join(share.select("src").distinct(),
      nodes("id") === col("src"), "left_anti").select("id"))
    val hasDangling = !danglingIds.isEmpty
    for (_ <- 1 to iterations) {
      // rank mass sitting on dangling nodes (no out-edges)
      val dangling =
        if (!hasDangling) 0.0
        else ranks.join(danglingIds, Seq("id"), "left_semi")
          .agg(coalesce(sum("rank"), lit(0.0))).head.getDouble(0)
      val contribs = share
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share") * col("rank")).as("__in"))
      val next = ckpt(nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) + lit(dangling / n)))
            .as("rank")))
      ranks.unpersist()
      ranks = next
    }
    danglingIds.unpersist()
    ranks
  }
}
