package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: salting.
  *
  * A hot key (one customer with 1% of a 100 TB fact table) funnels its
  * entire volume through one shuffle partition. Salting splits each left
  * key into `saltFactor` synthetic sub-keys and replicates the right side
  * once per salt, so the hot key's rows spread over `saltFactor`
  * partitions. Identical join RESULT for any equi-join type whose
  * semantics survive right-side replication (inner / left_outer /
  * left_semi after dedup); cost: right side × saltFactor — use for
  * fact-⋈-dimension skew, not fact-⋈-fact.
  *
  * This is the manual fallback; AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`) handles moderate skew
  * automatically at runtime and should be preferred when on.
  */
object Skew {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(Seq("inner", "left_outer", "left", "left_semi").contains(joinType),
      s"salting preserves semantics only for left-preserving joins, got $joinType")
    val salted = left.withColumn("__graft_salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
  }
}
