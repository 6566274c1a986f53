package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.polyHash64

/** Deterministic global shuffle + shard layout — the training-shard
  * writer primitive: give every row a seeded, replayable pseudo-random
  * rank, bucket rows into `nShards` shards, and number each row's
  * position within its shard.
  *
  * Determinism: the rank is polyHash64("<seed>|<key>") — a pure column
  * expression, so two runs (or a run and an external SQL replay) produce
  * byte-identical shard files. This is what training pipelines need from
  * a "shuffle": not randomness, but a fixed pseudo-random permutation
  * that is independent of input order, partitioning, and cluster size.
  *
  * Scale shape: one hash per row in the scan (codegen'd), then ONE
  * shuffle — the window's hash partitioning on `shard` — with an
  * in-partition sort. At 100 TB this is `repartition(nShards, shard)` +
  * per-shard sort + `write.partitionBy(shard)`; shard sizes are balanced
  * by the hash (each shard gets ~rows/nShards rows regardless of key
  * skew, because the hash input includes the unique key).
  */
object ShardLayout {

  def hashRank(keyCol: Column, seed: String): Column =
    polyHash64(concat_ws("|", lit(seed), keyCol.cast("string")))

  /** Adds `shard` (int in [0, nShards)) and `pos` (1-based position in
    * the shard's deterministic order).
    */
  def assign(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      seed: String = "seed42"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val h = hashRank(col(keyCol), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }
}
