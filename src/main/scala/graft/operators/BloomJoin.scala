package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-filtered join — the manual tier of Spark's AQE runtime
  * row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`), for
  * when the planner can't inject it itself: the probe side is pre-filtered
  * by a Bloom filter built from the build side's join keys BEFORE the
  * probe rows reach the shuffle, then the real equi-join runs on the
  * survivors. False positives are eliminated by the join itself, so the
  * result is EXACTLY the plain join's — only the shuffled volume changes.
  *
  * Uses Spark's own native machinery, not a reimplementation:
  * `BloomFilterAggregate` (codegen'd, mergeable partials) builds the
  * filter over `xxhash64(key)`, and `BloomFilterMightContain` probes it as
  * a foldable binary literal — both stay inside whole-stage codegen.
  *
  * At 100 TB this is the classic semi-join reduction: when the build side
  * selects few keys (a filtered dim), the fact table's shuffle shrinks by
  * the filter's selectivity for the price of one aggregate over the dim
  * and a constant-size (numBits/8 bytes) driver value — the same bounded
  * driver materialization as a broadcast var, NOT a per-row collect.
  */
object BloomJoin {

  /** Build a Bloom filter over `keys` of `build` and return the serialized
    * filter bytes. `expectedItems` sizes the filter (Spark derives
    * numBits; default FPP ~3%).
    */
  def buildFilter(build: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val agg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(xxhash64(col(key))),
        expectedItems).toAggregateExpression())
    build.agg(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** `might_contain(filterBytes, xxhash64(key))` as a Column; the filter
    * is a foldable binary literal, so the probe is codegen'd straight into
    * the scan's filter stage (and the whole predicate survives pushdown
    * ordering — it's just a scalar expression).
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(
        Literal(filterBytes, BinaryType),
        GraftColumnBridge.expression(xxhash64(key))))

  /** Equi-join `probe ⋈ build` on `probeKey = buildKey`, with the probe
    * side Bloom-pre-filtered before its shuffle. Result rows are identical
    * to the plain inner join.
    */
  def join(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bytes = buildFilter(build, buildKey, expectedItems)
    probe
      .filter(mightContain(bytes, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey))
  }
}
