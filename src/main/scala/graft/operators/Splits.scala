package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the "hash your id, not a random()"
  * rule every training pipeline needs: train/val/test membership must be
  * (a) stable across runs, engines, and repartitions (a random() split
  * changes when the partitioning does), (b) stable under corpus growth
  * (a new shard must not move old documents between splits — a
  * modulo-row-number split does exactly that), and (c) auditable by an
  * outside system. Content-addressed bucketing gives all three: bucket =
  * the first two hex characters of md5(id ":" seed) — 256 buckets —
  * compared LEXICOGRAPHICALLY against cumulative-weight boundaries, so
  * the identical assignment replays in any engine with md5 (hex digits
  * sort correctly as ASCII; no engine-specific integer parsing needed).
  *
  * Scale shape: a pure map-side projection — no shuffle, no state, no
  * driver participation; md5 and the when-chain are codegen'd, and the
  * assignment streams with the scan. Split fractions hit the requested
  * weights at 1/256 granularity (±0.4%), the standard trade for an
  * engine-portable bucket key; callers needing finer granularity can
  * widen to three hex chars (4096 buckets) with `hexChars = 3`.
  */
object Splits {

  /** The bucket key: first `hexChars` hex digits of md5(id ":" seed). */
  def bucketOf(id: Column, seed: String, hexChars: Int = 2): Column =
    substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, hexChars)

  /** Split assignment column for `splits` = (name, weight) pairs in
    * order; weights need not sum to 1 (they are normalized). The LAST
    * split absorbs any residual buckets so every row is assigned.
    */
  def splitOf(
      id: Column,
      splits: Seq[(String, Double)],
      seed: String = "0",
      hexChars: Int = 2): Column = {
    require(splits.nonEmpty, "Splits: no splits given")
    require(splits.forall(_._2 > 0), s"Splits: non-positive weight in $splits")
    require(hexChars >= 1 && hexChars <= 7,
      s"Splits: hexChars $hexChars outside 1..7")
    val nBuckets = 1 << (4 * hexChars)
    val total = splits.map(_._2).sum
    val bucket = bucketOf(id, seed, hexChars)
    // cumulative boundaries as zero-padded lowercase hex strings — the
    // same strings any replaying engine derives from the weights
    val bounds = splits.inits.toSeq.reverse.tail.map(_.map(_._2).sum / total)
      .map(c => math.round(c * nBuckets).toInt)
    val fmt = s"%0${hexChars}x"
    splits.init.zip(bounds).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), rest) =>
        // A boundary that rounds to the full bucket count would format one
        // hex digit WIDER than the bucket strings (e.g. "100" vs 2-char
        // buckets) and lexicographic comparison would invert — clamp: this
        // split owns every bucket below it, i.e. all of them.
        if (bound >= nBuckets) when(lit(true), lit(name)).otherwise(rest)
        else when(bucket < lit(fmt.format(bound)), lit(name)).otherwise(rest)
    }
  }

  /** Assign every row to a split: adds `bucket` and `split` columns. */
  def assign(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: String = "0",
      hexChars: Int = 2): DataFrame =
    df.withColumn("bucket", bucketOf(col(idCol), seed, hexChars))
      .withColumn("split", splitOf(col(idCol), splits, seed, hexChars))
}
