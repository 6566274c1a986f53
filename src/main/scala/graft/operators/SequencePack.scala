package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM training prep: assign documents to
  * fixed-token-capacity training sequences ("example packing" — filling
  * each context window with several short documents instead of padding),
  * greedily and deterministically.
  *
  * Semantics (the classic greedy pack): within each `groupCols` shard,
  * docs are visited in `orderCol` order; a doc joins the current
  * sequence when its tokens still fit in `capacity`, else it starts the
  * next sequence. A doc larger than `capacity` gets a sequence of its
  * own (callers chunk oversize docs first — see
  * `TextFunctions.tokenChunks` — or truncate downstream). Output =
  * input columns + `seq_id` (0-based per shard) + `seq_off` (token
  * offset of the doc inside its sequence).
  *
  * Scale shape: ONE shuffle (hash on the shard key) + an in-partition
  * sort, then a streaming pass holding O(1) state — no buffering, no
  * window over the whole shard, no driver involvement. Greedy packing
  * is inherently sequential WITHIN a shard (each assignment depends on
  * the running fill), so a shard serializes through one task — that is
  * the algorithm, not an accident; at 100 TB keep shards bounded (date ×
  * source × lang, or add a hash-bucket column) the same way real
  * pipelines shard their packing step. Cross-shard parallelism is full.
  */
object SequencePack {

  def packGreedy(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      tokenCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(groupCols.nonEmpty, "packGreedy needs at least one shard column")
    val outSchema = StructType(df.schema.fields :+
      StructField("seq_id", LongType, nullable = false) :+
      StructField("seq_off", LongType, nullable = false))
    val gIdx = groupCols.map(df.schema.fieldIndex)
    val tIdx = df.schema.fieldIndex(tokenCol)
    df.repartition(groupCols.map(col): _*)
      .sortWithinPartitions((groupCols :+ orderCol).map(col): _*)
      .mapPartitions { rows =>
        // running state for the CURRENT shard only — a partition holds
        // whole shards (hash partitioning), visited contiguously after
        // the sort, so a key change is a shard boundary
        var curKey: Seq[Any] = null
        var seqId = 0L
        var filled = 0L
        rows.map { r =>
          val key = gIdx.map(r.get)
          val t = r.getAs[Number](tIdx).longValue()
          if (curKey == null || key != curKey) {
            curKey = key
            seqId = 0L
            filled = t
          } else if (filled + t <= capacity) {
            filled += t
          } else {
            seqId += 1
            filled = t
          }
          Row.fromSeq(r.toSeq :+ seqId :+ (filled - t))
        }
      }(RowEncoder.encoderFor(outSchema))
  }
}
