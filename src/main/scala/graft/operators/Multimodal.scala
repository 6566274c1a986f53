package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media travel as opaque `binary` columns + typed metadata; decode /
  * feature-extraction runs per-partition in batch (the Scala equivalent of
  * a `mapInPandas` iterator-of-batches UDF: one function call per
  * partition, amortizing any per-model/per-codec setup across rows, never
  * a per-row UDF). Partitioning, schema, and batch plumbing here are real
  * and tested; the byte-level decoders are DETERMINISTIC STUBS (no
  * image/audio codecs exist in this environment) marked `STUB:` — swapping
  * in a real JNI/Java decoder changes only the function body, not the
  * plan shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("path", StringType, nullable = true),
    StructField("modality", StringType, nullable = true), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Ingest a directory of files as (path, modificationTime, length,
    * content) via Spark's binary file source, then shape to `mediaSchema`.
    */
  def readBinaryDir(spark: SparkSession, dir: String, modality: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("path"),
        lit(modality).as("modality"),
        col("content"),
        lit(null).cast(mediaSchema("meta").dataType).as("meta"))

  /** STUB: deterministic fake "decode + feature extraction" — folds the
    * bytes into `dim` float accumulators (byte i lands in lane i % dim).
    * Stands in for e.g. JPEG-decode → CNN features. Runs per-partition
    * with an iterator (mapInPandas-equivalent batching).
    */
  def extractFeatures(df: DataFrame, dim: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      // per-partition setup would happen here (codec/model init)
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val feats =
          if (bytes == null) null
          else {
            val acc = new Array[Float](dim)
            var i = 0
            while (i < bytes.length) {
              acc(i % dim) += (bytes(i) & 0xff) / 255.0f
              i += 1
            }
            acc
          }
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** STUB: "resize" — truncate/pad the payload to `targetBytes` and stamp
    * meta.width/height. Stands in for a real resample keeping the plan
    * shape (narrow map, no shuffle).
    */
  def resizeStub(df: DataFrame, targetBytes: Int, w: Int, h: Int): DataFrame =
    df.withColumn("content",
        substring(col("content"), 1, targetBytes))
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(IntegerType).as("n_frames")))

  /** STUB: sample `n` evenly-spaced fixed-size "frames" from the payload —
    * the video-frame-sampling plan shape (one row in, `n` array elements
    * out; explode downstream if per-frame rows are needed).
    */
  def frameSampleStub(df: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    val len = length(col("content"))
    val frames = transform(sequence(lit(0), lit(n - 1)), i =>
      // placeholder byte-slice: a real impl seeks via the codec instead
      col("content").substr(i * greatest(len / n, lit(1)) + 1, lit(frameBytes)))
    df.withColumn("frames", frames)
  }
}
