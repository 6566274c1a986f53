package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness testdata (TESTDATA.md): one parquet per table. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The testdata ships as one small parquet file per table → Spark scans
    * it as ONE partition, serializing every downstream expression onto a
    * single core. Fan out to the session's parallelism when (and only
    * when) the scan under-partitions — on a real multi-file/100 TB table
    * the scan already yields thousands of splits and this is a no-op.
    * Worth it only where per-row compute is heavy (text/vector ops).
    */
  private def fanOut(df: DataFrame): DataFrame = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    // Metadata-only probe: inputFiles + the optimizer's size estimate.
    // (df.rdd.getNumPartitions would force an RDD conversion of the scan
    // plan on every load.) Only a single SMALL file can under-partition —
    // multi-file tables get one split per file and large single files are
    // split by spark.sql.files.maxPartitionBytes.
    val singleSmallFile = df.inputFiles.length == 1 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes < (256L << 20)
    if (singleSmallFile) df.repartition(dp) else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.parquet has shipped `ts` under two different physical types
    * across testdata generations: INT64 TIMESTAMP(NANOS) (which Spark's
    * parquet reader rejects outright without the legacy nanos-as-long
    * conf) and plain timestamp[us]. Branch on the type actually read
    * rather than assuming either:
    *   - LongType (nanos-as-long fallback engaged): convert nanos → a
    *     microsecond TimestampType column. Sub-microsecond precision is
    *     below anything the queries observe (events are seconds apart).
    *   - TimestampNTZType (timestamp[us], isAdjustedToUTC=false): cast to
    *     the session-TZ TimestampType. All sessions here run with
    *     spark.sql.session.timeZone=UTC, so the cast is value-preserving
    *     and keeps unix_timestamp / date_trunc / session-window semantics
    *     aligned with the DuckDB oracle's naive-timestamp epoch().
    *   - TimestampType: use as-is.
    * The legacy conf is only set when the plain read rejects the footer,
    * so a session that never sees a nanos file never mutates conf.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$d/events.parquet"
    val df =
      try s.read.parquet(path)
      catch {
        case e: Exception if e.getMessage != null && e.getMessage.contains("NANOS") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          s.read.parquet(path)
      }
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    fanOut(apply(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(apply(s, d, "embeddings"))
}
