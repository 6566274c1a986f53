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
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright. Read nanos as long (legacy conf) and
    * convert to a microsecond TimestampType column — sub-microsecond
    * precision is below anything the queries observe (events are seconds
    * apart).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    fanOut(apply(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(apply(s, d, "embeddings"))
}
