package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: the shuffle-free repeated-join layout.
  *
  * A join between two tables bucketed (and sorted) the same way on the
  * join keys needs NO exchange at plan time — each bucket pair meets a
  * sort-merge join directly. At 100 TB this converts the dominant cost of
  * every fact-to-fact join from a full shuffle into a local merge, paid
  * once at write time; the same layout also serves bucket-pruned point
  * lookups. This is the persisted complement of `Skew.saltedEquiJoin`
  * (which handles the one-off skewed join).
  *
  * Spark only reads bucket metadata through the catalog, so bucketed
  * writes go through `saveAsTable` — pass `path` to keep the parquet at
  * an external location like the other curated tables.
  */
object Bucketing {

  /** Write `df` as a bucketed parquet table registered in the catalog,
    * bucketed AND sorted by `bucketCols` (sorting lets the co-located
    * join skip its per-bucket sort when the reader preserves it).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      path: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write.format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Inner-join two identically-bucketed tables on their bucket keys.
    * With matching bucket counts the planner emits a sort-merge join with
    * zero Exchange nodes — BucketingSpec asserts exactly that.
    */
  def colocatedJoin(
      spark: SparkSession,
      table1: String,
      table2: String,
      on: Seq[String]): DataFrame =
    spark.table(table1).join(spark.table(table2), on)
}
