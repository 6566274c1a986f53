package graft.sources

import org.apache.spark.sql.SparkSession

/** Persistent-catalog surface over curated parquet locations — the
  * Athena/Glue-catalog layer of the reference (reference README.md:247-249:
  * query `clean_*` in the `delta-lakehouse` database; README.md:261-377:
  * run `INSERT INTO clean_*` through it).
  *
  * Tables are EXTERNAL (`USING parquet LOCATION`): the catalog entry
  * points at data the pipeline owns, so re-registration never moves or
  * rewrites data, and dropping a table never deletes it. Registration is
  * idempotent via drop-and-recreate — cheap (metadata only) and robust to
  * a location change between runs. After registration the tables answer
  * plain `spark.sql` SELECTs AND accept `INSERT INTO`, which is what the
  * reference's ACID corpus needs (see pipeline.AcidInserts).
  */
object Catalog {

  /** Register `table` over the parquet data at `path`. Partitioned
    * layouts (hive-style `col=value` dirs) need partition recovery — the
    * catalog tracks partitions for datasource tables, and a fresh external
    * table starts with none registered.
    */
  def registerExternal(
      spark: SparkSession,
      table: String,
      path: String,
      partitioned: Boolean): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"CREATE TABLE `$table` USING parquet LOCATION '$path'")
    if (partitioned) spark.sql(s"MSCK REPAIR TABLE `$table`")
  }

  /** Re-scan a partitioned table's location for partition directories the
    * catalog does not know yet (call after out-of-band writes to `path`).
    */
  def refreshPartitions(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE `$table`")
}
