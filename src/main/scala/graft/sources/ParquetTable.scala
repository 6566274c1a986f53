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
  *     unpartitioned tables it falls back to a full rewrite published as a
  *     new manifest version.
  *
  * Atomicity & versioning: Delta gets both from its transaction log. Here,
  * UNPARTITIONED tables use a minimal manifest: each full rewrite lands in
  * a fresh `_v<N>` data dir (underscore-prefixed — invisible to plain
  * parquet listings) and is published by ONE atomic rename of a manifest
  * file under `_graft_manifest/`. `read` resolves the newest manifest, so
  * a reader sees version N or N+1, never a half-written or missing dir,
  * and an already-resolved plan keeps reading its (still-present) old dir
  * to completion. `readAt` gives "query as of version N"; `vacuum` retires
  * old versions. The rename is atomic on HDFS/local FS — an object store
  * deployment needs a CAS'd log commit instead (same caveat as Delta's
  * LogStore). The partitioned merge delegates to Spark's dynamic partition
  * overwrite, which commits per-partition; versioning partitioned tables
  * needs a per-partition log and stays out of scope. The pipeline's
  * idempotency (MERGE replay, reference README.md:102-105) additionally
  * survives because merge-by-PK is idempotent.
  */
object ParquetTable {

  final case class MergeStats(updated: Long, inserted: Long)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Current table state: the newest manifest version when `path` is a
    * versioned table, the plain parquet dir otherwise.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    currentVersion(spark, path) match {
      case Some(v) => spark.read.parquet(new Path(path, dataDirName(v)).toString)
      case None => spark.read.parquet(path)
    }

  /** Time travel: the table exactly as published by manifest `version`. */
  def readAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    require(versions(spark, path).contains(version),
      s"readAt: version $version not present at $path " +
        s"(have: ${versions(spark, path).mkString(", ")})")
    spark.read.parquet(new Path(path, dataDirName(version)).toString)
  }

  /** Overwrite-create. Partitioned layouts stay plain (hive-style dirs at
    * `path`, catalog-registrable via LOCATION); unpartitioned tables are
    * created as manifest version 1 (or the next version if the path
    * already holds a versioned table).
    */
  def create(df: DataFrame, path: String, partitionColumns: Seq[String] = Nil): Unit =
    if (partitionColumns.nonEmpty) writePlain(df, path, partitionColumns)
    else atomicReplace(df.sparkSession, path, df, Nil)

  private def writePlain(df: DataFrame, path: String, partitionColumns: Seq[String]): Unit = {
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

  // ---- versioned manifest layout ----------------------------------------

  private val ManifestDirName = "_graft_manifest"

  private def hadoopFs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(path: String) = new Path(path, ManifestDirName)

  private def dataDirName(version: Long) = f"_v$version%020d"

  /** Committed versions at `path`, ascending; empty for plain layouts. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val md = manifestDir(path)
    val fs = hadoopFs(spark, md)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted
  }

  def currentVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** Publish `version` → its data dir with one atomic rename of a manifest
    * file. Returns false when another writer committed it first.
    */
  private def commitVersion(spark: SparkSession, path: String, version: Long): Boolean = {
    val md = manifestDir(path)
    val fs = hadoopFs(spark, md)
    fs.mkdirs(md)
    val tmp = new Path(md, s".tmp_commit_${System.nanoTime()}")
    val out = fs.create(tmp, false)
    try out.write(dataDirName(version).getBytes("UTF-8"))
    finally out.close()
    val target = new Path(md, f"v$version%020d")
    if (fs.rename(tmp, target)) true
    else { fs.delete(tmp, false); false }
  }

  /** Write the full new table image as the NEXT manifest version: data
    * lands in a fresh `_v<N+1>` dir, one atomic manifest rename publishes
    * it. Loses against a concurrent committer of the same version and
    * retries onto the next number, so last-writer-wins is explicit. Old
    * versions stay intact (and readable via `readAt`) until `vacuum`.
    */
  def atomicReplace(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      partitionColumns: Seq[String]): Unit = {
    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      if (attempts > 10)
        throw new java.io.IOException(
          s"atomicReplace: lost the version race at $path $attempts times; giving up")
      val v = currentVersion(spark, path).getOrElse(0L) + 1
      val dataDir = new Path(path, dataDirName(v))
      writePlain(df, dataDir.toString, partitionColumns)
      committed = commitVersion(spark, path, v)
      if (!committed) hadoopFs(spark, dataDir).delete(dataDir, true)
    }
  }

  /** Retire history: keep the newest `keepLast` versions, delete older
    * data dirs + manifests, and — once a manifest exists — any parquet
    * files still sitting at the path ROOT (the pre-manifest plain layout a
    * migrated table leaves behind for its legacy readers).
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 2): Unit = {
    require(keepLast >= 1, "vacuum must keep at least the current version")
    val vs = versions(spark, path)
    if (vs.isEmpty) return
    val fs = hadoopFs(spark, new Path(path))
    vs.dropRight(keepLast).foreach { v =>
      fs.delete(new Path(path, dataDirName(v)), true)
      fs.delete(new Path(manifestDir(path), f"v$v%020d"), false)
    }
    fs.listStatus(new Path(path)).foreach { st =>
      if (st.isFile && !st.getPath.getName.startsWith("_"))
        fs.delete(st.getPath, false)
    }
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
