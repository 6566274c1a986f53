package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over one UNPARTITIONED versioned-table snapshot that
  * answers Spark's planning-time `listFiles(_, dataFilters)` from the
  * data dir's stats sidecar ([[DataSkipping]]) — so file-level skipping
  * happens AUTOMATICALLY inside any plan over the table: SQL SELECTs
  * through `graft.`path``, joins, aggregates; no special read entry
  * point needed. This is the architecture Delta/Iceberg use (a
  * log-backed FileIndex), with the sidecar as the log.
  *
  * The snapshot is immutable (manifest versions never mutate), so files
  * and stats are resolved once at construction; `refresh` is a no-op by
  * design. Filters the evaluator cannot decide keep every file —
  * Spark re-applies the full predicate after the scan, so pruning is
  * invisible to results. Partitioned versioned tables keep their
  * manifest-level partition pruning + [[ParquetTable.readWhere]];
  * their per-version dir/partition mapping doesn't fit one FileIndex
  * root cleanly.
  */
class GraftFileIndex(
    spark: SparkSession,
    dataDir: Path,
    stats: Option[Map[String, DataSkipping.FileStat]]) extends FileIndex {

  private val statuses: Seq[(String, FileStatus)] = {
    val fs = dataDir.getFileSystem(spark.sessionState.newHadoopConf())
    DataSkipping.listParquetFiles(spark, dataDir.toString)
      .map(rel => rel -> fs.getFileStatus(new Path(dataDir, rel)))
  }

  override def rootPaths: Seq[Path] = Seq(dataDir)

  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (dataFilters.isEmpty || stats.isEmpty) statuses
      else statuses.filter { case (rel, _) =>
        stats.get.get(rel).forall(fileStat =>
          dataFilters.forall(DataSkipping.mayMatch(_, fileStat)))
      }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }

  override def inputFiles: Array[String] = statuses.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = () // immutable snapshot

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  /** The snapshot's exact row count, when every file has sidecar stats —
    * feeds the metadata-only COUNT(*) fold (graft.plans.MetadataAggregates).
    */
  def metadataRowCount: Option[Long] =
    stats.filter(s => statuses.forall { case (rel, _) => s.contains(rel) })
      .map(s => statuses.map { case (rel, _) => s(rel).rows }.sum)

  /** The snapshot-wide [min, max] of `column` from the sidecars — feeds
    * the metadata-only MIN/MAX fold. None = unknown (some file lacks
    * stats for the column); Some(kind, None) = the column is null in
    * every row; Some(kind, Some((min, max))) otherwise.
    */
  def metadataMinMax(column: String): Option[(String, Option[(String, String)])] =
    stats.flatMap(s =>
      DataSkipping.combineMinMax(statuses.map { case (rel, _) => s.get(rel) }, column))

  /** The snapshot's non-null count of `column` — feeds the metadata-only
    * COUNT(col) fold. None = some file's null count is unknown.
    */
  def metadataNonNullCount(column: String): Option[Long] =
    stats.flatMap(s =>
      DataSkipping.combineNonNull(statuses.map { case (rel, _) => s.get(rel) }, column))
}

/** The PARTITIONED twin: one Spark [[org.apache.spark.sql.execution.datasources.InMemoryFileIndex]]
  * per referenced data dir (rooted at exactly the partition subdirs the
  * manifest references, so shared dirs never leak other versions'
  * partitions; Spark's own partition discovery and partition-filter
  * pruning stay intact), with each inner listing further narrowed by the
  * dir's stats sidecar. SQL over a partitioned versioned table thus gets
  * BOTH pruning tiers automatically: partition dirs from
  * `partitionFilters`, files-within-partitions from `dataFilters`.
  */
class GraftPartitionedFileIndex(
    parts: Seq[(FileIndex, Map[String, DataSkipping.FileStat])]) extends FileIndex {

  require(parts.nonEmpty, "GraftPartitionedFileIndex: no data dirs")

  override def rootPaths: Seq[Path] = parts.flatMap(_._1.rootPaths)

  override def partitionSchema: StructType = parts.head._1.partitionSchema

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    parts.flatMap { case (inner, stats) =>
      val listed = inner.listFiles(partitionFilters, dataFilters)
      if (dataFilters.isEmpty || stats.isEmpty) listed
      else listed.map { pd =>
        pd.copy(files = pd.files.filter { f =>
          stats.get(f.getPath.toUri.getPath).forall(fileStat =>
            dataFilters.forall(DataSkipping.mayMatch(_, fileStat)))
        })
      }
    }

  override def inputFiles: Array[String] = parts.flatMap(_._1.inputFiles).toArray

  override def refresh(): Unit = () // immutable snapshot

  override def sizeInBytes: Long = parts.map(_._1.sizeInBytes).sum

  /** Exact row count across every referenced dir, when all files have
    * sidecar stats — see [[GraftFileIndex.metadataRowCount]].
    */
  def metadataRowCount: Option[Long] = {
    val perDir = parts.map { case (inner, stats) =>
      val files = inner.inputFiles.map(f => new Path(f).toUri.getPath)
      if (files.nonEmpty && files.forall(stats.contains))
        Some(files.map(stats(_).rows).sum)
      else None
    }
    if (perDir.forall(_.isDefined)) Some(perDir.flatten.sum) else None
  }

  /** Snapshot-wide [min, max] of a DATA column (partition columns are
    * not in file stats — callers bail to a scan for those); see
    * [[GraftFileIndex.metadataMinMax]].
    */
  def metadataMinMax(column: String): Option[(String, Option[(String, String)])] =
    DataSkipping.combineMinMax(
      parts.flatMap { case (inner, stats) =>
        inner.inputFiles.map(f => stats.get(new Path(f).toUri.getPath))
      }, column)

  /** Non-null count of a DATA column across every referenced dir
    * (partition columns are not in file stats — callers bail to a scan);
    * see [[GraftFileIndex.metadataNonNullCount]].
    */
  def metadataNonNullCount(column: String): Option[Long] =
    DataSkipping.combineNonNull(
      parts.flatMap { case (inner, stats) =>
        inner.inputFiles.map(f => stats.get(new Path(f).toUri.getPath))
      }, column)
}
