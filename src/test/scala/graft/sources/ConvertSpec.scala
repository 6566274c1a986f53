package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `ParquetTable.convert` — CONVERT TO DELTA parity: adopt a plain
  * parquet layout as a versioned table by RENAMING files into a data dir
  * (no data rewritten), then serve everything the versioned layer has
  * (time travel, MERGE, DV, skipping sidecar written at convert).
  */
class ConvertSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false)))

  private val pschema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false),
    StructField("day", StringType, nullable = false)))

  test("unpartitioned: files renamed, image identical, versioned verbs work") {
    val path = tmpDir("conv-un") + "/t"
    frame(schema, Seq(Row(1, "a"), Row(2, "b"), Row(3, "c")))
      .repartition(3).write.parquet(path)
    val before = spark.read.parquet(path).collect().map(_.toSeq).toSet
    val nFiles = new java.io.File(path).listFiles
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(ParquetTable.convert(spark, path) === 1L)
    // no root parquet files remain; same count now lives in the data dir
    assert(new java.io.File(path).listFiles
      .count(f => f.isFile && f.getName.endsWith(".parquet")) === 0)
    val dd = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("_d"))
    assert(dd.length === 1)
    assert(dd.head.listFiles.count(_.getName.endsWith(".parquet")) === nFiles)
    assert(ParquetTable.read(spark, path).collect().map(_.toSeq).toSet === before)
    // sidecar landed → skipping/metadata machinery live from v1
    assert(DataSkipping.readStats(spark, dd.head.toString).isDefined)
    // the converted table is a full citizen: merge then time travel
    ParquetTable.merge(spark, path, frame(schema, Seq(Row(2, "B"))), Seq("id"))
    assert(ParquetTable.readAt(spark, path, 1L).collect().map(_.toSeq).toSet === before)
    assert(ParquetTable.read(spark, path).filter(col("id") === 2).head().getString(1) === "B")
  }

  test("partitioned: hive dirs adopted as entries, partition-scoped merges after") {
    val path = tmpDir("conv-part") + "/t"
    frame(pschema, Seq(Row(1, "a", "d1"), Row(2, "b", "d2"), Row(3, "c", "d2")))
      .write.partitionBy("day").parquet(path)
    val before = spark.read.parquet(path)
      .select("id", "v", "day").collect().map(_.toSeq).toSet
    assert(ParquetTable.convert(spark, path, Seq("day")) === 1L)
    val entries = ParquetTable.partitionEntries(spark, path, 1L).get
    assert(entries.map(_._1).sorted === Seq("day=d1", "day=d2"))
    assert(ParquetTable.read(spark, path)
      .select("id", "v", "day").collect().map(_.toSeq).toSet === before)
    // partition-scoped merge re-points only d2
    ParquetTable.mergeVersioned(spark, path,
      frame(pschema, Seq(Row(2, "B", "d2"))), Seq("id"), Seq("day"))
    val e2 = ParquetTable.partitionEntries(spark, path, 2L).get.toMap
    assert(e2("day=d1") === entries.toMap.apply("day=d1"), "untouched partition moved")
  }

  test("SQL verb: CONVERT TO GRAFT parquet.`path` [PARTITIONED BY (...)]") {
    val p1 = tmpDir("conv-sql") + "/t"
    frame(schema, Seq(Row(1, "a"))).write.parquet(p1)
    val out = graft.sql.GraftSql.sql(spark, s"CONVERT TO GRAFT parquet.`$p1`").head()
    assert(out.getLong(0) === 1L)
    assert(ParquetTable.currentVersion(spark, p1) === Some(1L))
    val p2 = tmpDir("conv-sql-p") + "/t"
    frame(pschema, Seq(Row(1, "a", "d1"))).write.partitionBy("day").parquet(p2)
    graft.sql.GraftSql.sql(spark,
      s"CONVERT TO GRAFT parquet.`$p2` PARTITIONED BY (day)")
    assert(ParquetTable.partitionEntries(spark, p2, 1L).get.map(_._1) === Seq("day=d1"))
  }

  test("lost creation race restores the plain layout — nothing stranded") {
    val path = tmpDir("conv-race") + "/t"
    frame(schema, Seq(Row(1, "a"), Row(2, "b"), Row(3, "c")))
      .repartition(3).write.parquet(path)
    val rootFiles = new java.io.File(path).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    val prev = ParquetTable.logCommitter
    // always-losing committer = a concurrent create/convert won v1
    ParquetTable.logCommitter = new LogCommitter {
      override def commit(fs: org.apache.hadoop.fs.FileSystem,
          target: org.apache.hadoop.fs.Path, content: Array[Byte]): Boolean = false
    }
    try {
      val e = intercept[IllegalStateException](ParquetTable.convert(spark, path))
      assert(e.getMessage.contains("restored"), e.getMessage)
    } finally ParquetTable.logCommitter = prev
    // every file is back at the root and the staging dir is gone — a
    // later vacuum has nothing unreferenced to destroy
    assert(new java.io.File(path).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet === rootFiles)
    assert(!new java.io.File(path).listFiles
      .exists(f => f.isDirectory && f.getName.startsWith("_d")))
    // race over: the layout converts cleanly
    assert(ParquetTable.convert(spark, path) === 1L)

    // same for the partitioned sweep (whole hive dirs restored)
    val p2 = tmpDir("conv-race-p") + "/t"
    frame(pschema, Seq(Row(1, "a", "d1"), Row(2, "b", "d2")))
      .write.partitionBy("day").parquet(p2)
    ParquetTable.logCommitter = new LogCommitter {
      override def commit(fs: org.apache.hadoop.fs.FileSystem,
          target: org.apache.hadoop.fs.Path, content: Array[Byte]): Boolean = false
    }
    try intercept[IllegalStateException](ParquetTable.convert(spark, p2, Seq("day")))
    finally ParquetTable.logCommitter = prev
    assert(new java.io.File(p2).listFiles
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day="))
      .toSet === Set("day=d1", "day=d2"))
    assert(!new java.io.File(p2).listFiles
      .exists(f => f.isDirectory && f.getName.startsWith("_d")))
    assert(ParquetTable.convert(spark, p2, Seq("day")) === 1L)
  }

  test("refuses an already-versioned table and an empty layout") {
    val path = tmpDir("conv-bad") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(1, "a"))), path)
    assert(intercept[IllegalArgumentException] {
      ParquetTable.convert(spark, path)
    }.getMessage.contains("already"))
    val empty = tmpDir("conv-empty") + "/t"
    new java.io.File(empty).mkdirs()
    assert(intercept[IllegalArgumentException] {
      ParquetTable.convert(spark, empty)
    }.getMessage.contains("no parquet files"))
  }
}
