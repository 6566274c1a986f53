package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sql.GraftSql

/** `fsck` integrity report: detects every corruption shape the versioned
  * layout can develop (dangling partitioned entries, missing data/DV
  * dirs, orphaned bytes) and stays silent on healthy tables — including
  * MOR chains, whose multi-dir manifests and DV headers are exactly the
  * shapes a naive checker would false-positive on.
  */
class FsckSpec extends SparkSpec {
  import spark.implicits._

  private def fs(path: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)

  private def kinds(path: String): Map[String, Long] =
    ParquetTable.fsck(spark, path).groupBy("kind").count()
      .as[(String, Long)].collect().toMap

  test("healthy tables report zero findings (COW, partitioned, MOR+DV chains)") {
    val dir = tmpDir("fsck")
    val cow = s"$dir/cow"
    ParquetTable.create(Seq((1L, "a")).toDF("id", "v"), cow)
    ParquetTable.merge(spark, cow, Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    assert(ParquetTable.fsck(spark, cow).isEmpty)

    val part = s"$dir/part"
    ParquetTable.createVersioned(
      Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"), part, Seq("day"))
    ParquetTable.merge(spark, part,
      Seq((3L, "d1")).toDF("id", "day"), Seq("id"), Seq("day"))
    assert(ParquetTable.fsck(spark, part).isEmpty)

    val mor = s"$dir/mor"
    ParquetTable.create((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), mor)
    ParquetTable.merge(spark, mor, Seq((7L, "u")).toDF("id", "v"), Seq("id"),
      mergeOnRead = Some(true))
    assert(ParquetTable.fsck(spark, mor).isEmpty)
  }

  test("a deleted partition subdir surfaces as dangling_entry naming the partition") {
    val path = tmpDir("fsck-dangle") + "/t"
    ParquetTable.createVersioned(
      Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"), path, Seq("day"))
    val (p, dd) = ParquetTable.partitionEntries(spark, path, 1L).get
      .find(_._1 == "day=d1").get
    fs(path).delete(new Path(new Path(path, dd), p), true)
    val got = ParquetTable.fsck(spark, path)
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(("dangling_entry", 1L, s"day=d1 -> $dd")))
  }

  test("a deleted unpartitioned data dir surfaces as missing_data_dir for ITS version only") {
    val path = tmpDir("fsck-md") + "/t"
    ParquetTable.create(Seq((1L, "a")).toDF("id", "v"), path)
    ParquetTable.merge(spark, path, Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    // v1's dir is only referenced by v1 (COW rewrote v2 into a fresh dir)
    val v1dir = ParquetTable.fsck(spark, path) // healthy first
    assert(v1dir.isEmpty)
    val d1 = {
      val c = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path, "_graft_manifest",
          f"v${1L}%020d")), "UTF-8")
      c.linesIterator.filterNot(_.startsWith("#")).next().trim
    }
    fs(path).delete(new Path(path, d1), true)
    val got = ParquetTable.fsck(spark, path)
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(("missing_data_dir", 1L, d1)))
    // current reads still work; time travel to v1 is what broke
    assert(ParquetTable.read(spark, path).count() === 2L)
  }

  test("a deleted DV dir surfaces as missing_dv; orphaned dirs as orphan_dir/orphan_dv") {
    val path = tmpDir("fsck-dv") + "/t"
    ParquetTable.create((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    ParquetTable.merge(spark, path, Seq((7L, "u")).toDF("id", "v"), Seq("id"),
      mergeOnRead = Some(true))
    val dvs = ParquetTable.dvDirs(spark, path,
      ParquetTable.currentVersion(spark, path).get)
    assert(dvs.nonEmpty, "MOR merge must have committed a DV")
    fs(path).delete(new Path(path, dvs.head), true)
    assert(kinds(path) === Map("missing_dv" -> 1L))

    // plant an orphan data dir (a crashed writer's leftovers)
    fs(path).mkdirs(new Path(path, "_d999_orphan"))
    val k2 = kinds(path)
    assert(k2("orphan_dir") === 1L && k2("missing_dv") === 1L)
    // vacuum reclaims the orphan; the missing DV (still referenced) remains
    ParquetTable.vacuum(spark, path, keepLast = 1)
    assert(kinds(path) === Map("missing_dv" -> 1L))
  }

  test("SQL surface: FSCK graft.`path` returns the same report") {
    val path = tmpDir("fsck-sql") + "/t"
    ParquetTable.createVersioned(
      Seq((1L, "d1")).toDF("id", "day"), path, Seq("day"))
    assert(GraftSql.sql(spark, s"FSCK graft.`$path`").isEmpty)
    val (p, dd) = ParquetTable.partitionEntries(spark, path, 1L).get.head
    fs(path).delete(new Path(new Path(path, dd), p), true)
    val got = GraftSql.sql(spark, s"FSCK graft.`$path`")
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(("dangling_entry", 1L, s"$p -> $dd")))
  }
}
