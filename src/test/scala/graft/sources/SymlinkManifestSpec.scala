package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.sql.GraftSql

/** `GENERATE symlink_format_manifest` — the Presto/Trino/Athena interop
  * export: manifests must list EXACTLY the current version's live bytes
  * (a foreign engine reads the listed paths verbatim; one stale path is
  * a wrong answer, not a warning), track partition drops across
  * regeneration, and refuse un-exportable (DV-carrying) snapshots.
  */
class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  private def fs =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)

  private def manifestLines(mf: String): Seq[String] = {
    val p = new Path(mf)
    val in = fs.open(p)
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    try in.readFully(0, buf) finally in.close()
    new String(buf, "UTF-8").linesIterator.filter(_.nonEmpty).toSeq
  }

  test("unpartitioned: manifest lists exactly the live files; reading them reproduces the table") {
    val path = tmpDir("symlink") + "/t"
    ParquetTable.create((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    ParquetTable.merge(spark, path, Seq((41L, "n")).toDF("id", "v"), Seq("id"))
    val out = ParquetTable.generateSymlinkManifest(spark, path)
    assert(out.length == 1 && out.head._2 > 0)
    val listed = manifestLines(out.head._1)
    assert(listed.size == out.head._2)
    assert(listed.forall(u => u.startsWith("file:") && u.endsWith(".parquet")))
    // a foreign engine reading the listed paths sees the table exactly
    val viaManifest = spark.read.parquet(listed.map(new Path(_).toUri.getPath): _*)
    val table = ParquetTable.read(spark, path)
    assert(viaManifest.count() == 41L)
    assert(viaManifest.exceptAll(table).isEmpty && table.exceptAll(viaManifest).isEmpty)
  }

  test("partitioned: one manifest per partition; dropped partitions vanish on regeneration") {
    val path = tmpDir("symlink-p") + "/t"
    ParquetTable.createVersioned(
      Seq((1L, "d1"), (2L, "d2"), (3L, "d2")).toDF("id", "day"), path, Seq("day"))
    val out = ParquetTable.generateSymlinkManifest(spark, path).toMap
    assert(out.keySet.map(m => new Path(m).getParent.getName) == Set("day=d1", "day=d2"))
    out.foreach { case (mf, n) => assert(manifestLines(mf).size == n && n > 0) }
    // per-partition manifests list only that partition's rows
    val d2 = out.keys.find(_.contains("day=d2")).get
    val d2rows = spark.read.parquet(
      manifestLines(d2).map(new Path(_).toUri.getPath): _*)
    assert(d2rows.select("id").as[Long].collect().toSet == Set(2L, 3L))

    // delete ALL of d1, regenerate: its manifest dir must disappear
    ParquetTable.delete(spark, path,
      org.apache.spark.sql.functions.col("day") === "d1")
    val out2 = ParquetTable.generateSymlinkManifest(spark, path).toMap
    assert(out2.keySet.map(m => new Path(m).getParent.getName) == Set("day=d2"))
    assert(!fs.exists(new Path(path, "_symlink_format_manifest/day=d1")))
  }

  test("regeneration after a merge reflects the new version") {
    val path = tmpDir("symlink-v") + "/t"
    ParquetTable.create(Seq((1L, "a")).toDF("id", "v"), path)
    ParquetTable.generateSymlinkManifest(spark, path)
    ParquetTable.merge(spark, path, Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    val out = ParquetTable.generateSymlinkManifest(spark, path)
    val rows = spark.read.parquet(
      manifestLines(out.head._1).map(new Path(_).toUri.getPath): _*)
    assert(rows.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("refuses DV-carrying snapshots and names the fix; compact unblocks") {
    val path = tmpDir("symlink-dv") + "/t"
    ParquetTable.create((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    ParquetTable.merge(spark, path, Seq((7L, "u")).toDF("id", "v"), Seq("id"),
      mergeOnRead = Some(true))
    val e = intercept[IllegalStateException] {
      ParquetTable.generateSymlinkManifest(spark, path)
    }
    assert(e.getMessage.contains("deletion vectors")
      && e.getMessage.contains("compact"))
    ParquetTable.compact(spark, path)
    val out = ParquetTable.generateSymlinkManifest(spark, path)
    val rows = spark.read.parquet(
      manifestLines(out.head._1).map(new Path(_).toUri.getPath): _*)
    assert(rows.count() == 50L)
    assert(rows.filter("id = 7 AND v = 'u'").count() == 1L)
  }

  test("graft.symlink.autoGenerate: commits regenerate the export; ineligible " +
    "snapshots are skipped, not failed") {
    val path = tmpDir("symlink-auto") + "/t"
    ParquetTable.create(Seq((1L, "a")).toDF("id", "v"), path)
    TableProperties.set(spark, path,
      Map("graft.symlink.autoGenerate" -> "true"))
    // an insert commit auto-refreshes the export
    ParquetTable.insertInto(spark, path, Seq((2L, "b")).toDF("id", "v"))
    val manifest = s"$path/_symlink_format_manifest/manifest"
    val after2 = manifestLines(manifest)
    assert(spark.read.parquet(
      after2.map(new Path(_).toUri.getPath): _*).count() === 2)
    // a DV-carrying commit SKIPS the refresh (manual verb refuses there);
    // the export stays at the last eligible snapshot instead of failing
    ParquetTable.deleteVectors(spark, path,
      org.apache.spark.sql.functions.col("id") === 1L)
    assert(manifestLines(manifest) === after2)
    // compact materializes the DVs — its commit catches the export up
    ParquetTable.compact(spark, path)
    val afterCompact = manifestLines(manifest)
    assert(spark.read.parquet(
      afterCompact.map(new Path(_).toUri.getPath): _*).count() === 1)
  }

  test("SQL verb returns one row per manifest with counts") {
    val path = tmpDir("symlink-sql") + "/t"
    ParquetTable.createVersioned(
      Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"), path, Seq("day"))
    val rows = GraftSql.sql(spark,
        s"GENERATE symlink_format_manifest FOR TABLE graft.`$path`")
      .as[(String, Long)].collect().toMap
    assert(rows.size == 2 && rows.values.forall(_ > 0))
    assert(rows.keys.forall(m => fs.exists(new Path(m))))
  }
}
