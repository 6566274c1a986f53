package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Deletion vectors (merge-on-read DELETE): no data-file rewrites, reads
  * exclude marked rows everywhere (snapshot, readWhere, time travel,
  * merge targets), carry-forward through merges/updates/restore/clone,
  * materialization on OPTIMIZE/compact, vacuum ownership, CDF capture,
  * metadata-aggregate safety, and the SQL mode conf.
  */
class DeletionVectorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("day", StringType, nullable = true)))

  private def df(rows: Row*) = frame(schema, rows)

  private def ids(path: String): Seq[Int] =
    ParquetTable.read(spark, path).select("id").collect().map(_.getInt(0)).sorted.toSeq

  private def dataFilesUnder(path: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(path)
    root.listFiles.filter(f => f.isDirectory &&
        (f.getName.startsWith("_d") || f.getName.startsWith("_v")))
      .flatMap(walk).map(_.getAbsolutePath).filter(_.endsWith(".parquet")).sorted.toSeq
  }

  test("deleteVectors removes rows without touching a single data file") {
    val path = tmpDir("dv-basic") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path)
    val before = dataFilesUnder(path)
    val v = ParquetTable.deleteVectors(spark, path, col("id") === 2)
    assert(v === 2L)
    assert(dataFilesUnder(path) === before) // zero rewrites
    assert(ids(path) === Seq(1, 3))
    assert(ParquetTable.readAt(spark, path, 1L).count() === 3L) // time travel intact
  }

  test("second delete is cumulative; re-deleting a deleted row is a no-op") {
    val path = tmpDir("dv-cumulative") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path)
    ParquetTable.deleteVectors(spark, path, col("id") === 1)
    val v = ParquetTable.deleteVectors(spark, path, col("id") <= 2)
    assert(v === 3L)
    assert(ids(path) === Seq(3))
    // the second DV holds only id=2 (id=1 was already invisible)
    assert(ParquetTable.dvDirs(spark, path, 3L).size === 2)
    // no-match → no-op, version unchanged
    assert(ParquetTable.deleteVectors(spark, path, col("id") === 99) === 3L)
  }

  test("readWhere and filtered SQL plans exclude vector-deleted rows") {
    val path = tmpDir("dv-readwhere") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path)
    ParquetTable.deleteVectors(spark, path, col("id") === 1)
    val got = ParquetTable.readWhere(spark, path, col("id") < 3)
      .select("id").collect().map(_.getInt(0)).sorted
    assert(got === Seq(2))
  }

  test("COUNT(*) over a DV table is exact (metadata-agg fold must not fire)") {
    val path = tmpDir("dv-count") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path)
    ParquetTable.deleteVectors(spark, path, col("id") === 2)
    assert(ParquetTable.read(spark, path).count() === 2L)
    assert(ParquetTable.read(spark, path).agg(count(lit(1))).head().getLong(0) === 2L)
  }

  test("merge after DV: upserted key returns, untouched deleted keys stay deleted") {
    val path = tmpDir("dv-merge") + "/t"
    ParquetTable.createVersioned(df(
      Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path, Seq("day"))
    ParquetTable.deleteVectors(spark, path, col("id") === 1 || col("id") === 3)
    // merge touches ONLY partition d1: id=1 comes back as an insert there
    ParquetTable.mergeVersioned(spark, path, df(Row(1, "a2", "d1")), Seq("id"), Seq("day"))
    assert(ids(path) === Seq(1, 2)) // id=3 (untouched d2) stays deleted
    val v1 = ParquetTable.read(spark, path).filter(col("id") === 1)
      .select("v").head().getString(0)
    assert(v1 === "a2")
  }

  test("update after DV does not resurrect deleted rows") {
    val path = tmpDir("dv-update") + "/t"
    ParquetTable.createVersioned(df(
      Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path, Seq("day"))
    ParquetTable.deleteVectors(spark, path, col("id") === 2)
    ParquetTable.update(spark, path, col("day") === "d1", Map("v" -> lit("upd")))
    assert(ids(path) === Seq(1, 3))
    assert(ParquetTable.read(spark, path).filter(col("v") === "upd").count() === 1L)
  }

  test("OPTIMIZE materializes the deletes and drops the dv header") {
    val path = tmpDir("dv-optimize") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path)
    ParquetTable.deleteVectors(spark, path, col("id") === 2)
    val v = ParquetTable.optimize(spark, path, Seq("id"), numFiles = 2)
    assert(ParquetTable.dvDirs(spark, path, v).isEmpty)
    assert(ids(path) === Seq(1, 3))
    // pre-optimize versions still read through their own DVs
    assert(ParquetTable.readAt(spark, path, 2L).count() === 2L)
    assert(ParquetTable.readAt(spark, path, 1L).count() === 3L)
  }

  test("restore keeps the restored version's deletions; restoring pre-DV resurrects") {
    val path = tmpDir("dv-restore") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1")), path)
    ParquetTable.deleteVectors(spark, path, col("id") === 2) // v2
    ParquetTable.restore(spark, path, 2L) // v3 ≡ v2: deletion in force
    assert(ids(path) === Seq(1))
    ParquetTable.restore(spark, path, 1L) // v4 ≡ v1: pre-DV image
    assert(ids(path) === Seq(1, 2))
  }

  test("shallow clone reads through the source's deletion vectors") {
    val root = tmpDir("dv-clone")
    val src = s"$root/src"
    val dst = s"$root/dst"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1")), src)
    ParquetTable.deleteVectors(spark, src, col("id") === 1)
    ParquetTable.shallowClone(spark, src, dst, None)
    assert(ids(dst) === Seq(2))
  }

  test("cdf capture + tableChanges emit the vector-deleted rows per commit") {
    val path = tmpDir("dv-cdf") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path)
    ParquetTable.deleteVectors(spark, path, col("id") === 2, cdf = true)
    val ch = ParquetTable.tableChanges(spark, path, 2L, 2L, Seq("id"))
      .select("id", "_change_type", "_commit_version").collect()
    assert(ch.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((2, "delete", 2L)))
  }

  test("vacuum reaps unreferenced dv dirs and keeps referenced ones") {
    val path = tmpDir("dv-vacuum") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path)
    ParquetTable.deleteVectors(spark, path, col("id") === 1) // v2: dv A
    ParquetTable.optimize(spark, path, Seq("id"), numFiles = 1) // v3: no dv
    ParquetTable.deleteVectors(spark, path, col("id") === 2) // v4: dv B
    val dvRoot = new java.io.File(path, "_graft_dv")
    assert(dvRoot.listFiles.count(_.isDirectory) === 2)
    ParquetTable.vacuum(spark, path, keepLast = 2) // keeps v3, v4 → only dv B referenced
    assert(dvRoot.listFiles.count(_.isDirectory) === 1)
    assert(ids(path) === Seq(3))
    assert(ParquetTable.readAt(spark, path, 3L).count() === 2L)
  }

  test("DESCRIBE DETAIL reports live num_deleted_rows and DV-adjusted num_rows") {
    val path = tmpDir("dv-detail") + "/t"
    ParquetTable.createVersioned(df(
      Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path, Seq("day"))
    ParquetTable.deleteVectors(spark, path, col("id") === 1 || col("id") === 3)
    val d1 = ParquetTable.detail(spark, path).head()
    assert(d1.getLong(d1.fieldIndex("num_deleted_rows")) === 2L)
    assert(d1.getLong(d1.fieldIndex("num_rows")) === 1L)
    // rewrite partition d1: the id=1 delete MATERIALIZES into the new dir
    // (the slice was DV-filtered), so its DV entry goes stale and must
    // drop out of the LIVE count; d2's entry (id=3) stays live
    ParquetTable.mergeVersioned(spark, path, df(Row(4, "d", "d1")), Seq("id"), Seq("day"))
    val d2 = ParquetTable.detail(spark, path).head()
    assert(d2.getLong(d2.fieldIndex("num_deleted_rows")) === 1L)
    assert(d2.getLong(d2.fieldIndex("num_rows")) === 2L) // ids 2,4 live
    assert(ids(path) === Seq(2, 4))
  }

  test("SQL DELETE routes through deletion vectors under merge-on-read mode") {
    val path = tmpDir("dv-sql") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1")), path)
    val before = dataFilesUnder(path)
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try {
      val v = graft.sql.GraftSql.sql(spark,
        s"DELETE FROM graft.`$path` WHERE id = 1").head().getLong(0)
      assert(v === 2L)
    } finally spark.conf.unset("spark.graft.delete.mode")
    assert(dataFilesUnder(path) === before)
    assert(ids(path) === Seq(2))
  }

  test("deleteVectors refuses a plain (unversioned) layout") {
    val path = tmpDir("dv-plain") + "/t"
    df(Row(1, "a", "d1")).write.parquet(path)
    val e = intercept[IllegalStateException] {
      ParquetTable.deleteVectors(spark, path, col("id") === 1)
    }
    assert(e.getMessage.contains("no versioned table"))
  }
}
