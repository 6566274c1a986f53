package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** SHALLOW CLONE: metadata-only creation, divergence isolation in both
  * directions, historical-version clones, vacuum ownership boundaries,
  * and the SQL statement.
  */
class CloneSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("day", StringType, nullable = true)))

  private def df(rows: Row*) = frame(schema, rows)

  private def dataDirsUnder(path: String): Seq[String] = {
    val d = new java.io.File(path)
    if (!d.isDirectory) Nil
    else d.listFiles.filter(f => f.isDirectory &&
      (f.getName.startsWith("_d") || f.getName.startsWith("_v"))).map(_.getName).toSeq
  }

  test("clone is metadata-only and reads the source image") {
    val root = tmpDir("clone-basic")
    val src = s"$root/src"
    val dst = s"$root/dst"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d2")), src)
    assert(ParquetTable.shallowClone(spark, src, dst, None) === 1L)
    assert(dataDirsUnder(dst).isEmpty) // zero data files under the clone
    val got = ParquetTable.read(spark, dst).select("id", "v")
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(got === Seq((1, "a"), (2, "b")))
  }

  test("source and clone diverge independently after the clone point") {
    val root = tmpDir("clone-diverge")
    val src = s"$root/src"
    val dst = s"$root/dst"
    ParquetTable.create(df(Row(1, "a", "d1")), src)
    ParquetTable.shallowClone(spark, src, dst, None)
    // source write: clone must not see it
    ParquetTable.merge(spark, src, df(Row(1, "SRC", "d1")), Seq("id"))
    assert(ParquetTable.read(spark, dst).select("v").head().getString(0) === "a")
    // clone write: source must not see it; clone data lands under clone
    ParquetTable.merge(spark, dst, df(Row(2, "CLONE", "d2")), Seq("id"))
    assert(ParquetTable.read(spark, src).count() === 1L)
    assert(ParquetTable.read(spark, dst).count() === 2L)
    assert(dataDirsUnder(dst).nonEmpty)
  }

  test("clone of a historical version; cloning an existing table fails") {
    val root = tmpDir("clone-hist")
    val src = s"$root/src"
    ParquetTable.create(df(Row(1, "a", "d1")), src) // v1
    ParquetTable.merge(spark, src, df(Row(1, "A", "d1")), Seq("id")) // v2
    val dst = s"$root/dst"
    ParquetTable.shallowClone(spark, src, dst, Some(1L))
    assert(ParquetTable.read(spark, dst).select("v").head().getString(0) === "a")
    val e = intercept[IllegalArgumentException] {
      ParquetTable.shallowClone(spark, src, dst, None)
    }
    assert(e.getMessage.contains("already holds data"))
  }

  test("partitioned clone: merge rewrites only touched partitions, rest stay on source dirs") {
    val root = tmpDir("clone-part")
    val src = s"$root/src"
    val dst = s"$root/dst"
    ParquetTable.createVersioned(
      df(Row(1, "a", "d1"), Row(2, "b", "d2")), src, Seq("day"))
    ParquetTable.shallowClone(spark, src, dst, None)
    ParquetTable.mergeVersioned(spark, dst, df(Row(2, "B", "d2")), Seq("id"), Seq("day"))
    val entries = ParquetTable.partitionEntries(spark, dst, 2L).get.toMap
    assert(entries("day=d1").startsWith("/")) // untouched: still absolute source dir
    assert(!entries("day=d2").startsWith("/")) // rewritten: clone-local dir
    val got = ParquetTable.read(spark, dst).select("id", "v")
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(got === Seq((1, "a"), (2, "B")))
  }

  test("vacuum on the clone never deletes source data") {
    val root = tmpDir("clone-vacuum")
    val src = s"$root/src"
    val dst = s"$root/dst"
    ParquetTable.create(df(Row(1, "a", "d1")), src)
    ParquetTable.shallowClone(spark, src, dst, None)
    ParquetTable.merge(spark, dst, df(Row(1, "X", "d1")), Seq("id")) // v2: clone-local
    ParquetTable.vacuum(spark, dst, keepLast = 1)
    // source still fully readable — its dirs were never the clone's to reclaim
    assert(ParquetTable.read(spark, src).select("v").head().getString(0) === "a")
    assert(ParquetTable.read(spark, dst).select("v").head().getString(0) === "X")
  }

  test("SQL: CREATE TABLE ... SHALLOW CLONE ... [VERSION AS OF n]") {
    val root = tmpDir("clone-sql")
    val src = s"$root/src"
    ParquetTable.create(df(Row(1, "a", "d1")), src) // v1
    ParquetTable.merge(spark, src, df(Row(1, "A", "d1")), Seq("id")) // v2
    val v = graft.sql.GraftSql.sql(spark,
      s"CREATE TABLE graft.`$root/dst` SHALLOW CLONE graft.`$src`")
      .head().getLong(0)
    assert(v === 1L)
    assert(graft.sql.GraftSql.sql(spark,
      s"SELECT v FROM graft.`$root/dst`").head().getString(0) === "A")
    graft.sql.GraftSql.sql(spark,
      s"CREATE TABLE graft.`$root/dst1` SHALLOW CLONE graft.`$src` VERSION AS OF 1")
    assert(graft.sql.GraftSql.sql(spark,
      s"SELECT v FROM graft.`$root/dst1`").head().getString(0) === "a")
  }
}
