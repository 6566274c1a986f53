package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Delta-MERGE-equivalent semantics over parquet (SURVEY §2.1-S6, §7):
  * update-all / insert-all, idempotency, partition-scoped rewrite.
  */
class ParquetTableSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("day", StringType, nullable = true)))

  private def df(rows: Row*) = frame(schema, rows)

  test("merge: matched rows updated, unmatched inserted") {
    val path = tmpDir("merge") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1"), Row(2, "b", "d1")), path)
    ParquetTable.merge(spark, path, df(Row(2, "B", "d1"), Row(3, "c", "d2")), Seq("id"))
    val out = ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out === Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("merge is idempotent (replaying the same batch changes nothing)") {
    val path = tmpDir("merge-idem") + "/t"
    val batch = df(Row(1, "a", "d1"), Row(2, "b", "d1"))
    ParquetTable.merge(spark, path, batch, Seq("id")) // creates
    ParquetTable.merge(spark, path, batch, Seq("id")) // replay
    ParquetTable.merge(spark, path, batch, Seq("id")) // replay again
    assert(ParquetTable.read(spark, path).count() === 2)
  }

  test("merge keeps PKs unique when the update batch has duplicate keys") {
    val path = tmpDir("merge-dup") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1")), path)
    ParquetTable.merge(spark, path, df(Row(1, "x", "d1"), Row(1, "y", "d1")), Seq("id"))
    val rows = ParquetTable.read(spark, path).collect()
    assert(rows.length === 1)
  }

  test("partitioned merge rewrites only affected partitions") {
    val dir = tmpDir("merge-part")
    val path = dir + "/t"
    ParquetTable.create(
      df(Row(1, "a", "d1"), Row(2, "b", "d2")), path, Seq("day"))
    val d2Before = new java.io.File(s"$path/day=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap

    ParquetTable.merge(spark, path, df(Row(1, "A", "d1"), Row(3, "c", "d1")),
      Seq("id"), Seq("day"))

    val out = ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out === Map(1 -> ("A", "d1"), 2 -> ("b", "d2"), 3 -> ("c", "d1")))
    // untouched partition's files were not rewritten
    val d2After = new java.io.File(s"$path/day=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(d2After === d2Before)
  }

  test("merge on empty/missing table creates it") {
    val path = tmpDir("merge-create") + "/t"
    ParquetTable.merge(spark, path, df(Row(1, "a", "d1")), Seq("id"))
    assert(ParquetTable.read(spark, path).count() === 1)
  }

  test("atomicReplace swaps content and leaves no temp/trash dirs") {
    val dir = tmpDir("swap")
    val path = dir + "/t"
    ParquetTable.create(df(Row(1, "old", "d1")), path)
    ParquetTable.atomicReplace(spark, path, df(Row(2, "new", "d1")), Nil)
    val rows = ParquetTable.read(spark, path).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(2))
    val leftovers = new java.io.File(dir).list().filter(_ != "t")
    assert(leftovers.isEmpty)
  }

  test("append accumulates rows") {
    val path = tmpDir("append") + "/t"
    ParquetTable.append(df(Row(1, "a", "d1")), path)
    ParquetTable.append(df(Row(2, "b", "d1")), path)
    assert(ParquetTable.read(spark, path).count() === 2)
  }
}
