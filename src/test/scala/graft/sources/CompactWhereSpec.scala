package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Partition-scoped compaction ([[ParquetTable.compactWhere]], SQL
  * `OPTIMIZE … WHERE`): only matching partitions fold their MOR dir
  * chains / materialize their deletion vectors; cold partitions keep
  * their entries (and bytes) verbatim — the property that makes
  * compaction O(hot partition) instead of O(table).
  */
class CompactWhereSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false),
    StructField("day", StringType, nullable = false)))

  private def pdf(rows: Row*) = frame(schema, rows)

  private def rowsOf(path: String): Map[Int, (String, String)] =
    ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(r.fieldIndex("id")) ->
        (r.getString(r.fieldIndex("v")), r.getString(r.fieldIndex("day")))).toMap

  /** table with a 3-dir MOR chain + DVs in day=d1; day=d2 untouched */
  private def chained(): String = {
    val path = tmpDir("cw") + "/t"
    ParquetTable.createVersioned(pdf(
      Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path, Seq("day"))
    ParquetTable.mergeVersioned(spark, path, pdf(Row(1, "A1", "d1")),
      Seq("id"), Seq("day"), mergeOnRead = Some(true)) // v2
    ParquetTable.mergeVersioned(spark, path, pdf(Row(2, "B1", "d1")),
      Seq("id"), Seq("day"), mergeOnRead = Some(true)) // v3
    path
  }

  test("hot partition folds to one dir; cold partition entries verbatim; image intact") {
    val path = chained()
    val before = rowsOf(path)
    val e3 = ParquetTable.partitionEntries(spark, path, 3L).get
    assert(e3.count(_._1 == "day=d1") === 3) // the chain to fold
    val coldBefore = e3.filter(_._1 == "day=d2")

    val v = ParquetTable.compactWhere(spark, path, col("day") === "d1")
    assert(v === 4L)
    val e4 = ParquetTable.partitionEntries(spark, path, 4L).get
    assert(e4.count(_._1 == "day=d1") === 1) // folded
    assert(e4.filter(_._1 == "day=d2") === coldBefore) // cold dir untouched
    assert(rowsOf(path) === before)
    assert(before === Map(1 -> ("A1", "d1"), 2 -> ("B1", "d1"), 3 -> ("c", "d2")))
    // time travel across the compaction still works
    assert(ParquetTable.readAt(spark, path, 1L).count() === 3)
  }

  test("deletes on untouched partitions stay in force (DV carry)") {
    val path = chained()
    ParquetTable.deleteVectors(spark, path, col("id") === 3) // DV in d2
    val before = rowsOf(path)
    assert(!before.contains(3))
    ParquetTable.compactWhere(spark, path, col("day") === "d1")
    assert(rowsOf(path) === before)
  }

  test("data-column predicate is refused; unpartitioned table is refused") {
    val path = chained()
    val e = intercept[IllegalArgumentException] {
      ParquetTable.compactWhere(spark, path, col("v") === "a")
    }
    assert(e.getMessage.contains("non-partition"))
    val up = tmpDir("cw-up") + "/t"
    ParquetTable.create(pdf(Row(1, "a", "d1")), up)
    intercept[IllegalStateException] {
      ParquetTable.compactWhere(spark, up, col("day") === "d1")
    }
  }

  test("no matching partition commits nothing") {
    val path = chained()
    val v = ParquetTable.currentVersion(spark, path).get
    assert(ParquetTable.compactWhere(spark, path, col("day") === "nope") === v)
    assert(ParquetTable.currentVersion(spark, path).get === v)
  }

  test("SQL: OPTIMIZE ... WHERE drives the same path") {
    val path = chained()
    val before = rowsOf(path)
    val out = graft.sql.GraftSql.sql(spark,
      s"OPTIMIZE graft.`$path` WHERE day = 'd1'").collect()
    assert(out.head.getLong(0) === 4L)
    val e4 = ParquetTable.partitionEntries(spark, path, 4L).get
    assert(e4.count(_._1 == "day=d1") === 1)
    assert(rowsOf(path) === before)
  }
}
