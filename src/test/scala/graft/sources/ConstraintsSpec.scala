package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** CHECK constraints: DDL, write-side enforcement at every commit path,
  * NULL semantics, orphan cleanup on violation, clone inheritance, SQL.
  */
class ConstraintsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("day", StringType, nullable = true)))

  private def df(rows: Row*) = frame(schema, rows)

  test("add validates existing data; bad existing rows block the DDL") {
    val path = tmpDir("con-add") + "/t"
    ParquetTable.create(df(Row(5, "a", "d1")), path)
    Constraints.add(spark, path, "id_pos", "id > 0")
    assert(Constraints.list(spark, path) === Seq("id_pos" -> "id > 0"))
    val e = intercept[IllegalArgumentException] {
      Constraints.add(spark, path, "id_big", "id > 10")
    }
    assert(e.getMessage.contains("existing row violates"))
    assert(Constraints.list(spark, path).map(_._1) === Seq("id_pos"))
  }

  test("merge commits enforce constraints; violations leave no trace") {
    val path = tmpDir("con-merge") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1")), path) // v1
    Constraints.add(spark, path, "id_pos", "id > 0")
    val e = intercept[IllegalArgumentException] {
      ParquetTable.merge(spark, path, df(Row(-2, "bad", "d1")), Seq("id"))
    }
    assert(e.getMessage.contains("violates CHECK constraint"))
    assert(e.getMessage.contains("id_pos"))
    // nothing committed, no orphan data dirs beyond v1's
    assert(ParquetTable.currentVersion(spark, path) === Some(1L))
    assert(ParquetTable.read(spark, path).count() === 1L)
    // a clean merge still goes through
    ParquetTable.merge(spark, path, df(Row(2, "b", "d1")), Seq("id"))
    assert(ParquetTable.read(spark, path).count() === 2L)
  }

  test("partitioned merges and row-level UPDATE enforce constraints") {
    val path = tmpDir("con-part") + "/t"
    ParquetTable.createVersioned(df(Row(1, "a", "d1"), Row(2, "b", "d2")),
      path, Seq("day"))
    Constraints.add(spark, path, "v_nonempty", "length(v) > 0")
    intercept[IllegalArgumentException] {
      ParquetTable.mergeVersioned(spark, path, df(Row(3, "", "d2")),
        Seq("id"), Seq("day"))
    }
    assert(ParquetTable.currentVersion(spark, path) === Some(1L))
    intercept[IllegalArgumentException] {
      ParquetTable.update(spark, path,
        org.apache.spark.sql.functions.col("id") === 1,
        Map("v" -> org.apache.spark.sql.functions.lit("")))
    }
    assert(ParquetTable.read(spark, path)
      .filter("v = ''").count() === 0L)
  }

  test("plain-partitioned merges validate the incoming rows too") {
    val path = tmpDir("con-plain") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1")), path, Seq("day")) // plain layout
    Constraints.add(spark, path, "id_pos", "id > 0")
    val e = intercept[IllegalArgumentException] {
      ParquetTable.merge(spark, path, df(Row(-5, "bad", "d1")), Seq("id"), Seq("day"))
    }
    assert(e.getMessage.contains("id_pos"))
    assert(ParquetTable.read(spark, path).count() === 1L)
  }

  test("control characters in a CHECK expression are rejected at DDL time") {
    val path = tmpDir("con-ctrl") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1")), path)
    val e = intercept[IllegalArgumentException] {
      Constraints.add(spark, path, "c1", "id > 0\nAND v <> 'x'")
    }
    assert(e.getMessage.contains("must not contain"))
    assert(Constraints.list(spark, path).isEmpty)
    // table still writable — the file was never corrupted
    ParquetTable.merge(spark, path, df(Row(2, "b", "d1")), Seq("id"))
  }

  test("NULL check results pass (SQL CHECK semantics); drop lifts enforcement") {
    val path = tmpDir("con-null") + "/t"
    ParquetTable.create(df(Row(1, "a", "d1")), path)
    Constraints.add(spark, path, "v_short", "length(v) < 10")
    // v NULL → length NULL → check NULL → passes
    ParquetTable.merge(spark, path, df(Row(2, null, "d1")), Seq("id"))
    assert(ParquetTable.read(spark, path).count() === 2L)
    Constraints.drop(spark, path, "v_short")
    ParquetTable.merge(spark, path,
      df(Row(3, "longer than ten chars", "d1")), Seq("id"))
    assert(ParquetTable.read(spark, path).count() === 3L)
    intercept[IllegalArgumentException] {
      Constraints.drop(spark, path, "v_short")
    }
  }

  test("shallow clones inherit constraints; SQL DDL round-trips") {
    val root = tmpDir("con-sql")
    val src = s"$root/src"
    ParquetTable.create(df(Row(1, "a", "d1")), src)
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$src` ADD CONSTRAINT id_pos CHECK (id > 0)")
    assert(Constraints.list(spark, src) === Seq("id_pos" -> "id > 0"))
    ParquetTable.shallowClone(spark, src, s"$root/dst", None)
    intercept[IllegalArgumentException] {
      ParquetTable.merge(spark, s"$root/dst", df(Row(-1, "x", "d1")), Seq("id"))
    }
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$root/dst` DROP CONSTRAINT id_pos")
    ParquetTable.merge(spark, s"$root/dst", df(Row(-1, "x", "d1")), Seq("id"))
    assert(ParquetTable.read(spark, s"$root/dst").count() === 2L)
    // the source keeps its own constraint
    assert(Constraints.list(spark, src).map(_._1) === Seq("id_pos"))
  }
}
