package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ParquetTable

/** CTAS onto the versioned layout + DESCRIBE TABLE provenance rows. */
class CtasDescribeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_ctas").toString + "/t"

  test("CTAS materializes a SELECT as version 1; graft sources resolve") {
    val src = tmp(); val dst = tmp()
    ParquetTable.create(
      Seq((1L, "a", 10.0), (2L, "b", 5.0), (3L, "c", 7.5))
        .toDF("id", "name", "price"), src)
    val v = GraftSql.sql(spark,
        s"CREATE TABLE graft.`$dst` AS SELECT id, price FROM graft.`$src` WHERE price > 6")
      .collect()(0).getLong(0)
    assert(v == 1L)
    val got = ParquetTable.read(spark, dst).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 10.0), (3L, 7.5)))
    // no CREATE OR REPLACE: a second CTAS at the same path refuses
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CREATE TABLE graft.`$dst` AS SELECT id FROM graft.`$src`")
    }
  }

  test("CTAS PARTITIONED BY writes a partitioned versioned table") {
    val src = tmp(); val dst = tmp()
    ParquetTable.create(
      Seq((1L, "x", "a"), (2L, "y", "b"), (3L, "z", "a"))
        .toDF("id", "v", "part"), src)
    GraftSql.sql(spark,
      s"CREATE TABLE graft.`$dst` PARTITIONED BY (part) AS " +
        s"SELECT * FROM graft.`$src`")
    assert(ParquetTable.read(spark, dst).count() == 3)
    // the manifest is partitioned: per-partition entries exist
    val entries = ParquetTable.partitionEntries(spark, dst, 1L)
    assert(entries.exists(_.exists(_._1.startsWith("part="))))
    // partition pruning serves readWhere
    assert(ParquetTable.readWhere(spark, dst, col("part") === "a").count() == 2)
  }

  test("DESCRIBE TABLE shows provenance: partition/generated/default/rename") {
    val t = tmp()
    graft.sources.GeneratedColumns.add(spark, t, "y", "id * 2")
    ParquetTable.createVersioned(
      Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "name", "part"),
      t, Seq("part"))
    ParquetTable.addColumn(spark, t, "tier", "string", Some("'std'"))
    ParquetTable.renameColumn(spark, t, "name", "label")
    val rows = GraftSql.sql(spark, s"DESCRIBE TABLE graft.`$t`")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("part")._2 == "partition")
    assert(rows("y")._2 == "generated(id * 2)")
    assert(rows("tier")._2.startsWith("added@v") &&
      rows("tier")._2.contains("default 'std'"))
    assert(rows("label")._2 == "renamed from name")
    assert(rows("id")._2 == "")
    assert(rows("id")._1 == "bigint" && rows("label")._1 == "string")
    // DESC HISTORY / DESC DETAIL still parse as themselves
    assert(GraftSql.sql(spark, s"DESC HISTORY graft.`$t`").columns
      .contains("version"))
  }
}
