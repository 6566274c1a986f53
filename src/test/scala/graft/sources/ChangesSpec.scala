package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChangesSpec extends SparkSpec {
  import spark.implicits._

  test("changes between unpartitioned versions: insert/update/delete") {
    val path = tmpDir("chg") + "/t"
    ParquetTable.create(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal"), path)
    // v2: delete 3, update 2, insert 4, leave 1 untouched
    ParquetTable.create(Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "bal"), path)

    val got = ParquetTable.changes(spark, path, 1L, 2L, Seq("id"))
      .select(col("id"), col("name"), col("bal"), col("_change_type"))
      .as[(Long, String, Double, String)].collect().toSet
    assert(got === Set(
      (2L, "b", 99.0, "update"), // new image
      (3L, "c", 30.0, "delete"), // old image
      (4L, "d", 40.0, "insert")))
  }

  test("merge-produced versions diff the same way (partitioned versioned)") {
    val path = tmpDir("chgp") + "/t"
    val v1 = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0)).toDF("id", "day", "v")
    ParquetTable.createVersioned(v1, path, Seq("day"))
    ParquetTable.mergeVersioned(spark,
      path, Seq((2L, "2024-01-01", 20.0), (4L, "2024-01-02", 4.0))
        .toDF("id", "day", "v"), Seq("id"), Seq("day"))

    val got = ParquetTable.changes(spark, path, 1L, 2L, Seq("id"))
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, Double, String)].collect().toSet
    // merge never deletes: 2 updated, 4 inserted, 1/3 untouched
    assert(got === Set((2L, 20.0, "update"), (4L, 4.0, "insert")))
  }

  test("identical versions produce an empty feed") {
    val path = tmpDir("chg0") + "/t"
    val df = Seq((1L, "a")).toDF("id", "name")
    ParquetTable.create(df, path)
    ParquetTable.create(df, path)
    assert(ParquetTable.changes(spark, path, 1L, 2L, Seq("id")).isEmpty)
  }

  test("duplicate PKs in a snapshot fail fast, naming the key") {
    val path = tmpDir("chgd") + "/t"
    ParquetTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), path)
    // v2 duplicates id=2 — a fan-out trap for the full-outer join
    ParquetTable.create(Seq((1L, "a"), (2L, "b"), (2L, "B"))
      .toDF("id", "name"), path)
    val e = intercept[IllegalArgumentException] {
      ParquetTable.changes(spark, path, 1L, 2L, Seq("id")).collect()
    }
    assert(e.getMessage.contains("id=2"))
    assert(e.getMessage.contains("v2"))
  }

  test("net-diff across a multi-commit range: changed-then-reverted vanishes") {
    val path = tmpDir("chgr") + "/t"
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal")
    ParquetTable.create(base, path) // v1
    ParquetTable.create(Seq((1L, 99.0), (2L, 20.0)).toDF("id", "bal"), path) // v2
    ParquetTable.create(base, path) // v3 reverts v2
    // documented deviation from per-commit CDF: the 1→99→10 round trip
    // is invisible to the v1..v3 net diff
    assert(ParquetTable.changes(spark, path, 1L, 3L, Seq("id")).isEmpty)
    // per-commit calls still see each leg
    val leg = ParquetTable.changes(spark, path, 1L, 2L, Seq("id"))
      .select(col("id"), col("_change_type")).as[(Long, String)].collect().toSet
    assert(leg === Set((1L, "update")))
  }

  test("null-valued columns compare null-safely (no phantom updates)") {
    val path = tmpDir("chgn") + "/t"
    val df = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "name")
    ParquetTable.create(df, path)
    ParquetTable.create(df, path)
    assert(ParquetTable.changes(spark, path, 1L, 2L, Seq("id")).isEmpty)
  }
}
