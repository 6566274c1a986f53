package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ADD COLUMN / DEFAULT DDL: metadata-only commit, typed-NULL history,
  * future-write fill, time travel across the window, SQL surface, and the
  * refusal matrix.
  */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_defaults").toString + "/t"

  private def base = Seq((1L, "a"), (2L, "b")).toDF("id", "name")

  test("addColumn: existing rows read NULL, later writes fill the default") {
    val t = tmp()
    ParquetTable.create(base, t)
    val v = ParquetTable.addColumn(spark, t, "tier", "string", Some("'std'"))
    assert(v == 2L)
    // existing rows: typed NULL (never the default — no invented history)
    val now = ParquetTable.read(spark, t).orderBy("id").collect()
    assert(now.map(_.getString(2)).toSeq == Seq(null, null))
    // a write omitting the column gets the default materialized
    ParquetTable.insertInto(spark, t, Seq((3L, "c")).toDF("id", "name"))
    // a write carrying the column keeps its explicit values
    ParquetTable.insertInto(spark, t,
      Seq((4L, "d", "gold")).toDF("id", "name", "tier"))
    val all = ParquetTable.read(spark, t).orderBy("id").collect()
    assert(all.map(_.getString(2)).toSeq == Seq(null, null, "std", "gold"))
  }

  test("time travel: versions below addedAt never show the column") {
    val t = tmp()
    ParquetTable.create(base, t)
    ParquetTable.addColumn(spark, t, "score", "double", Some("1.5"))
    assert(!ParquetTable.readAt(spark, t, 1L).columns.contains("score"))
    assert(ParquetTable.readAt(spark, t, 2L).columns.contains("score"))
    ParquetTable.insertInto(spark, t, Seq((3L, "c")).toDF("id", "name"))
    val v3 = ParquetTable.readAt(spark, t, 3L).orderBy("id").collect()
    assert(v3.map(r => Option(r.get(2))).toSeq ==
      Seq(None, None, Some(1.5)))
  }

  test("setDefault changes future fills only; DROP DEFAULT reverts to NULL") {
    val t = tmp()
    ParquetTable.create(base, t)
    ParquetTable.addColumn(spark, t, "src", "string", Some("'v1'"))
    ParquetTable.insertInto(spark, t, Seq((3L, "c")).toDF("id", "name"))
    ColumnDefaults.setDefault(spark, t, "src", Some("'v2'"))
    ParquetTable.insertInto(spark, t, Seq((4L, "d")).toDF("id", "name"))
    ColumnDefaults.setDefault(spark, t, "src", None)
    ParquetTable.insertInto(spark, t, Seq((5L, "e")).toDF("id", "name"))
    val got = ParquetTable.read(spark, t).orderBy("id")
      .select("src").as[String].collect().toSeq
    assert(got == Seq(null, null, "v1", "v2", null))
  }

  test("merge/update through an added column; MOR dirs stay readable") {
    val t = tmp()
    ParquetTable.create(base, t)
    ParquetTable.addColumn(spark, t, "tier", "string", Some("'std'"))
    ParquetTable.merge(spark, t,
      Seq((2L, "b2"), (9L, "i")).toDF("id", "name"), Seq("id"))
    val got = ParquetTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // untouched row 1 keeps its pre-add NULL (merge invents no history);
    // merged/inserted rows got the default filled
    assert(got == Seq((1L, "a", null), (2L, "b2", "std"), (9L, "i", "std")))
  }

  test("partitioned merge into a NEW partition under an unmaterialized column") {
    val t = tmp()
    ParquetTable.createVersioned(
      Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "name", "day"),
      t, Seq("day"))
    ParquetTable.addColumn(spark, t, "tier", "string", Some("'std'"))
    // all-affected-partitions-new: the merge combines against an empty
    // frame of the TABLE schema — which must include the added column
    ParquetTable.mergeVersioned(spark, t,
      Seq((3L, "c", "p3")).toDF("id", "name", "day"), Seq("id"), Seq("day"))
    val got = ParquetTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tier")))).toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, Some("std"))))
    // and a mixed merge (existing + new partition) stays consistent
    ParquetTable.mergeVersioned(spark, t,
      Seq((2L, "B", "p2"), (4L, "d", "p4")).toDF("id", "name", "day"),
      Seq("id"), Seq("day"))
    val got2 = ParquetTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tier")))).toSeq
    assert(got2 == Seq((1L, None), (2L, Some("std")), (3L, Some("std")),
      (4L, Some("std"))))
  }

  test("CDF window across the ADD COLUMN commit and its materialization") {
    val t = tmp()
    ParquetTable.create(base, t, Nil)
    // enable CDF-style comparison via changes() if available; otherwise
    // assert version reads around the DDL are stable
    val vAdd = ParquetTable.addColumn(spark, t, "tier", "string", Some("'std'"))
    ParquetTable.insertInto(spark, t, Seq((3L, "c")).toDF("id", "name"))
    // reads straddling the DDL agree on history
    assert(ParquetTable.readAt(spark, t, vAdd - 1).columns.toSeq ==
      Seq("id", "name"))
    assert(ParquetTable.readAt(spark, t, vAdd).columns.toSeq ==
      Seq("id", "name", "tier"))
    assert(ParquetTable.readAt(spark, t, vAdd + 1)
      .filter(col("id") === 3).select("tier").collect()(0).getString(0) == "std")
  }

  test("dropColumn closes the window: unmaterialized and materialized") {
    // never materialized: pure metadata round trip
    val t1 = tmp()
    ParquetTable.create(base, t1)
    val va = ParquetTable.addColumn(spark, t1, "ghost", "int", None)
    val vd = ParquetTable.dropColumn(spark, t1, "ghost")
    assert(vd == va + 1)
    assert(!ParquetTable.read(spark, t1).columns.contains("ghost"))
    assert(ParquetTable.readAt(spark, t1, va).columns.contains("ghost"))
    assert(!ParquetTable.readAt(spark, t1, 1L).columns.contains("ghost"))
    // re-adding the name works (the old rule's window is closed)
    ParquetTable.addColumn(spark, t1, "ghost", "string", Some("'new'"))
    assert(ParquetTable.read(spark, t1).schema("ghost").dataType ==
      org.apache.spark.sql.types.StringType)

    // materialized: colmap drop + window close; ingest stops filling
    val t2 = tmp()
    ParquetTable.create(base, t2)
    ParquetTable.addColumn(spark, t2, "tier", "string", Some("'std'"))
    ParquetTable.insertInto(spark, t2, Seq((3L, "c")).toDF("id", "name"))
    val preDrop = ParquetTable.currentVersion(spark, t2).get
    ParquetTable.dropColumn(spark, t2, "tier")
    assert(!ParquetTable.read(spark, t2).columns.contains("tier"))
    assert(ParquetTable.readAt(spark, t2, preDrop).columns.contains("tier"))
    ParquetTable.insertInto(spark, t2, Seq((4L, "d")).toDF("id", "name"))
    assert(!ParquetTable.read(spark, t2).columns.contains("tier"))
  }

  test("SQL surface: ADD COLUMN DEFAULT, SET/DROP DEFAULT, typed types") {
    val t = tmp()
    ParquetTable.create(base, t)
    val v = graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$t` ADD COLUMN amount decimal(10,2) DEFAULT 9.99")
      .collect()(0).getLong(0)
    assert(v == 2L)
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$t` ALTER COLUMN amount SET DEFAULT 1.00")
    ParquetTable.insertInto(spark, t, Seq((3L, "c")).toDF("id", "name"))
    val got = ParquetTable.read(spark, t).orderBy("id")
      .select("amount").collect().map(r => Option(r.getDecimal(0)))
    assert(got(0).isEmpty && got(1).isEmpty)
    assert(got(2).get == new java.math.BigDecimal("1.00"))
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$t` ALTER COLUMN amount DROP DEFAULT")
    ParquetTable.insertInto(spark, t, Seq((4L, "d")).toDF("id", "name"))
    val last = ParquetTable.read(spark, t).filter(col("id") === 4)
      .select("amount").collect()(0)
    assert(last.isNullAt(0))
    // a duplicate ADD COLUMN through SQL refuses like the API does
    intercept[Exception] {
      graft.sql.GraftSql.sql(spark,
        s"ALTER TABLE graft.`$t` ADD COLUMN amount string")
    }
  }

  test("refusals: dup name, vacated physical name, rename of a rule column") {
    val t = tmp()
    ParquetTable.create(base, t)
    ParquetTable.addColumn(spark, t, "tier", "string", None)
    intercept[IllegalArgumentException] {
      ParquetTable.addColumn(spark, t, "name", "string", None)
    }
    intercept[IllegalArgumentException] {
      ParquetTable.addColumn(spark, t, "tier", "int", None)
    }
    intercept[IllegalArgumentException] {
      ParquetTable.renameColumn(spark, t, "tier", "tier2")
    }
    // rename name -> label vacates physical "name"; re-adding it is the
    // stats/bloom aliasing hazard and must refuse
    ParquetTable.renameColumn(spark, t, "name", "label")
    intercept[IllegalArgumentException] {
      ParquetTable.addColumn(spark, t, "name", "string", None)
    }
    // bad default expressions never burn a version
    val vBefore = ParquetTable.currentVersion(spark, t).get
    intercept[Exception] {
      ParquetTable.addColumn(spark, t, "bad", "int", Some("not a ( valid"))
    }
    // DEFAULT must be constant: a column reference is refused up front
    intercept[IllegalArgumentException] {
      ParquetTable.addColumn(spark, t, "bad2", "bigint", Some("id + 1"))
    }
    assert(ParquetTable.currentVersion(spark, t).get == vBefore)
  }

  test("readWhere filters on an added column; stats pruning stays exact") {
    val t = tmp()
    ParquetTable.create(base, t)
    ParquetTable.addColumn(spark, t, "tier", "string", Some("'std'"))
    ParquetTable.insertInto(spark, t,
      Seq((3L, "c", "gold")).toDF("id", "name", "tier"))
    val gold = ParquetTable.readWhere(spark, t, col("tier") === "gold")
      .select("id").as[Long].collect().toSeq
    assert(gold == Seq(3L))
    // null-tier rows (pre-add history) match IS NULL
    val nulls = ParquetTable.readWhere(spark, t, col("tier").isNull)
      .select("id").as[Long].collect().sorted.toSeq
    assert(nulls == Seq(1L, 2L))
  }

  test("shallow clone carries live rules clamped to version 1") {
    val t = tmp(); val c = tmp()
    ParquetTable.create(base, t)
    ParquetTable.addColumn(spark, t, "tier", "string", Some("'std'"))
    ParquetTable.shallowClone(spark, t, c)
    assert(ParquetTable.read(spark, c).columns.contains("tier"))
    ParquetTable.insertInto(spark, c, Seq((3L, "c")).toDF("id", "name"))
    val got = ParquetTable.read(spark, c).orderBy("id")
      .select("tier").as[String].collect().toSeq
    assert(got == Seq(null, null, "std"))
  }
}
