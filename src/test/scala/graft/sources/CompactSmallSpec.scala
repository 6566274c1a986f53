package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental small-dir compaction: only sub-threshold dirs fold, the
  * settled bulk is never rewritten, history keeps time-traveling,
  * refusals for partitioned/DV-carrying tables, SQL verb.
  */
class CompactSmallSpec extends SparkSpec {
  import spark.implicits._

  /** Non-comment data-dir lines of the CURRENT manifest. */
  private def manifestDirs(path: String): Seq[String] = {
    val v = ParquetTable.currentVersion(spark, path).get
    val f = new java.io.File(f"$path/_graft_manifest/v$v%020d")
    scala.io.Source.fromFile(f).getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toList
  }

  test("folds only sub-threshold dirs; the settled bulk dir is untouched") {
    val path = tmpDir("csmall") + "/t"
    // bulk: 50k rows (well above the 20 kB test threshold)
    ParquetTable.create(
      (1 to 50000).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)
    val bulkDir = manifestDirs(path).head
    // three small appends → four-dir chain
    (1 to 3).foreach { b =>
      ParquetTable.insertInto(spark, path,
        Seq((100000L + b, "small")).toDF("id", "v"))
    }
    assert(manifestDirs(path).size === 4)
    val before = ParquetTable.read(spark, path)
      .orderBy("id").collect().toSeq
    val vBefore = ParquetTable.currentVersion(spark, path).get

    val vNew = ParquetTable.compactSmall(spark, path, minBytes = 20000L)
    assert(vNew === vBefore + 1)
    val after = manifestDirs(path)
    assert(after.size === 2)
    assert(after.head === bulkDir) // the bulk dir was not rewritten
    assert(ParquetTable.read(spark, path).orderBy("id").collect().toSeq === before)
    // history still time-travels to the pre-fold chain
    assert(ParquetTable.readAt(spark, path, vBefore).count() === before.size)
    // idempotent: one merged dir + bulk → nothing left to fold
    assert(ParquetTable.compactSmall(spark, path, minBytes = 20000L) === vNew)
  }

  test("refusals: partitioned tables and DV-carrying versions") {
    val part = tmpDir("csmall-part") + "/t"
    ParquetTable.createVersioned(
      Seq((1, "a", "d1"), (2, "b", "d2")).toDF("id", "v", "day"), part, Seq("day"))
    val e1 = intercept[IllegalArgumentException] {
      ParquetTable.compactSmall(spark, part)
    }
    assert(e1.getMessage.contains("compactWhere"))

    val dv = tmpDir("csmall-dv") + "/t"
    ParquetTable.create((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dv)
    ParquetTable.insertInto(spark, dv, Seq((200L, "x")).toDF("id", "v"))
    ParquetTable.deleteVectors(spark, dv, col("id") === 5L)
    val e2 = intercept[IllegalArgumentException] {
      ParquetTable.compactSmall(spark, dv)
    }
    assert(e2.getMessage.contains("deletion vectors"))
  }

  test("SQL: OPTIMIZE ... COMPACT SMALL BELOW n") {
    val path = tmpDir("csmall-sql") + "/t"
    ParquetTable.create(Seq((1L, "a")).toDF("id", "v"), path)
    ParquetTable.insertInto(spark, path, Seq((2L, "b")).toDF("id", "v"))
    ParquetTable.insertInto(spark, path, Seq((3L, "c")).toDF("id", "v"))
    val v = graft.sql.GraftSql.sql(spark,
      s"OPTIMIZE graft.`$path` COMPACT SMALL BELOW 1000000")
      .head.getLong(0)
    assert(v === ParquetTable.currentVersion(spark, path).get)
    assert(manifestDirs(path).size === 1) // everything was small → one dir
    assert(ParquetTable.read(spark, path).count() === 3)
  }
}
