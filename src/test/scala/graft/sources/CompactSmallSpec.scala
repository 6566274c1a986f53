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

  test("partitioned: hot partition's small slices fold; settled partitions and big slices stay") {
    val path = tmpDir("csmall-part") + "/t"
    // two partitions with BIG bulk slices (50k rows each, well above the
    // 20 kB threshold), one of which goes hot with three tiny inserts
    ParquetTable.createVersioned(
      (1 to 100000).map(i =>
        (i.toLong, s"v$i", if (i % 2 == 0) "hot" else "cold"))
        .toDF("id", "v", "day"),
      path, Seq("day"))
    val e1 = ParquetTable.partitionEntries(spark, path, 1L).get
    (1 to 3).foreach { b =>
      ParquetTable.insertInto(spark, path,
        Seq((200000L + b, "small", "hot")).toDF("id", "v", "day"))
    }
    val vBefore = ParquetTable.currentVersion(spark, path).get
    val entriesBefore = ParquetTable.partitionEntries(spark, path, vBefore).get
    assert(entriesBefore.count(_._1 == "day=hot") === 4) // bulk + 3 inserts
    val before = ParquetTable.read(spark, path).orderBy("id").collect().toSeq

    val vNew = ParquetTable.compactSmall(spark, path, minBytes = 20000L)
    assert(vNew === vBefore + 1)
    val entries = ParquetTable.partitionEntries(spark, path, vNew).get
    // cold: untouched entry, the very dir from v1
    assert(entries.filter(_._1 == "day=cold") === e1.filter(_._1 == "day=cold"))
    // hot: bulk slice stays on the CREATE dir, 3 small slices folded to 1
    val hot = entries.filter(_._1 == "day=hot").map(_._2)
    assert(hot.size === 2)
    assert(hot.contains(e1.find(_._1 == "day=hot").get._2),
      "the hot partition's big bulk slice was rewritten")
    assert(ParquetTable.read(spark, path).orderBy("id").collect().toSeq === before)
    // nothing left to fold: no-op
    assert(ParquetTable.compactSmall(spark, path, minBytes = 20000L) === vNew)
    // history still time-travels to the pre-fold chain
    assert(ParquetTable.readAt(spark, path, vBefore).count() === before.size)
    assert(ParquetTable.fsck(spark, path).isEmpty)
  }

  test("partitioned: a partition with a single small slice does not fold") {
    val path = tmpDir("csmall-p1") + "/t"
    ParquetTable.createVersioned(
      Seq((1, "a", "d1"), (2, "b", "d2")).toDF("id", "v", "day"), path, Seq("day"))
    // every slice is tiny but no partition has TWO small slices
    assert(ParquetTable.compactSmall(spark, path, minBytes = 1000000L) === 1L)
  }

  test("refusals: DV-carrying versions") {
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
