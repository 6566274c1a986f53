package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The merge-on-read MERGE tier ([[ParquetTable.mergeVectors]]): an
  * O(update rows) commit — matched rows retired by deletion vector, the
  * update set appended as one data dir, manifest body grown by one line.
  * These specs pin the commit shape (what makes it O(changed rows)), read
  * equivalence with the copy-on-write tier, CDF parity, the auto tier
  * switch, and the maintenance interactions (optimize materializes,
  * vacuum keeps every listed dir, clones read through).
  */
class MergeOnReadSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false)))

  private def df(rows: Row*) = frame(schema, rows)

  private def rowsOf(path: String): Map[Int, String] =
    ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

  private def dataDirCount(path: String): Int = {
    val d = ParquetTable.detail(spark, path).head()
    d.getInt(d.fieldIndex("n_data_dirs"))
  }

  test("commit shape: appended dir + DV, not a rewrite") {
    val path = tmpDir("mor-shape") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b"), Row(3, "c")), path) // v1
    val v1Files = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("_d")).map(_.getName).toSet
    val v = ParquetTable.mergeVectors(spark, path,
      df(Row(2, "B"), Row(4, "d")), Seq("id"))
    assert(v === 2L)
    // v1's data dir is untouched (no rewrite); one new dir appeared
    val v2Files = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("_d")).map(_.getName).toSet
    assert(v1Files.subsetOf(v2Files) && v2Files.size === v1Files.size + 1)
    assert(dataDirCount(path) === 2)
    // the appended dir holds exactly the update set
    val appended = (v2Files -- v1Files).head
    assert(spark.read.parquet(s"$path/$appended").count() === 2L)
    // matched row (id=2) retired by DV: one live entry
    assert(ParquetTable.dvDirs(spark, path, 2L).size === 1)
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "B", 3 -> "c", 4 -> "d"))
  }

  test("read equivalence with the copy-on-write tier, including replay and dup-pk updates") {
    val morPath = tmpDir("mor-eq") + "/t"
    val cowPath = tmpDir("cow-eq") + "/t"
    val base = df(Row(1, "a"), Row(2, "b"), Row(3, "c"))
    // duplicate-pk updates: both tiers must keep ONE row per pk
    val upd = df(Row(2, "B"), Row(2, "B"), Row(5, "e"))
    ParquetTable.create(base, morPath)
    ParquetTable.create(base, cowPath)
    ParquetTable.merge(spark, morPath, upd, Seq("id"), mergeOnRead = Some(true))
    ParquetTable.merge(spark, cowPath, upd, Seq("id"), mergeOnRead = Some(false))
    assert(rowsOf(morPath) === rowsOf(cowPath))
    assert(ParquetTable.read(spark, morPath).count() ===
      ParquetTable.read(spark, cowPath).count()) // no dup survived the DV
    // replay: same updates again — new version, same image
    ParquetTable.merge(spark, morPath, upd, Seq("id"), mergeOnRead = Some(true))
    assert(ParquetTable.versions(spark, morPath) === Seq(1L, 2L, 3L))
    assert(rowsOf(morPath) === rowsOf(cowPath))
    // time travel still serves each version's own image
    assert(ParquetTable.readAt(spark, morPath, 1L).count() === 3L)
    assert(ParquetTable.readAt(spark, morPath, 2L).count() === 4L)
  }

  test("CDF capture matches the copy-on-write tier's change rows") {
    val morPath = tmpDir("mor-cdf") + "/t"
    val cowPath = tmpDir("cow-cdf") + "/t"
    val base = df(Row(1, "a"), Row(2, "b"), Row(3, "c"))
    val upd = df(Row(2, "B"), Row(3, "c"), Row(4, "d")) // update, no-op image, insert
    ParquetTable.create(base, morPath)
    ParquetTable.create(base, cowPath)
    ParquetTable.merge(spark, morPath, upd, Seq("id"), cdf = true, mergeOnRead = Some(true))
    ParquetTable.merge(spark, cowPath, upd, Seq("id"), cdf = true, mergeOnRead = Some(false))
    def feed(p: String) = ParquetTable.tableChanges(spark, p, 2L, 2L, Seq("id"))
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(_.toString).sorted.toSeq
    assert(feed(morPath) === feed(cowPath))
  }

  test("auto tier: small tables rewrite, forced MOR appends") {
    val path = tmpDir("mor-auto") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path)
    // default (None): far below MorAutoRowsFloor → copy-on-write rewrite,
    // manifest stays single-dir
    ParquetTable.merge(spark, path, df(Row(2, "B")), Seq("id"))
    assert(dataDirCount(path) === 1)
    // forcing the tier overrides the auto decision
    ParquetTable.merge(spark, path, df(Row(3, "c")), Seq("id"), mergeOnRead = Some(true))
    assert(dataDirCount(path) === 2)
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("optimize materializes: single dir, DV header gone, image unchanged") {
    val path = tmpDir("mor-opt") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b"), Row(3, "c")), path)
    ParquetTable.merge(spark, path, df(Row(2, "B"), Row(4, "d")), Seq("id"),
      mergeOnRead = Some(true))
    val before = rowsOf(path)
    ParquetTable.optimize(spark, path, Seq("id"), numFiles = 2)
    val v = ParquetTable.currentVersion(spark, path).get
    assert(dataDirCount(path) === 1)
    assert(ParquetTable.dvDirs(spark, path, v).isEmpty)
    assert(rowsOf(path) === before)
  }

  test("vacuum keeps every dir a kept MOR version lists; time travel survives") {
    val path = tmpDir("mor-vac") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path) // v1
    ParquetTable.merge(spark, path, df(Row(2, "B")), Seq("id"),
      mergeOnRead = Some(true)) // v2: base dir + appended dir + DV
    ParquetTable.merge(spark, path, df(Row(3, "c")), Seq("id"),
      mergeOnRead = Some(true)) // v3
    ParquetTable.vacuum(spark, path, keepLast = 2) // keeps v2, v3
    // v2 still reads exactly (v2 lists the v1 base dir — it must survive)
    assert(ParquetTable.readAt(spark, path, 2L).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap === Map(1 -> "a", 2 -> "B"))
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("deep chain: 30 MOR merges accumulate correctly, travel and compact") {
    val path = tmpDir("mor-deep") + "/t"
    ParquetTable.create(df(Row(0, "v0")), path)
    // each merge updates the previous key and inserts a new one
    for (i <- 1 to 30)
      ParquetTable.merge(spark, path,
        df(Row(i - 1, s"u$i"), Row(i, s"v$i")), Seq("id"),
        mergeOnRead = Some(true))
    assert(dataDirCount(path) === 31)
    val expect = (0 until 30).map(k => k -> s"u${k + 1}").toMap + (30 -> "v30")
    assert(rowsOf(path) === expect)
    // time travel into the middle of the chain
    assert(ParquetTable.readAt(spark, path, 16L).count() === 16L)
    // compaction folds 31 dirs + 30 DVs into one full image
    ParquetTable.compact(spark, path)
    assert(dataDirCount(path) === 1)
    assert(rowsOf(path) === expect)
    // vacuum then reclaims the whole chain's dirs
    ParquetTable.vacuum(spark, path, keepLast = 1)
    assert(rowsOf(path) === expect)
    assert(new java.io.File(path).listFiles
      .count(f => f.isDirectory && f.getName.startsWith("_d")) === 1)
  }

  test("bare SQL OPTIMIZE compacts a MOR chain") {
    val path = tmpDir("mor-sql-opt") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path)
    ParquetTable.merge(spark, path, df(Row(2, "B"), Row(3, "c")), Seq("id"),
      mergeOnRead = Some(true))
    assert(dataDirCount(path) === 2)
    val v = graft.sql.GraftSql.sql(spark, s"OPTIMIZE graft.`$path`").head().getLong(0)
    assert(v === 3L && dataDirCount(path) === 1)
    assert(ParquetTable.dvDirs(spark, path, v).isEmpty)
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("insertInto on a shallow clone: append lands clone-local, source untouched") {
    val src = tmpDir("mor-ins-clone-src") + "/t"
    val dst = tmpDir("mor-ins-clone-dst") + "/t"
    ParquetTable.create(df(Row(1, "a")), src)
    ParquetTable.shallowClone(spark, src, dst)
    ParquetTable.insertInto(spark, dst, df(Row(2, "b")))
    assert(rowsOf(dst) === Map(1 -> "a", 2 -> "b"))
    assert(rowsOf(src) === Map(1 -> "a"))
    // the appended dir lives under the CLONE (vacuum ownership holds)
    assert(new java.io.File(dst).listFiles
      .exists(f => f.isDirectory && f.getName.startsWith("_d")))
  }

  test("shallow clone of a MOR snapshot reads through dirs and DVs") {
    val src = tmpDir("mor-clone-src") + "/t"
    val dst = tmpDir("mor-clone-dst") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), src)
    ParquetTable.merge(spark, src, df(Row(2, "B"), Row(3, "c")), Seq("id"),
      mergeOnRead = Some(true))
    ParquetTable.shallowClone(spark, src, dst)
    assert(rowsOf(dst) === Map(1 -> "a", 2 -> "B", 3 -> "c"))
    // writes to the clone leave the source untouched
    ParquetTable.merge(spark, dst, df(Row(1, "A")), Seq("id"),
      mergeOnRead = Some(true))
    assert(rowsOf(dst) === Map(1 -> "A", 2 -> "B", 3 -> "c"))
    assert(rowsOf(src) === Map(1 -> "a", 2 -> "B", 3 -> "c"))
  }

  test("compact folds a MOR chain: one dir, DVs materialized, image intact") {
    val path = tmpDir("mor-compact") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path)
    ParquetTable.merge(spark, path, df(Row(2, "B")), Seq("id"), mergeOnRead = Some(true))
    ParquetTable.merge(spark, path, df(Row(3, "c")), Seq("id"), mergeOnRead = Some(true))
    assert(dataDirCount(path) === 3)
    val before = rowsOf(path)
    ParquetTable.compact(spark, path)
    val v = ParquetTable.currentVersion(spark, path).get
    assert(dataDirCount(path) === 1)
    assert(ParquetTable.dvDirs(spark, path, v).isEmpty)
    assert(rowsOf(path) === before)
  }

  test("auto tier bounds the chain: rows floor and max-dirs cap") {
    val path = tmpDir("mor-bounds") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path)
    ParquetTable.merge(spark, path, df(Row(2, "B")), Seq("id"), mergeOnRead = Some(true))
    ParquetTable.merge(spark, path, df(Row(3, "c")), Seq("id"), mergeOnRead = Some(true))
    val v = ParquetTable.currentVersion(spark, path).get // 3 dirs listed
    // above the rows floor and under the dir cap → MOR
    assert(ParquetTable.autoMergeOnRead(spark, path, v, rowsFloor = 0L, maxDirs = 64))
    // chain at the cap → next auto merge must take the rewrite (which
    // materializes the chain) — Delta's auto-compaction discipline
    assert(!ParquetTable.autoMergeOnRead(spark, path, v, rowsFloor = 0L, maxDirs = 3))
    // small tables stay on the rewrite tier regardless of chain length
    assert(!ParquetTable.autoMergeOnRead(spark, path, v, maxDirs = 64))
  }

  test("readWhere over a MOR chain: prunes per dir, applies DVs, exact vs filter") {
    val path = tmpDir("mor-rw") + "/t"
    ParquetTable.create(df((1 to 20).map(i => Row(i, s"v$i")): _*), path)
    ParquetTable.merge(spark, path, df(Row(5, "FIVE"), Row(25, "w")), Seq("id"),
      mergeOnRead = Some(true))
    val pred = col("id") <= 6
    val expect = ParquetTable.read(spark, path).filter(pred)
      .collect().map(_.toSeq).toSet
    assert(ParquetTable.readWhere(spark, path, pred)
      .collect().map(_.toSeq).toSet === expect)
    assert(expect.exists(_.contains("FIVE")) && !expect.exists(_.contains("v5")),
      "DV must retire the replaced row on the stats-pruned path too")
  }

  test("row-level verbs on a MOR chain: delete, update, deleteVectors") {
    val path = tmpDir("mor-verbs") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path)
    ParquetTable.merge(spark, path, df(Row(2, "B"), Row(3, "c")), Seq("id"),
      mergeOnRead = Some(true))
    ParquetTable.merge(spark, path, df(Row(4, "d")), Seq("id"),
      mergeOnRead = Some(true)) // chain: 3 dirs + 1 DV
    // DV delete must retire a row living in an APPENDED dir
    ParquetTable.deleteVectors(spark, path, col("id") === 3)
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "B", 4 -> "d"))
    // copy-on-write update reads the whole chain and materializes
    ParquetTable.update(spark, path, col("id") === 2, Map("v" -> lit("Z")))
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "Z", 4 -> "d"))
    assert(dataDirCount(path) === 1) // rewrite folded the chain
    // delete after the fold still works
    ParquetTable.delete(spark, path, col("id") === 1)
    assert(rowsOf(path) === Map(2 -> "Z", 4 -> "d"))
  }

  test("concurrent mergeVectors on disjoint keys: both land, no lost update") {
    import java.util.concurrent.{Callable, CyclicBarrier, Executors, TimeUnit}
    val path = tmpDir("mor-race") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val barrier = new CyclicBarrier(2)
      val futures = Seq((1, "A"), (2, "B")).map { case (id, v) =>
        pool.submit(new Callable[Long] {
          override def call(): Long = {
            barrier.await(10, TimeUnit.SECONDS)
            ParquetTable.mergeVectors(spark, path,
              df(Row(id, v)), Seq("id"))
          }
        })
      }.map(_.get(120, TimeUnit.SECONDS))
      // CAS exclusivity: the loser retried onto the next version, so both
      // commits land on DISTINCT versions and neither update is lost
      assert(futures.toSet === Set(2L, 3L))
      assert(ParquetTable.versions(spark, path) === Seq(1L, 2L, 3L))
      assert(rowsOf(path) === Map(1 -> "A", 2 -> "B"))
    } finally pool.shutdown()
  }

  private val pschema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false),
    StructField("day", StringType, nullable = false)))

  private def pdf(rows: Row*) = frame(pschema, rows)

  private def prowsOf(path: String): Map[Int, (String, String)] =
    ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(r.fieldIndex("id")) ->
        (r.getString(r.fieldIndex("v")), r.getString(r.fieldIndex("day")))).toMap

  test("partitioned MOR merge: DV + append-entry commit, old dirs untouched") {
    val path = tmpDir("pmor-shape") + "/t"
    ParquetTable.createVersioned(pdf(
      Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2")), path, Seq("day"))
    val e1 = ParquetTable.partitionEntries(spark, path, 1L).get
    ParquetTable.mergeVersioned(spark, path,
      pdf(Row(2, "B", "d1"), Row(4, "d", "d3")), Seq("id"), Seq("day"),
      mergeOnRead = Some(true))
    val e2 = ParquetTable.partitionEntries(spark, path, 2L).get
    // every v1 entry survives verbatim; d1 + new d3 gain one new dir
    assert(e1.forall(e2.contains))
    assert(e2.filterNot(e1.contains).map(_._1).sorted === Seq("day=d1", "day=d3"))
    // the matched row retired by DV
    assert(ParquetTable.dvDirs(spark, path, 2L).size === 1)
    assert(prowsOf(path) === Map(
      1 -> ("a", "d1"), 2 -> ("B", "d1"), 3 -> ("c", "d2"), 4 -> ("d", "d3")))
    // time travel: v1 intact
    assert(ParquetTable.readAt(spark, path, 1L).count() === 3L)
  }

  test("partitioned MOR equals rewrite tier: image and CDF feed") {
    val morPath = tmpDir("pmor-eq") + "/t"
    val cowPath = tmpDir("pcow-eq") + "/t"
    val base = pdf(Row(1, "a", "d1"), Row(2, "b", "d1"), Row(3, "c", "d2"))
    val upd = pdf(Row(2, "B", "d1"), Row(5, "e", "d2"))
    ParquetTable.createVersioned(base, morPath, Seq("day"))
    ParquetTable.createVersioned(base, cowPath, Seq("day"))
    ParquetTable.mergeVersioned(spark, morPath, upd, Seq("id"), Seq("day"),
      cdf = true, mergeOnRead = Some(true))
    ParquetTable.mergeVersioned(spark, cowPath, upd, Seq("id"), Seq("day"),
      cdf = true, mergeOnRead = Some(false))
    assert(prowsOf(morPath) === prowsOf(cowPath))
    def feed(p: String) = ParquetTable.tableChanges(spark, p, 2L, 2L, Seq("id"))
      .select("id", "v", "day", "_change_type", "_commit_version").collect()
      .map(_.toString).sorted.toSeq
    assert(feed(morPath) === feed(cowPath))
  }

  test("partitioned MOR chain: replay, rewrite consolidation, DV survives untouched partitions") {
    val path = tmpDir("pmor-chain") + "/t"
    ParquetTable.createVersioned(pdf(
      Row(1, "a", "d1"), Row(2, "b", "d2")), path, Seq("day"))
    ParquetTable.mergeVersioned(spark, path, pdf(Row(1, "A1", "d1")),
      Seq("id"), Seq("day"), mergeOnRead = Some(true)) // v2: DV id=1
    ParquetTable.mergeVersioned(spark, path, pdf(Row(1, "A2", "d1")),
      Seq("id"), Seq("day"), mergeOnRead = Some(true)) // v3: DV the v2 row too
    assert(prowsOf(path) === Map(1 -> ("A2", "d1"), 2 -> ("b", "d2")))
    // a rewrite-tier merge of d2 must keep d1's DVs in force
    ParquetTable.mergeVersioned(spark, path, pdf(Row(2, "B", "d2")),
      Seq("id"), Seq("day"), mergeOnRead = Some(false))
    assert(prowsOf(path) === Map(1 -> ("A2", "d1"), 2 -> ("B", "d2")))
    // consolidating d1 via rewrite folds its entries back to one dir
    ParquetTable.mergeVersioned(spark, path, pdf(Row(1, "A3", "d1")),
      Seq("id"), Seq("day"), mergeOnRead = Some(false))
    assert(ParquetTable.partitionEntries(spark, path,
      ParquetTable.currentVersion(spark, path).get).get
      .count(_._1 == "day=d1") === 1)
    assert(prowsOf(path) === Map(1 -> ("A3", "d1"), 2 -> ("B", "d2")))
  }

  test("txn markers make MOR merges idempotent under re-delivery") {
    val path = tmpDir("mor-txn") + "/t"
    ParquetTable.create(df(Row(1, "a")), path)
    ParquetTable.merge(spark, path, df(Row(2, "b")), Seq("id"),
      txn = Some(("app1", 7L)), mergeOnRead = Some(true))
    val vAfter = ParquetTable.currentVersion(spark, path).get
    // re-delivery of the same batch commits nothing
    ParquetTable.merge(spark, path, df(Row(2, "DUP")), Seq("id"),
      txn = Some(("app1", 7L)), mergeOnRead = Some(true))
    assert(ParquetTable.currentVersion(spark, path).get === vAfter)
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "b"))
  }
}
