package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Full ParquetTable BEHAVIOR battery parameterized over the
  * [[LogCommitter]] seam — the complement of LogCommitterContractSpec:
  * the contract spec proves each committer's race primitive in
  * isolation; this battery proves the whole versioned-table verb set
  * (merge / MOR chain / row-level + DV / CDF / clone / compact / vacuum
  * / restore / convert / insert) end-to-end THROUGH each committer,
  * including conditional-PUT semantics. An S3 deployment is therefore
  * "implement the trait, pass both suites" — behavior proven, not
  * argued (the reference leans on Delta's `S3SingleDriverLogStore` for
  * the same guarantee, reference: terraform/glue-job/main.tf:38).
  *
  * Three concrete suites instantiate it:
  *   - [[HardLinkCommitterBatterySpec]] — the local-FS default;
  *   - [[RenameCommitterBatterySpec]] — no-replace rename (HDFS
  *     semantics: destination-exists refused under one metadata lock);
  *   - [[ConditionalPutCommitterBatterySpec]] — object-store
  *     `If-None-Match: *` semantics: a JVM-global put-if-absent
  *     arbitrates the version (the conditional PUT), and only the
  *     winner materializes the manifest (atomically, as a store PUT
  *     would) so ParquetTable's read path serves it unchanged.
  */
abstract class CommitterBattery(mk: () => LogCommitter) extends SparkSpec {

  private def withCommitter[A](body: => A): A = {
    val prev = ParquetTable.logCommitter
    ParquetTable.logCommitter = mk()
    try body finally ParquetTable.logCommitter = prev
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false)))

  private val pschema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false),
    StructField("day", StringType, nullable = false)))

  private def df(rows: Row*) = frame(schema, rows)

  private def rowsOf(path: String): Map[Int, String] =
    ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

  test("merge upsert + idempotent txn replay") { withCommitter {
    val path = tmpDir("cb-merge") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path)
    ParquetTable.merge(spark, path, df(Row(2, "B"), Row(3, "c")), Seq("id"),
      txn = Some("app" -> 1L))
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "B", 3 -> "c"))
    val vBefore = ParquetTable.currentVersion(spark, path).get
    // re-delivery of the same txn commits NOTHING
    ParquetTable.merge(spark, path, df(Row(2, "X")), Seq("id"),
      txn = Some("app" -> 1L))
    assert(ParquetTable.currentVersion(spark, path).get === vBefore)
    assert(rowsOf(path)(2) === "B")
  } }

  test("partitioned merge re-points only affected partitions") { withCommitter {
    val path = tmpDir("cb-part") + "/t"
    ParquetTable.createVersioned(
      frame(pschema, Seq(Row(1, "a", "d1"), Row(2, "b", "d2"))), path, Seq("day"))
    val e1 = ParquetTable.partitionEntries(spark, path, 1L).get.toMap
    ParquetTable.mergeVersioned(spark, path,
      frame(pschema, Seq(Row(2, "B", "d2"))), Seq("id"), Seq("day"))
    val e2 = ParquetTable.partitionEntries(spark, path, 2L).get.toMap
    assert(e2("day=d1") === e1("day=d1"), "untouched partition re-pointed")
    assert(e2("day=d2") !== e1("day=d2"))
    assert(ParquetTable.read(spark, path).count() === 2)
  } }

  test("MOR chain: 3 appends, mid-chain travel, compact folds") { withCommitter {
    val path = tmpDir("cb-mor") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b"), Row(3, "c")), path)
    ParquetTable.mergeVectors(spark, path, df(Row(2, "B"), Row(4, "d")), Seq("id"))
    ParquetTable.mergeVectors(spark, path, df(Row(4, "D"), Row(5, "e")), Seq("id"))
    ParquetTable.mergeVectors(spark, path, df(Row(1, "A")), Seq("id"))
    assert(rowsOf(path) === Map(1 -> "A", 2 -> "B", 3 -> "c", 4 -> "D", 5 -> "e"))
    assert(ParquetTable.readAt(spark, path, 2L).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap ===
      Map(1 -> "a", 2 -> "B", 3 -> "c", 4 -> "d"))
    ParquetTable.compact(spark, path)
    assert(rowsOf(path) === Map(1 -> "A", 2 -> "B", 3 -> "c", 4 -> "D", 5 -> "e"))
    val d = ParquetTable.detail(spark, path).head()
    assert(d.getInt(d.fieldIndex("n_data_dirs")) === 1)
  } }

  test("row-level delete/update + deleteVectors") { withCommitter {
    val path = tmpDir("cb-row") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b"), Row(3, "c")), path)
    ParquetTable.delete(spark, path, col("id") === 1)
    ParquetTable.update(spark, path, col("id") === 2, Map("v" -> lit("B2")))
    ParquetTable.deleteVectors(spark, path, col("id") === 3)
    assert(rowsOf(path) === Map(2 -> "B2"))
  } }

  test("CDF capture + tableChanges read back") { withCommitter {
    val path = tmpDir("cb-cdf") + "/t"
    ParquetTable.create(df(Row(1, "a"), Row(2, "b")), path)
    ParquetTable.merge(spark, path, df(Row(2, "B"), Row(3, "c")), Seq("id"),
      cdf = true)
    val types = ParquetTable.tableChanges(spark, path, 2L, 2L, Seq("id"))
      .select("id", "_change_type").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSet
    assert(types === Set(2 -> "update_preimage", 2 -> "update_postimage",
      3 -> "insert"))
  } }

  test("shallow clone reads through; writes stay clone-local") { withCommitter {
    val src = tmpDir("cb-clone-src") + "/t"
    val dst = tmpDir("cb-clone-dst") + "/t"
    ParquetTable.create(df(Row(1, "a")), src)
    ParquetTable.shallowClone(spark, src, dst)
    ParquetTable.merge(spark, dst, df(Row(2, "b")), Seq("id"))
    assert(rowsOf(dst) === Map(1 -> "a", 2 -> "b"))
    assert(rowsOf(src) === Map(1 -> "a"), "clone write leaked into source")
  } }

  test("vacuum retires unreferenced history, kept versions still read") { withCommitter {
    val path = tmpDir("cb-vac") + "/t"
    ParquetTable.create(df(Row(1, "a")), path)
    ParquetTable.merge(spark, path, df(Row(1, "b")), Seq("id"))
    ParquetTable.merge(spark, path, df(Row(1, "c")), Seq("id"))
    ParquetTable.vacuum(spark, path, keepLast = 2)
    assert(ParquetTable.versions(spark, path) === Seq(2L, 3L))
    assert(ParquetTable.readAt(spark, path, 2L).head().getString(1) === "b")
    assert(rowsOf(path) === Map(1 -> "c"))
  } }

  test("restore republishes an old image as a new version") { withCommitter {
    val path = tmpDir("cb-restore") + "/t"
    ParquetTable.create(df(Row(1, "a")), path)
    ParquetTable.merge(spark, path, df(Row(1, "b")), Seq("id"))
    ParquetTable.restore(spark, path, 1L)
    assert(ParquetTable.currentVersion(spark, path).get === 3L)
    assert(rowsOf(path) === Map(1 -> "a"))
  } }

  test("convert adopts a plain layout; insertInto appends O(rows)") { withCommitter {
    val path = tmpDir("cb-conv") + "/t"
    frame(schema, Seq(Row(1, "a"), Row(2, "b"))).write.parquet(path)
    assert(ParquetTable.convert(spark, path) === 1L)
    ParquetTable.insertInto(spark, path, df(Row(3, "c")))
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "b", 3 -> "c"))
  } }

  // round-8/9 verbs, same guarantee: behavior proven through every
  // committer, not just the local-FS default

  test("fsck reports clean after a verb chain; _latest hint tracks the head") { withCommitter {
    val path = tmpDir("cb-fsck") + "/t"
    ParquetTable.create(df(Row(1, "a")), path)
    ParquetTable.merge(spark, path, df(Row(2, "b")), Seq("id"))
    ParquetTable.deleteVectors(spark, path, col("id") === 1)
    ParquetTable.compact(spark, path)
    assert(ParquetTable.fsck(spark, path).isEmpty)
    assert(ParquetTable.currentVersion(spark, path).get === 4L)
  } }

  test("purge erases matching rows from every surviving version") { withCommitter {
    val path = tmpDir("cb-purge") + "/t"
    ParquetTable.create(df(Row(1, "secret"), Row(2, "b")), path)
    ParquetTable.merge(spark, path, df(Row(3, "c")), Seq("id"))
    assert(ParquetTable.purge(spark, path, col("v") === "secret") === 1L)
    assert(rowsOf(path) === Map(2 -> "b", 3 -> "c"))
    ParquetTable.versions(spark, path).foreach { v =>
      assert(ParquetTable.readAt(spark, path, v)
        .filter(col("v") === "secret").count() === 0L, s"version $v")
    }
  } }

  private val acSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("del", BooleanType, nullable = false)))

  test("generated + identity columns fill through this committer; compactSmall folds") { withCommitter {
    val path = tmpDir("cb-gen") + "/t"
    IdentityColumns.add(spark, path, "uid", start = 100, step = 1)
    GeneratedColumns.add(spark, path, "vv", "upper(v)")
    ParquetTable.create(df(Row(1, "a")), path)
    ParquetTable.insertInto(spark, path, df(Row(2, "b")))
    ParquetTable.insertInto(spark, path, df(Row(3, "c")))
    val got = ParquetTable.read(spark, path)
      .orderBy("uid").collect().map(r => (r.getInt(0), r.getString(1),
        r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq((1, "a", 100L, "A"), (2, "b", 101L, "B"), (3, "c", 102L, "C")))
    val vBefore = ParquetTable.currentVersion(spark, path).get
    val vNew = ParquetTable.compactSmall(spark, path, minBytes = 1000000L)
    assert(vNew === vBefore + 1)
    assert(ParquetTable.read(spark, path).count() === 3)
    assert(ParquetTable.fsck(spark, path).isEmpty)
  } }

  test("appendOnly property refuses mutation through this committer") { withCommitter {
    val path = tmpDir("cb-props") + "/t"
    ParquetTable.create(df(Row(1, "a")), path)
    TableProperties.set(spark, path, Map(TableProperties.AppendOnlyKey -> "true"))
    ParquetTable.insertInto(spark, path, df(Row(2, "b")))
    val e = intercept[IllegalArgumentException] {
      ParquetTable.delete(spark, path, col("id") === 1)
    }
    assert(e.getMessage.contains("appendOnly"))
    assert(rowsOf(path) === Map(1 -> "a", 2 -> "b"))
  } }

  test("APPLY CHANGES type 1: out-of-order batches converge") { withCommitter {
    val path = tmpDir("cb-ac1") + "/t"
    // later batch first — the watermark merge must still converge
    ApplyChanges.applyInto(spark, path,
      frame(acSchema, Seq(Row(1, "new", 5L, false), Row(2, "gone", 6L, true))),
      Seq("id"), "seq", Some(col("del")))
    ApplyChanges.applyInto(spark, path,
      frame(acSchema, Seq(Row(1, "old", 1L, false), Row(2, "alive", 2L, false))),
      Seq("id"), "seq", Some(col("del")))
    val live = ApplyChanges.readApplied(spark, path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(live === Map(1 -> "new"))
  } }

  test("APPLY CHANGES SCD2: interval history identical through this committer") { withCommitter {
    val path = tmpDir("cb-ac2") + "/t"
    ApplyChanges.applyIntoScd2(spark, path,
      frame(acSchema, Seq(Row(1, "v2", 5L, false))),
      Seq("id"), "seq", Some(col("del")))
    ApplyChanges.applyIntoScd2(spark, path,
      frame(acSchema, Seq(Row(1, "v1", 1L, false), Row(1, "mid", 3L, false))),
      Seq("id"), "seq", Some(col("del")))
    val hist = ApplyChanges.readScd2(spark, path)
      .select(col("id"), col(ApplyChanges.StartCol), col(ApplyChanges.EndCol))
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).sortBy(x => (x._1, x._2)).toSeq
    assert(hist === Seq((1, 1L, Some(3L)), (1, 3L, Some(5L)), (1, 5L, None)))
  } }

  test("mutations under an active column mapping commit through this committer") { withCommitter {
    val path = tmpDir("cb-colmap") + "/t"
    ParquetTable.createVersioned(
      frame(pschema, Seq(Row(1, "a", "d1"), Row(2, "b", "d2"))), path, Seq("day"))
    ParquetTable.renameColumn(spark, path, "v", "val")
    // partial rewrite through the logical name: the commit must carry
    // the `#colmap=` header or the next read serves raw physical names
    ParquetTable.mergeVersioned(spark, path,
      frame(StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("val", StringType, nullable = false),
        StructField("day", StringType, nullable = false))),
        Seq(Row(2, "B", "d2"), Row(3, "c", "d3"))), Seq("id"), Seq("day"))
    ParquetTable.update(spark, path, col("id") === 1, Map("val" -> lit("A")))
    val v = ParquetTable.currentVersion(spark, path).get
    assert(ParquetTable.columnMapping(spark, path, v)._1 === Map("v" -> "val"))
    val got = ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(1 -> "A", 2 -> "B", 3 -> "c"))
    // materialization (full compact) clears the map through this committer
    ParquetTable.compact(spark, path)
    val v2 = ParquetTable.currentVersion(spark, path).get
    assert(ParquetTable.columnMapping(spark, path, v2)._1.isEmpty)
    assert(ParquetTable.read(spark, path).columns.contains("val"))
  } }

  test("ADD COLUMN lifecycle commits through this committer") { withCommitter {
    val path = tmpDir("cb-addcol") + "/t"
    ParquetTable.create(df(Row(1, "a")), path)
    val vAdd = ParquetTable.addColumn(spark, path, "tier", "string", Some("'std'"))
    // the DDL is a real commit: version advanced, old version unchanged
    assert(vAdd == 2L)
    assert(!ParquetTable.readAt(spark, path, 1L).columns.contains("tier"))
    ParquetTable.insertInto(spark, path, df(Row(2, "b")))
    ColumnDefaults.setDefault(spark, path, "tier", Some("'v2'"))
    ParquetTable.insertInto(spark, path, df(Row(3, "c")))
    val tiers = ParquetTable.read(spark, path).orderBy("id")
      .select("tier").collect().map(r => Option(r.getString(0))).toSeq
    assert(tiers == Seq(None, Some("std"), Some("v2")))
    // drop closes the window through the same commit path
    val vDrop = ParquetTable.dropColumn(spark, path, "tier")
    assert(!ParquetTable.read(spark, path).columns.contains("tier"))
    assert(ParquetTable.readAt(spark, path, vDrop - 1).columns.contains("tier"))
  } }
}

/** Object-store `If-None-Match: *` shim over a local mirror: a JVM-global
  * put-if-absent keyed by the qualified target URI IS the conditional PUT
  * (all-or-nothing arbitration, exactly one winner per key, process-wide
  * like a real store's namespace); only the winner writes the manifest,
  * staged + atomically renamed so readers see none-or-all — the atomicity
  * a single store PUT provides. Losers never touch the filesystem.
  */
class ConditionalPutShimCommitter extends LogCommitter {
  override def commit(fs: FileSystem, target: Path, content: Array[Byte]): Boolean = {
    val key = fs.makeQualified(target).toUri.toString
    if (ConditionalPutShimCommitter.store.putIfAbsent(key, java.lang.Boolean.TRUE) != null)
      return false
    fs.mkdirs(target.getParent)
    val tmp = new Path(target.getParent, s".tmp_condput_${System.nanoTime()}")
    val out = fs.create(tmp, false)
    try out.write(content) finally out.close()
    require(fs.rename(tmp, target), s"conditional-PUT mirror publish failed: $target")
    true
  }
}
object ConditionalPutShimCommitter {
  private val store = new ConcurrentHashMap[String, java.lang.Boolean]()
}

/** HDFS rename semantics on a local FS: destination-exists refused under
  * one JVM-wide lock (the NameNode's single-writer metadata op).
  */
class NoReplaceRenameShimCommitter extends LogCommitter {
  override def commit(fs: FileSystem, target: Path, content: Array[Byte]): Boolean =
    NoReplaceRenameShimCommitter.lock.synchronized {
      if (fs.exists(target)) false else RenameCommitter.commit(fs, target, content)
    }
}
object NoReplaceRenameShimCommitter { private val lock = new Object }

class HardLinkCommitterBatterySpec
  extends CommitterBattery(() => HardLinkCasCommitter)
class RenameCommitterBatterySpec
  extends CommitterBattery(() => new NoReplaceRenameShimCommitter)
class ConditionalPutCommitterBatterySpec
  extends CommitterBattery(() => new ConditionalPutShimCommitter)
