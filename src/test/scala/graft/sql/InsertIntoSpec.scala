package graft.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.ParquetTable

/** SQL INSERT INTO / INSERT OVERWRITE on graft versioned tables, and the
  * `ParquetTable.insertInto` commit underneath: O(appended rows) on
  * unpartitioned tables (one appended dir, existing dirs untouched),
  * affected-partition rewrite on partitioned ones, duplicates kept
  * (INSERT is append; MERGE is the upsert verb).
  */
class InsertIntoSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false)))

  private val pschema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false),
    StructField("day", StringType, nullable = false)))

  private def rowsOf(path: String): Seq[(Int, String)] =
    ParquetTable.read(spark, path).select("id", "v").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSeq.sorted

  test("SQL INSERT INTO appends O(rows): new dir only, duplicates kept") {
    val path = tmpDir("ins-unpart") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(1, "a"), Row(2, "b"))), path)
    val v1Dirs = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("_d")).map(_.getName).toSet
    GraftSql.sql(spark, s"INSERT INTO graft.`$path` VALUES (2, 'b'), (3, 'c')")
    val v2Dirs = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("_d")).map(_.getName).toSet
    assert(v1Dirs.subsetOf(v2Dirs) && v2Dirs.size === v1Dirs.size + 1,
      "append must not rewrite existing dirs")
    // duplicate (2, b) SURVIVES — append, not upsert
    assert(rowsOf(path) === Seq(1 -> "a", 2 -> "b", 2 -> "b", 3 -> "c"))
    assert(ParquetTable.versions(spark, path) === Seq(1L, 2L))
    // time travel: v1 untouched
    assert(ParquetTable.readAt(spark, path, 1L).count() === 2L)
  }

  test("SQL INSERT INTO ... SELECT reads graft sources in the query") {
    val src = tmpDir("ins-src") + "/s"
    val dst = tmpDir("ins-dst") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(10, "x"), Row(11, "y"))), src)
    ParquetTable.create(frame(schema, Seq(Row(1, "a"))), dst)
    GraftSql.sql(spark,
      s"INSERT INTO graft.`$dst` SELECT id, v FROM graft.`$src` WHERE id > 10")
    assert(rowsOf(dst) === Seq(1 -> "a", 11 -> "y"))
  }

  test("SQL INSERT OVERWRITE replaces the image as a new version") {
    val path = tmpDir("ins-over") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(1, "a"), Row(2, "b"))), path)
    GraftSql.sql(spark, s"INSERT OVERWRITE graft.`$path` VALUES (9, 'z')")
    assert(rowsOf(path) === Seq(9 -> "z"))
    assert(ParquetTable.versions(spark, path) === Seq(1L, 2L))
    assert(ParquetTable.readAt(spark, path, 1L).count() === 2L) // old image travels
  }

  test("partitioned INSERT INTO is append-entry: old dirs untouched, O(rows)") {
    val path = tmpDir("ins-part") + "/t"
    ParquetTable.createVersioned(frame(pschema,
      Seq(Row(1, "a", "d1"), Row(2, "b", "d2"))), path, Seq("day"))
    val entries1 = ParquetTable.partitionEntries(spark, path, 1L).get
    GraftSql.sql(spark, s"INSERT INTO graft.`$path` VALUES (3, 'c', 'd2'), (4, 'd', 'd3')")
    val entries2 = ParquetTable.partitionEntries(spark, path, 2L).get
    // EVERY v1 entry survives verbatim (no rewrite of existing dirs);
    // the affected + new partitions gain entries on ONE new dir
    assert(entries1.forall(entries2.contains))
    val added = entries2.filterNot(entries1.contains)
    assert(added.map(_._1).sorted === Seq("day=d2", "day=d3"))
    assert(added.map(_._2).distinct.size === 1, "one appended dir for the batch")
    // d2 now spans two dirs; reads union them
    assert(entries2.count(_._1 == "day=d2") === 2)
    assert(rowsOf(path) === Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"))
  }

  test("multi-dir partition: merge and delete consolidate, nothing lost") {
    val path = tmpDir("ins-part-consol") + "/t"
    ParquetTable.createVersioned(frame(pschema,
      Seq(Row(1, "a", "d1"), Row(2, "b", "d1"))), path, Seq("day"))
    ParquetTable.insertInto(spark, path,
      frame(pschema, Seq(Row(3, "c", "d1")))) // d1 spans two dirs
    assert(ParquetTable.partitionEntries(spark, path, 2L).get
      .count(_._1 == "day=d1") === 2)
    // a merge into d1 must see rows from BOTH dirs (the lost-update trap)
    ParquetTable.mergeVersioned(spark, path,
      frame(pschema, Seq(Row(2, "B", "d1"))), Seq("id"), Seq("day"))
    assert(rowsOf(path) === Seq(1 -> "a", 2 -> "B", 3 -> "c"))
    // and it consolidated d1 back onto one dir
    assert(ParquetTable.partitionEntries(spark, path, 3L).get
      .count(_._1 == "day=d1") === 1)
    // delete over a fresh multi-dir partition also sees both dirs
    ParquetTable.insertInto(spark, path,
      frame(pschema, Seq(Row(4, "d", "d1"))))
    ParquetTable.delete(spark, path, col("id") === 1)
    assert(rowsOf(path) === Seq(2 -> "B", 3 -> "c", 4 -> "d"))
    // time travel still serves every intermediate image
    assert(ParquetTable.readAt(spark, path, 2L).count() === 3L)
  }

  test("insertInto captures CDF inserts from committed data") {
    val path = tmpDir("ins-cdf") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(1, "a"))), path)
    ParquetTable.insertInto(spark, path,
      frame(schema, Seq(Row(2, "b"), Row(2, "b"))), cdf = true)
    val feed = ParquetTable.tableChanges(spark, path, 2L, 2L, Seq("id"))
      .select("id", "v", "_change_type").collect().map(_.toString).sorted
    assert(feed === Array("[2,b,insert]", "[2,b,insert]")) // multiset kept
  }

  test("partitioned CDF capture diffs committed slices (duplicate-safe)") {
    val path = tmpDir("ins-cdf-part") + "/t"
    ParquetTable.createVersioned(frame(pschema,
      Seq(Row(1, "a", "d1"))), path, Seq("day"))
    // insert a duplicate of an EXISTING row: exceptAll must still report
    // exactly the one new copy
    ParquetTable.insertInto(spark, path,
      frame(pschema, Seq(Row(1, "a", "d1"), Row(5, "e", "d1"))), cdf = true)
    val feed = ParquetTable.tableChanges(spark, path, 2L, 2L, Seq("id"))
      .select("id", "v", "_change_type").collect().map(_.toString).sorted
    assert(feed === Array("[1,a,insert]", "[5,e,insert]"))
  }

  test("unsupported INSERT shapes fail fast naming the reason") {
    val path = tmpDir("ins-bad") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(1, "a"))), path)
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"INSERT INTO graft.`$path` (id, v) VALUES (2, 'b')")
    }
    assert(e1.getMessage.contains("column list"))
  }

  test("declarative path: spark.sql INSERT on a session with GraftSessionExtensions") {
    val ext = org.apache.spark.sql.GraftColumnBridge.sessionWithExtensions(
      spark, new graft.functions.GraftSessionExtensions()(_))
    val path = tmpDir("ins-ext") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(1, "a"))), path)
    ext.sql(s"INSERT INTO graft.`$path` VALUES (2, 'b')") // plain SQL
    assert(rowsOf(path) === Seq(1 -> "a", 2 -> "b"))
  }

  test("txn markers make inserts idempotent under re-delivery") {
    val path = tmpDir("ins-txn") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(1, "a"))), path)
    ParquetTable.insertInto(spark, path, frame(schema, Seq(Row(2, "b"))),
      txn = Some(("app", 3L)))
    assert(ParquetTable.insertInto(spark, path, frame(schema, Seq(Row(2, "DUP"))),
      txn = Some(("app", 3L))) === -1L)
    assert(rowsOf(path) === Seq(1 -> "a", 2 -> "b"))
  }
}
