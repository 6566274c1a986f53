package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RENAME/DROP COLUMN without rewrite (the `#colmap=` manifest header):
  * O(1) metadata-only commits, per-version logical views under time
  * travel, the mutation freeze until compact/optimize materializes, and
  * the carry rules (restore, clone).
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String): String = {
    val path = tmpDir(s"colmap-$tag") + "/t"
    ParquetTable.create(
      Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "v", "amount"), path)
    path
  }

  test("rename is metadata-only: same data dirs, new logical name, history keeps the old") {
    val path = mk("basic")
    val before = ParquetTable.detail(spark, path).head()
    val v2 = ParquetTable.renameColumn(spark, path, "amount", "total")
    assert(v2 === 2L)
    // logical view renamed, values intact
    assert(ParquetTable.read(spark, path).columns.toSeq === Seq("id", "v", "total"))
    assert(ParquetTable.read(spark, path).agg(sum("total")).head.getDouble(0) === 30.0)
    // O(1): the new version references the SAME data dirs (no rewrite)
    val after = ParquetTable.detail(spark, path).head()
    assert(after.getInt(after.fieldIndex("n_data_dirs")) ===
      before.getInt(before.fieldIndex("n_data_dirs")))
    // DESCRIBE DETAIL surfaces the active mapping (empty when unmapped)
    assert(before.getString(before.fieldIndex("column_mapping")) === "")
    assert(after.getString(after.fieldIndex("column_mapping")) === "amount>total")
    // time travel shows each version under its own names
    assert(ParquetTable.readAt(spark, path, 1L).columns.contains("amount"))
    assert(!ParquetTable.readAt(spark, path, 1L).columns.contains("total"))
  }

  test("drop hides the column from the new version only; data survives until materialization") {
    val path = mk("drop")
    ParquetTable.dropColumn(spark, path, "v")
    assert(ParquetTable.read(spark, path).columns.toSeq === Seq("id", "amount"))
    assert(ParquetTable.readAt(spark, path, 1L).columns.contains("v"))
  }

  test("chained renames compose; rename back to the physical name clears the entry") {
    val path = mk("chain")
    ParquetTable.renameColumn(spark, path, "amount", "total")
    ParquetTable.renameColumn(spark, path, "total", "grand_total")
    assert(ParquetTable.read(spark, path).columns.contains("grand_total"))
    val (renames, _) = ParquetTable.columnMapping(
      spark, path, ParquetTable.currentVersion(spark, path).get)
    assert(renames === Map("amount" -> "grand_total"), "chain must collapse to one entry")
    ParquetTable.renameColumn(spark, path, "grand_total", "amount")
    val (r2, _) = ParquetTable.columnMapping(
      spark, path, ParquetTable.currentVersion(spark, path).get)
    assert(r2.isEmpty, "rename back to physical must clear the mapping")
    // and with no mapping left, mutations work without compact
    ParquetTable.merge(spark, path, Seq((3, "c", 30.0)).toDF("id", "v", "amount"), Seq("id"))
    assert(ParquetTable.read(spark, path).count() === 3)
  }

  test("unpartitioned COW merge through the logical name materializes the map") {
    val path = mk("cowmerge")
    ParquetTable.renameColumn(spark, path, "amount", "total")
    ParquetTable.merge(spark, path,
      Seq((2, "b2", 25.0), (3, "c", 30.0)).toDF("id", "v", "total"), Seq("id"),
      mergeOnRead = Some(false))
    // a full-image rewrite writes logical names physically = materialization
    val v = ParquetTable.currentVersion(spark, path).get
    assert(ParquetTable.columnMapping(spark, path, v)._1.isEmpty,
      "COW merge must clear the map")
    val got = ParquetTable.read(spark, path).orderBy("id")
      .select("id", "v", "total").as[(Int, String, Double)].collect().toSeq
    assert(got === Seq((1, "a", 10.0), (2, "b2", 25.0), (3, "c", 30.0)))
    // history still serves v2 under the mapping and v1 under raw names
    assert(ParquetTable.readAt(spark, path, 2L).columns.contains("total"))
    assert(ParquetTable.readAt(spark, path, 1L).columns.contains("amount"))
  }

  test("merge-on-read merge under a mapping appends PHYSICAL files and carries the map") {
    val path = mk("mormerge")
    ParquetTable.renameColumn(spark, path, "amount", "total")
    ParquetTable.merge(spark, path,
      Seq((2, "b2", 25.0), (3, "c", 30.0)).toDF("id", "v", "total"), Seq("id"),
      mergeOnRead = Some(true))
    val v = ParquetTable.currentVersion(spark, path).get
    assert(ParquetTable.columnMapping(spark, path, v)._1 === Map("amount" -> "total"),
      "MOR merge must carry the map")
    val got = ParquetTable.read(spark, path).orderBy("id")
      .select("id", "v", "total").as[(Int, String, Double)].collect().toSeq
    assert(got === Seq((1, "a", 10.0), (2, "b2", 25.0), (3, "c", 30.0)))
    // the appended dir is physical-named: compact (materialize) then check
    // nothing changes logically
    ParquetTable.compact(spark, path)
    assert(ParquetTable.read(spark, path).orderBy("id")
      .select("id", "v", "total").as[(Int, String, Double)].collect().toSeq === got)
  }

  test("insertInto under a mapping (with a drop) stays union-compatible and carries") {
    val path = mk("insert")
    ParquetTable.renameColumn(spark, path, "amount", "total")
    ParquetTable.dropColumn(spark, path, "v")
    // the insert aligns to the LOGICAL schema (id, total)
    ParquetTable.insertInto(spark, path, Seq((9, 90.0)).toDF("id", "total"))
    val got = ParquetTable.read(spark, path).orderBy("id")
      .select("id", "total").as[(Int, Double)].collect().toSeq
    assert(got === Seq((1, 10.0), (2, 20.0), (9, 90.0)))
    assert(ParquetTable.read(spark, path).columns.toSeq === Seq("id", "total"))
    // time travel to the pre-DDL version still shows raw names, old rows only
    assert(ParquetTable.readAt(spark, path, 1L).columns.toSeq === Seq("id", "v", "amount"))
    assert(ParquetTable.readAt(spark, path, 1L).count() === 2)
    // materialize and re-check (the dropped column's bytes leave here)
    ParquetTable.compact(spark, path)
    assert(ParquetTable.read(spark, path).orderBy("id")
      .select("id", "total").as[(Int, Double)].collect().toSeq === got)
  }

  test("UPDATE/DELETE on a mapped PARTITIONED table: partial rewrite, map carried") {
    val path = tmpDir("colmap-rewrite") + "/t"
    ParquetTable.createVersioned(
      Seq((1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0))
        .toDF("id", "day", "amount"), path, Seq("day"))
    ParquetTable.renameColumn(spark, path, "amount", "total")
    ParquetTable.update(spark, path, col("id") === 1, Map("total" -> lit(11.0)))
    ParquetTable.delete(spark, path, col("total") === 20.0)
    val v = ParquetTable.currentVersion(spark, path).get
    assert(ParquetTable.columnMapping(spark, path, v)._1 === Map("amount" -> "total"))
    val got = ParquetTable.read(spark, path).orderBy("id")
      .select("id", "day", "total").as[(Int, String, Double)].collect().toSeq
    assert(got === Seq((1, "d1", 11.0), (3, "d2", 30.0)))
    // the UNTOUCHED d2 partition kept its original physical dir; only d1 rewrote
    val entries = ParquetTable.partitionEntries(spark, path, v).get.toMap
    val entriesV1 = ParquetTable.partitionEntries(spark, path, 1L).get.toMap
    assert(entries("day=d2") === entriesV1("day=d2"), "untouched partition rewrote")
    assert(entries("day=d1") !== entriesV1("day=d1"))
  }

  test("mutating through a REUSED logical name hits the right physical column") {
    // rename a→x then c→a: logical `a` is physical `c`. An UPDATE on
    // logical a must rewrite physical c and leave physical a (now x) alone.
    val path = tmpDir("colmap-reuse-mut") + "/t"
    ParquetTable.create(Seq((1, 100L, 900L), (2, 200L, 800L)).toDF("id", "a", "c"), path)
    ParquetTable.renameColumn(spark, path, "a", "x")
    ParquetTable.renameColumn(spark, path, "c", "a")
    ParquetTable.insertInto(spark, path, Seq((3, 300L, 700L)).toDF("id", "x", "a"))
    val got = ParquetTable.read(spark, path).orderBy("id")
      .select("id", "x", "a").as[(Int, Long, Long)].collect().toSeq
    assert(got === Seq((1, 100L, 900L), (2, 200L, 800L), (3, 300L, 700L)))
    // deleteVectors through the reused name: logical a===800 is row id=2
    ParquetTable.deleteVectors(spark, path, col("a") === 800L)
    assert(ParquetTable.read(spark, path).orderBy("id")
      .select("id", "x", "a").as[(Int, Long, Long)].collect().toSeq ===
      Seq((1, 100L, 900L), (3, 300L, 700L)))
  }

  test("mergeVersioned under a mapping: partition-scoped, physical files, map carried") {
    val path = tmpDir("colmap-mv") + "/t"
    ParquetTable.createVersioned(
      Seq((1, "d1", 10.0), (3, "d2", 30.0)).toDF("id", "day", "amount"),
      path, Seq("day"))
    ParquetTable.renameColumn(spark, path, "amount", "total")
    ParquetTable.merge(spark, path,
      Seq((1, "d1", 11.0), (4, "d3", 40.0)).toDF("id", "day", "total"),
      Seq("id"), Seq("day"))
    val v = ParquetTable.currentVersion(spark, path).get
    assert(ParquetTable.columnMapping(spark, path, v)._1 === Map("amount" -> "total"))
    val got = ParquetTable.read(spark, path).orderBy("id")
      .select("id", "day", "total").as[(Int, String, Double)].collect().toSeq
    assert(got === Seq((1, "d1", 11.0), (3, "d2", 30.0), (4, "d3", 40.0)))
    // untouched d2 kept its dir
    val entries = ParquetTable.partitionEntries(spark, path, v).get.toMap
    val entriesV1 = ParquetTable.partitionEntries(spark, path, 1L).get.toMap
    assert(entries("day=d2") === entriesV1("day=d2"))
    // readWhere on the logical name still prunes/filters correctly
    assert(ParquetTable.readWhere(spark, path, col("total") > 35.0)
      .select("id").as[Int].collect().toSeq === Seq(4))
  }

  test("CDF capture under a mapping carries LOGICAL column names") {
    val path = mk("cdfcap")
    ParquetTable.renameColumn(spark, path, "amount", "total")
    val v = ParquetTable.insertInto(spark, path,
      Seq((7, "g", 70.0)).toDF("id", "v", "total"), cdf = true)
    val feed = ParquetTable.tableChanges(spark, path, v, v, Seq("id"))
    assert(feed.columns.contains("total") && !feed.columns.contains("amount"))
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Int].collect().toSeq === Seq(7))
  }

  test("refusals: missing source, existing target, partition column, constraint reference") {
    val path = mk("refuse")
    intercept[IllegalArgumentException] {
      ParquetTable.renameColumn(spark, path, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      ParquetTable.renameColumn(spark, path, "amount", "v")
    }
    Constraints.add(spark, path, "amt_pos", "amount > 0")
    val e = intercept[IllegalArgumentException] {
      ParquetTable.renameColumn(spark, path, "amount", "total")
    }
    assert(e.getMessage.contains("CHECK constraint"))
    Constraints.drop(spark, path, "amt_pos")

    val ppath = tmpDir("colmap-part") + "/t"
    ParquetTable.createVersioned(
      Seq((1, "d1", 1.0), (2, "d2", 2.0)).toDF("id", "day", "x"), ppath, Seq("day"))
    val pe = intercept[IllegalArgumentException] {
      ParquetTable.renameColumn(spark, ppath, "day", "dt")
    }
    assert(pe.getMessage.contains("partition column"))
    // non-partition rename on a partitioned table works and reads back
    ParquetTable.renameColumn(spark, ppath, "x", "y")
    assert(ParquetTable.read(spark, ppath).columns.toSeq.sorted === Seq("day", "id", "y"))
  }

  test("restore and shallow clone carry the mapping of the version they publish") {
    val path = mk("carry")
    ParquetTable.renameColumn(spark, path, "amount", "total") // v2 mapped
    // restore to v1: the republished version must NOT carry the mapping
    ParquetTable.restore(spark, path, 1L)
    assert(ParquetTable.read(spark, path).columns.contains("amount"))
    // restore back to the mapped v2: mapping must come back with it
    ParquetTable.restore(spark, path, 2L)
    assert(ParquetTable.read(spark, path).columns.contains("total"))
    // a clone of the mapped version serves logical names too
    val clone = tmpDir("colmap-clone") + "/t"
    ParquetTable.shallowClone(spark, path, clone)
    assert(ParquetTable.read(spark, clone).columns.contains("total"))
  }

  test("SQL: ALTER TABLE RENAME/DROP COLUMN and filtered reads over the logical view") {
    val path = mk("sql")
    graft.sql.GraftSql.sql(spark,
      s"ALTER TABLE graft.`$path` RENAME COLUMN amount TO total")
    val got = graft.sql.GraftSql.sql(spark,
      s"SELECT id, total FROM graft.`$path` WHERE total > 15").collect()
    assert(got.map(r => (r.getInt(0), r.getDouble(1))).toSeq === Seq((2, 20.0)))
    graft.sql.GraftSql.sql(spark, s"ALTER TABLE graft.`$path` DROP COLUMN v")
    assert(graft.sql.GraftSql.sql(spark,
      s"SELECT * FROM graft.`$path`").columns.toSeq === Seq("id", "total"))
  }

  test("changes diffs ACROSS a rename window through physical identity") {
    val path = mk("cdf")
    ParquetTable.renameColumn(spark, path, "amount", "total") // v2
    // the pure-DDL window itself moves no rows — and speaks TO's names
    val ddlOnly = ParquetTable.changes(spark, path, 1L, 2L, Seq("id"))
    assert(ddlOnly.count() === 0L)
    assert(ddlOnly.columns.contains("total") && !ddlOnly.columns.contains("amount"))
    ParquetTable.insertInto(spark, path,
      Seq((3, "c", 30.0)).toDF("id", "v", "total")) // v3, still mapped
    val diff = ParquetTable.changes(spark, path, 1L, 3L, Seq("id"))
    assert(diff.columns.contains("total"))
    val rows = diff.collect().map(r =>
      (r.getInt(r.fieldIndex("id")), r.getDouble(r.fieldIndex("total")),
        r.getString(r.fieldIndex("_change_type")))).toSeq
    assert(rows === Seq((3, 30.0, "insert")))
  }

  test("changes across a DROP window ignores the dropped column; materialization windows refuse") {
    val path = mk("cdfdrop")
    ParquetTable.dropColumn(spark, path, "v") // v2
    // the drop moved no rows; the diff simply omits the dropped column
    val d = ParquetTable.changes(spark, path, 1L, 2L, Seq("id"))
    assert(d.count() === 0L && !d.columns.contains("v"))
    // a MATERIALIZATION inside the window breaks physical identity
    val mat = mk("cdfmat")
    ParquetTable.renameColumn(spark, mat, "amount", "total")
    ParquetTable.compact(spark, mat) // v3: physical names now logical
    val e = intercept[IllegalArgumentException] {
      ParquetTable.changes(spark, mat, 1L, 3L, Seq("id"))
    }
    assert(e.getMessage.contains("MATERIALIZATION"))
    // split at the materializing commit: both sub-windows are fine
    assert(ParquetTable.changes(spark, mat, 1L, 2L, Seq("id")).count() === 0L)
    assert(ParquetTable.changes(spark, mat, 3L, 3L, Seq("id")).count() === 0L)
  }

  test("readWhere serves the logical view (conservative skipping on renamed columns)") {
    val path = mk("skip")
    ParquetTable.renameColumn(spark, path, "amount", "total")
    val got = ParquetTable.readWhere(spark, path, col("total") > 15)
      .select("id").as[Int].collect().toSeq
    assert(got === Seq(2))
  }

  test("readWhere prunes on PHYSICAL stats under a reused logical name (ADVICE r9 high)") {
    // rename a→x then c→a: logical `a` now reads physical `c`, while the
    // sidecars still carry stats for the OLD physical `a`. Pruning that
    // resolves the predicate name against raw sidecar keys would consult
    // the wrong column's [min, max] and silently drop every file.
    val path = tmpDir("colmap-reuse") + "/t"
    val rows = (0 until 100).map(i => (i, i.toLong, (1000 - i).toLong))
      .toDF("id", "a", "c")
      // disjoint per-file ranges make the wrong-column prune decisive
      .repartitionByRange(4, col("a"))
    ParquetTable.create(rows, path)
    ParquetTable.renameColumn(spark, path, "a", "x")
    ParquetTable.renameColumn(spark, path, "c", "a")
    // ground truth through the unpruned read
    val expected = ParquetTable.read(spark, path)
      .filter(col("a") === 950L).select("id").as[Int].collect().toSeq
    assert(expected === Seq(50))
    val pruned = ParquetTable.readWhere(spark, path, col("a") === 950L)
      .select("id").as[Int].collect().toSeq
    assert(pruned === expected,
      "stats pruning resolved a logical name against physical sidecar stats")
    // and the rename chain still prunes correctly on the moved column
    val viaX = ParquetTable.readWhere(spark, path, col("x") === 50L)
      .select("id").as[Int].collect().toSeq
    assert(viaX === Seq(50))
  }

  test("a CHECK constraint added on the RENAMED name gates physical partial commits") {
    val path = mk("ck")
    ParquetTable.renameColumn(spark, path, "amount", "total")
    // the constraint binds against the LOGICAL schema the user sees
    Constraints.add(spark, path, "total_pos", "total > 0")
    ParquetTable.insertInto(spark, path, Seq((5, "e", 50.0)).toDF("id", "v", "total"))
    assert(ParquetTable.read(spark, path).count() === 3)
    // a violating row fails with the CHECK message (never an
    // unresolved-column error against the physical files), commit unpublished
    val e = intercept[IllegalArgumentException] {
      ParquetTable.insertInto(spark, path, Seq((6, "f", -1.0)).toDF("id", "v", "total"))
    }
    assert(e.getMessage.contains("CHECK"))
    assert(ParquetTable.read(spark, path).count() === 3)
    assert(ParquetTable.fsck(spark, path).isEmpty)
  }

  test("identity-ruled columns refuse rename and drop (rule is keyed by name)") {
    val path = tmpDir("colmap-ident") + "/t"
    IdentityColumns.add(spark, path, "rid", start = 1L, step = 1L)
    ParquetTable.create(Seq(("a", 1.0), ("b", 2.0)).toDF("v", "amount"), path)
    val e = intercept[IllegalArgumentException] {
      ParquetTable.renameColumn(spark, path, "rid", "row_id")
    }
    assert(e.getMessage.contains("identity rule"))
    val e2 = intercept[IllegalArgumentException] {
      ParquetTable.dropColumn(spark, path, "rid")
    }
    assert(e2.getMessage.contains("identity rule"))
    // dropping the RULE unblocks the DDL
    IdentityColumns.drop(spark, path, "rid")
    ParquetTable.renameColumn(spark, path, "rid", "row_id")
    assert(ParquetTable.read(spark, path).columns.contains("row_id"))
  }
}
