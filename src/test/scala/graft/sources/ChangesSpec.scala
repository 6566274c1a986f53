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

  // ---- per-commit CDF (tableChanges) --------------------------------------

  private def changeManifestDirs(path: String): Seq[String] = {
    val d = new java.io.File(path, "_graft_changes")
    if (!d.exists()) Seq.empty else d.list().toSeq.sorted
  }

  test("per-commit feed: changed-then-reverted key appears in BOTH commits") {
    val path = tmpDir("cdf-revert") + "/t"
    ParquetTable.create(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"), path) // v1
    ParquetTable.merge(spark, path, Seq((1L, 99.0)).toDF("id", "bal"),
      Seq("id"), cdf = true) // v2: 1 → 99
    ParquetTable.merge(spark, path, Seq((1L, 10.0)).toDF("id", "bal"),
      Seq("id"), cdf = true) // v3: revert 1 → 10
    // write-time capture, not read-time fallback: manifests are on disk
    assert(changeManifestDirs(path) ===
      Seq("v00000000000000000002", "v00000000000000000003"))
    val got = ParquetTable.tableChanges(spark, path, 2L, 3L, Seq("id"))
      .select(col("_commit_version"), col("id"), col("bal"), col("_change_type"))
      .as[(Long, Long, Double, String)].collect().toSet
    // the 10→99→10 round trip that the NET diff collapses (see the
    // net-diff test above) is fully visible per commit, with pre-images
    assert(got === Set(
      (2L, 1L, 10.0, "update_preimage"), (2L, 1L, 99.0, "update_postimage"),
      (3L, 1L, 99.0, "update_preimage"), (3L, 1L, 10.0, "update_postimage")))
  }

  test("changes across a schema-evolution boundary: appended column diffs as update") {
    val path = tmpDir("chg-evolve") + "/t"
    ParquetTable.create(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"), path) // v1
    // v2 evolves: id=2's only change is the NEW column gaining a value
    ParquetTable.merge(spark, path,
      Seq((2L, 20.0, "gold"), (3L, 30.0, "silver")).toDF("id", "bal", "tier"),
      Seq("id"), evolveSchema = true)
    val got = ParquetTable.changes(spark, path, 1L, 2L, Seq("id"))
      .select(col("id"), col("bal"), col("tier"), col("_change_type"))
      .as[(Long, Double, Option[String], String)].collect().toSet
    assert(got === Set(
      (2L, 20.0, Some("gold"), "update"),   // visible ONLY via the new column
      (3L, 30.0, Some("silver"), "insert")))
    // the per-commit feed's snapshot-diff fallback crosses the boundary too
    val fed = ParquetTable.tableChanges(spark, path, 2L, 2L, Seq("id"))
      .select(col("id"), col("tier"), col("_change_type"))
      .as[(Long, Option[String], String)].collect().toSet
    assert(fed === Set(
      (2L, None, "update_preimage"), (2L, Some("gold"), "update_postimage"),
      (3L, Some("silver"), "insert")))
    // reversed direction (wide → narrow) must not crash either
    assert(ParquetTable.changes(spark, path, 2L, 1L, Seq("id"))
      .filter(col("_change_type") === "delete").count() === 1L)
  }

  test("tableChanges falls back to snapshot diffs (incl. deletes) without manifests") {
    val path = tmpDir("cdf-fallback") + "/t"
    ParquetTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), path) // v1
    // v2 is a full replace (no cdf capture): delete 2, update 1, insert 3
    ParquetTable.create(Seq((1L, "A"), (3L, "c")).toDF("id", "name"), path)
    assert(changeManifestDirs(path).isEmpty)
    val got = ParquetTable.tableChanges(spark, path, 1L, 2L, Seq("id"))
      .select(col("_commit_version"), col("id"), col("name"), col("_change_type"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(got === Set(
      (1L, 1L, "a", "insert"), (1L, 2L, "b", "insert"), // initial commit
      (2L, 1L, "a", "update_preimage"), (2L, 1L, "A", "update_postimage"),
      (2L, 2L, "b", "delete"), (2L, 3L, "c", "insert")))
  }

  test("partitioned mergeVersioned captures per-commit inserts and updates") {
    val path = tmpDir("cdf-part") + "/t"
    ParquetTable.createVersioned(
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0)).toDF("id", "day", "v"),
      path, Seq("day")) // v1
    ParquetTable.mergeVersioned(spark, path,
      Seq((2L, "2024-01-02", 20.0), (3L, "2024-01-02", 3.0)).toDF("id", "day", "v"),
      Seq("id"), Seq("day"), cdf = true) // v2
    assert(changeManifestDirs(path) === Seq("v00000000000000000002"))
    val got = ParquetTable.tableChanges(spark, path, 2L, 2L, Seq("id"))
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, Double, String)].collect().toSet
    assert(got === Set(
      (2L, 2.0, "update_preimage"), (2L, 20.0, "update_postimage"),
      (3L, 3.0, "insert")))
  }

  test("cdf capture on a plain (unversioned) partitioned layout fails fast") {
    val path = tmpDir("cdf-plain") + "/t"
    ParquetTable.create(Seq((1L, "2024-01-01", 1.0)).toDF("id", "day", "v"),
      path, Seq("day"))
    val e = intercept[IllegalArgumentException] {
      ParquetTable.merge(spark, path,
        Seq((1L, "2024-01-01", 9.0)).toDF("id", "day", "v"),
        Seq("id"), Seq("day"), cdf = true)
    }
    assert(e.getMessage.contains("versioned"))
  }

  test("captured change feed outlives vacuumed snapshots") {
    val path = tmpDir("cdf-vacuum") + "/t"
    ParquetTable.create(Seq((1L, 10.0)).toDF("id", "bal"), path) // v1
    ParquetTable.merge(spark, path, Seq((1L, 11.0)).toDF("id", "bal"),
      Seq("id"), cdf = true) // v2
    ParquetTable.merge(spark, path, Seq((2L, 22.0)).toDF("id", "bal"),
      Seq("id"), cdf = true) // v3
    ParquetTable.vacuum(spark, path, keepLast = 1)
    // v1/v2 snapshots are gone; the captured manifests still serve the feed
    val got = ParquetTable.tableChanges(spark, path, 2L, 3L, Seq("id"))
      .select(col("_commit_version"), col("id"), col("_change_type"))
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set(
      (2L, 1L, "update_preimage"), (2L, 1L, "update_postimage"),
      (3L, 2L, "insert")))
    // but v1 (no manifest, snapshot vacuumed) names its gap honestly
    val e = intercept[IllegalStateException] {
      ParquetTable.tableChanges(spark, path, 1L, 3L, Seq("id")).collect()
    }
    assert(e.getMessage.contains("commit 1"))
  }
}
