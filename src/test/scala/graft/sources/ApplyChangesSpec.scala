package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** APPLY CHANGES INTO: out-of-order CDC application must converge to
  * the same state under ANY batch arrival order, skip late/redelivered
  * rows per-key, honor tombstones (which must keep the watermark — a
  * late arrival can never resurrect a deleted key), and refuse the
  * undefined cases (duplicate sequence, partition-moving keys) rather
  * than pick an accidental winner.
  */
class ApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  private def state(path: String): Map[Long, (String, Long)] =
    ApplyChanges.readApplied(spark, path)
      .select("id", "v", "seq").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("create-then-upsert-then-delete: latest change per key wins") {
    val path = tmpDir("ac") + "/t"
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "a1", 1L, false), (2L, "b1", 1L, false))
        .toDF("id", "v", "seq", "del"),
      Seq("id"), "seq", deleteWhen = Some(col("del")))
    assert(state(path) === Map(1L -> (("a1", 1L)), 2L -> (("b1", 1L))))

    // one batch holding: update for 1 (two changes, latest wins),
    // tombstone for 2, insert for 3, tombstone for never-seen 9
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "a2", 2L, false), (1L, "a3", 3L, false),
        (2L, "b2", 2L, true), (3L, "c1", 2L, false),
        (9L, "z", 2L, true))
        .toDF("id", "v", "seq", "del"),
      Seq("id"), "seq", deleteWhen = Some(col("del")))
    assert(state(path) === Map(1L -> (("a3", 3L)), 3L -> (("c1", 2L))))
    // tombstones are STORED (watermark), just not visible
    assert(ParquetTable.read(spark, path)
      .filter(col(ApplyChanges.TombstoneCol))
      .select("id").as[Long].collect().toSet === Set(2L, 9L))
  }

  test("batches converge regardless of arrival order; equal seq is an idempotent no-op") {
    val b1 = Seq((1L, "old", 1L, false)).toDF("id", "v", "seq", "del")
    val b2 = Seq((1L, "new", 5L, false)).toDF("id", "v", "seq", "del")
    val ordered = tmpDir("ac-ord") + "/t"
    val reversed = tmpDir("ac-rev") + "/t"
    Seq(b1, b2).foreach(b => ApplyChanges.applyInto(spark, ordered, b,
      Seq("id"), "seq", Some(col("del"))))
    Seq(b2, b1).foreach(b => ApplyChanges.applyInto(spark, reversed, b,
      Seq("id"), "seq", Some(col("del"))))
    assert(state(ordered) === Map(1L -> (("new", 5L))))
    assert(state(reversed) === state(ordered))
    // redelivery of b2: equal sequence -> stored row kept
    ApplyChanges.applyInto(spark, ordered, b2, Seq("id"), "seq", Some(col("del")))
    assert(state(ordered) === Map(1L -> (("new", 5L))))
  }

  test("a late tombstone does NOT delete a newer row; a late change does NOT resurrect a deleted key") {
    val path = tmpDir("ac-late") + "/t"
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "live", 10L, false), (2L, "gone", 20L, true))
        .toDF("id", "v", "seq", "del"),
      Seq("id"), "seq", Some(col("del")))
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "stale", 4L, true), (2L, "zombie", 15L, false))
        .toDF("id", "v", "seq", "del"),
      Seq("id"), "seq", Some(col("del")))
    assert(state(path) === Map(1L -> (("live", 10L))))
  }

  test("duplicate (key, sequence) fails fast naming the offender") {
    val path = tmpDir("ac-dup") + "/t"
    val e = intercept[IllegalArgumentException] {
      ApplyChanges.applyInto(spark, path,
        Seq((1L, "x", 1L, false), (1L, "y", 1L, false))
          .toDF("id", "v", "seq", "del"),
        Seq("id"), "seq", Some(col("del")))
    }
    assert(e.getMessage.contains("duplicate (key, sequence)"))
  }

  test("partitioned targets work when partitions are key-stable, refuse otherwise") {
    val path = tmpDir("ac-part") + "/t"
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "d1", "a1", 1L), (2L, "d2", "b1", 1L))
        .toDF("id", "day", "v", "seq"),
      Seq("id", "day"), "seq", None, partitionColumns = Seq("day"))
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "d1", "a2", 2L)).toDF("id", "day", "v", "seq"),
      Seq("id", "day"), "seq", None, partitionColumns = Seq("day"))
    val got = ApplyChanges.readApplied(spark, path)
      .select("id", "day", "v").as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "d1", "a2"), (2L, "d2", "b1")))

    val e = intercept[IllegalArgumentException] {
      ApplyChanges.applyInto(spark, path,
        Seq((1L, "d1", "a3", 3L)).toDF("id", "day", "v", "seq"),
        Seq("id"), "seq", None, partitionColumns = Seq("day"))
    }
    assert(e.getMessage.contains("partition columns within the keys"))
  }

  test("applied tables stay real lakehouse tables: versioned, time-travelable, fsck-clean") {
    val path = tmpDir("ac-tt") + "/t"
    val b1 = Seq((1L, "a1", 1L)).toDF("id", "v", "seq")
    val b2 = Seq((1L, "a2", 2L)).toDF("id", "v", "seq")
    ApplyChanges.applyInto(spark, path, b1, Seq("id"), "seq", None)
    ApplyChanges.applyInto(spark, path, b2, Seq("id"), "seq", None)
    assert(ParquetTable.readAt(spark, path, 1L)
      .select("v").as[String].head() == "a1")
    assert(ParquetTable.fsck(spark, path).isEmpty)
  }
}
