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

  test("a NULL deleteWhen predicate is an upsert, not a hidden tombstone") {
    val path = tmpDir("ac-null") + "/t"
    // op is null for id=1: col("op") === "D" evaluates NULL, which must
    // coalesce to NOT-a-delete — the row stays visible
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "a", 1L, null.asInstanceOf[String]), (2L, "b", 1L, "D"))
        .toDF("id", "v", "seq", "op"),
      Seq("id"), "seq", deleteWhen = Some(col("op") === "D"))
    val visible = ApplyChanges.readApplied(spark, path)
      .select("id").as[Long].collect().toSet
    assert(visible === Set(1L))
  }

  // ---- SCD type 2 ----------------------------------------------------------

  private def scd2(path: String): Seq[(Long, Long, Option[Long], String, Boolean)] =
    ApplyChanges.readScd2(spark, path)
      .select(col("id"), col(ApplyChanges.StartCol), col(ApplyChanges.EndCol),
        col("v"), col("is_current"))
      .as[(Long, Long, Option[Long], String, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("scd2: intervals chain per key, tombstones close them, re-insert reopens") {
    val path = tmpDir("ac2") + "/t"
    ApplyChanges.applyIntoScd2(spark, path,
      Seq((1L, "a1", 1L, false), (1L, "a2", 3L, false), (2L, "b1", 2L, false))
        .toDF("id", "v", "seq", "del"),
      Seq("id"), "seq", deleteWhen = Some(col("del")))
    assert(scd2(path) === Seq(
      (1L, 1L, Some(3L), "a1", false),
      (1L, 3L, None, "a2", true),
      (2L, 2L, None, "b1", true)))

    // tombstone for 1 at seq 5 closes the open interval; re-insert at 8
    ApplyChanges.applyIntoScd2(spark, path,
      Seq((1L, "x", 5L, true), (1L, "a3", 8L, false))
        .toDF("id", "v", "seq", "del"),
      Seq("id"), "seq", deleteWhen = Some(col("del")))
    assert(scd2(path) === Seq(
      (1L, 1L, Some(3L), "a1", false),
      (1L, 3L, Some(5L), "a2", false), // closed BY the hidden tombstone
      (1L, 8L, None, "a3", true),      // re-opened
      (2L, 2L, None, "b1", true)))
  }

  test("scd2: any arrival order converges to the identical history; redelivery is a no-op") {
    val b1 = Seq((1L, "v1", 1L, false)).toDF("id", "v", "seq", "del")
    val b2 = Seq((1L, "v2", 5L, false), (2L, "w1", 2L, false))
      .toDF("id", "v", "seq", "del")
    val b3 = Seq((1L, "mid", 3L, false), (2L, "gone", 6L, true))
      .toDF("id", "v", "seq", "del")
    val perms = Seq(Seq(b1, b2, b3), Seq(b3, b2, b1), Seq(b2, b3, b1))
    val states = perms.zipWithIndex.map { case (order, i) =>
      val p = tmpDir(s"ac2-ord$i") + "/t"
      order.foreach(b => ApplyChanges.applyIntoScd2(spark, p, b,
        Seq("id"), "seq", Some(col("del"))))
      scd2(p)
    }
    // the late arrival (seq 3) SPLIT the 1→5 interval in every order
    assert(states.head === Seq(
      (1L, 1L, Some(3L), "v1", false),
      (1L, 3L, Some(5L), "mid", false),
      (1L, 5L, None, "v2", true),
      (2L, 2L, Some(6L), "w1", false)))
    assert(states.distinct.size === 1, "arrival order changed the history")
    // redelivery: target wins, history unchanged
    val p0 = tmpDir("ac2-redeliver") + "/t"
    Seq(b1, b2, b3, b2, b1).foreach(b => ApplyChanges.applyIntoScd2(
      spark, p0, b, Seq("id"), "seq", Some(col("del"))))
    assert(scd2(p0) === states.head)
  }

  test("scd2: duplicate (key, sequence) in a batch fails fast") {
    val e = intercept[IllegalArgumentException] {
      ApplyChanges.applyIntoScd2(spark, tmpDir("ac2-dup") + "/t",
        Seq((1L, "x", 1L, false), (1L, "y", 1L, false))
          .toDF("id", "v", "seq", "del"),
        Seq("id"), "seq", Some(col("del")))
    }
    assert(e.getMessage.contains("duplicate (key, sequence)"))
  }

  test("scd2 targets stay real lakehouse tables: versioned and fsck-clean") {
    val path = tmpDir("ac2-tt") + "/t"
    ApplyChanges.applyIntoScd2(spark, path,
      Seq((1L, "a1", 1L)).toDF("id", "v", "seq"), Seq("id"), "seq", None)
    ApplyChanges.applyIntoScd2(spark, path,
      Seq((1L, "a2", 2L)).toDF("id", "v", "seq"), Seq("id"), "seq", None)
    // v1 had one open interval; current has the chained history
    assert(ParquetTable.readAt(spark, path, 1L).count() === 1L)
    assert(ParquetTable.read(spark, path).count() === 2L)
    assert(ParquetTable.fsck(spark, path).isEmpty)
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

  test("schema evolution: a widened change batch evolves the target; narrow batches null-fill") {
    val path = tmpDir("ac-evo") + "/t"
    // create with the narrow schema
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "a1", 1L), (2L, "b1", 1L)).toDF("id", "v", "seq"),
      Seq("id"), "seq", None)
    // strict mode still refuses a widened batch
    val e = intercept[IllegalArgumentException] {
      ApplyChanges.applyInto(spark, path,
        Seq((1L, "a2", 2L, "web")).toDF("id", "v", "seq", "src"),
        Seq("id"), "seq", None)
    }
    assert(e.getMessage.contains("evolveSchema"))
    // evolved apply: key 1 gains src="web"; untouched key 2 reads NULL
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "a2", 2L, "web")).toDF("id", "v", "seq", "src"),
      Seq("id"), "seq", None, evolveSchema = true)
    val got = ApplyChanges.readApplied(spark, path)
      .select("id", "v", "src").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toMap2
    assert(got === Map(1L -> ("a2", Some("web")), 2L -> ("b1", None)))
    // a NARROW batch after evolution: omitted column observes NULL when
    // it wins, stays put when it loses
    ApplyChanges.applyInto(spark, path,
      Seq((1L, "a1late", 1L), (2L, "b2", 3L)).toDF("id", "v", "seq"),
      Seq("id"), "seq", None, evolveSchema = true)
    val got2 = ApplyChanges.readApplied(spark, path)
      .select("id", "v", "src").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toMap2
    assert(got2 === Map(1L -> ("a2", Some("web")), 2L -> ("b2", None)))
  }

  test("scd2 schema evolution: history refolds across the widened schema, out of order") {
    val path = tmpDir("ac2-evo") + "/t"
    ApplyChanges.applyIntoScd2(spark, path,
      Seq((1L, "v2", 5L)).toDF("id", "v", "seq"), Seq("id"), "seq", None)
    // widened LATE batch splits the interval; its new column rides along
    ApplyChanges.applyIntoScd2(spark, path,
      Seq((1L, "v1", 1L, "imp"), (1L, "mid", 3L, "api"))
        .toDF("id", "v", "seq", "src"),
      Seq("id"), "seq", None, evolveSchema = true)
    val hist = ApplyChanges.readScd2(spark, path)
      .select(col("id"), col(ApplyChanges.StartCol), col(ApplyChanges.EndCol),
        col("v"), col("src"))
      .collect().map(r => (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getString(3),
        Option(r.getString(4)))).sortBy(_._1).toSeq
    assert(hist === Seq(
      (1L, Some(3L), "v1", Some("imp")),
      (3L, Some(5L), "mid", Some("api")),
      (5L, None, "v2", None))) // pre-evolution observation reads NULL
  }

  private implicit class MapOps(rows: Array[(Long, String, Option[String])]) {
    def toMap2: Map[Long, (String, Option[String])] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
