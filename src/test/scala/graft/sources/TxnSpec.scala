package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Idempotent writes via #txn= commit markers (Delta txnAppId/txnVersion):
  * replay skipping, watermark monotonicity, partitioned tables, the
  * in-commit-loop re-check, and vacuum interaction.
  */
class TxnSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("day", StringType, nullable = true)))

  private def df(rows: Row*) = frame(schema, rows)

  test("replaying a txn batch is a no-op, even with different data") {
    val path = tmpDir("txn-replay") + "/t"
    ParquetTable.merge(spark, path, df(Row(1, "a", "d1")), Seq("id"),
      txn = Some("app" -> 1L)) // initial load records the marker too
    assert(ParquetTable.lastTxnVersion(spark, path, "app") === Some(1L))
    // exact replay: skipped
    ParquetTable.merge(spark, path, df(Row(1, "REPLAY", "d1")), Seq("id"),
      txn = Some("app" -> 1L))
    assert(ParquetTable.read(spark, path).select("v").head().getString(0) === "a")
    assert(ParquetTable.currentVersion(spark, path) === Some(1L))
    // stale (lower) txn version: also skipped
    ParquetTable.merge(spark, path, df(Row(9, "x", "d1")), Seq("id"),
      txn = Some("app" -> 0L))
    assert(ParquetTable.currentVersion(spark, path) === Some(1L))
    // the next batch applies and advances the watermark
    ParquetTable.merge(spark, path, df(Row(2, "b", "d1")), Seq("id"),
      txn = Some("app" -> 2L))
    assert(ParquetTable.read(spark, path).count() === 2L)
    assert(ParquetTable.lastTxnVersion(spark, path, "app") === Some(2L))
  }

  test("apps have independent watermarks; untracked merges don't disturb them") {
    val path = tmpDir("txn-apps") + "/t"
    ParquetTable.merge(spark, path, df(Row(1, "a", "d1")), Seq("id"),
      txn = Some("appA" -> 5L))
    ParquetTable.merge(spark, path, df(Row(2, "b", "d1")), Seq("id")) // no txn
    ParquetTable.merge(spark, path, df(Row(3, "c", "d1")), Seq("id"),
      txn = Some("appB" -> 1L))
    assert(ParquetTable.lastTxnVersion(spark, path, "appA") === Some(5L))
    assert(ParquetTable.lastTxnVersion(spark, path, "appB") === Some(1L))
    assert(ParquetTable.lastTxnVersion(spark, path, "appC") === None)
    // appA batch 5 replay still skipped three commits later
    ParquetTable.merge(spark, path, df(Row(1, "REPLAY", "d1")), Seq("id"),
      txn = Some("appA" -> 5L))
    assert(ParquetTable.read(spark, path).select("v")
      .filter("id = 1").head().getString(0) === "a")
  }

  test("partitioned versioned merges honor txn markers") {
    val path = tmpDir("txn-part") + "/t"
    ParquetTable.createVersioned(df(Row(1, "a", "d1"), Row(2, "b", "d2")),
      path, Seq("day"))
    ParquetTable.mergeVersioned(spark, path, df(Row(2, "B", "d2")), Seq("id"),
      Seq("day"), txn = Some("s" -> 1L))
    assert(ParquetTable.read(spark, path).filter("id = 2")
      .select("v").head().getString(0) === "B")
    ParquetTable.mergeVersioned(spark, path, df(Row(2, "REPLAY", "d2")), Seq("id"),
      Seq("day"), txn = Some("s" -> 1L))
    assert(ParquetTable.read(spark, path).filter("id = 2")
      .select("v").head().getString(0) === "B")
    assert(ParquetTable.currentVersion(spark, path) === Some(2L))
  }

  test("atomicReplace detects an applied txn inside the commit loop and cleans up") {
    val path = tmpDir("txn-race") + "/t"
    ParquetTable.merge(spark, path, df(Row(1, "a", "d1")), Seq("id"),
      txn = Some("app" -> 7L))
    // a racer that somehow reached atomicReplace with an applied txn:
    // nothing commits, the orphan dir is reclaimed, -1 signals the skip
    val r = ParquetTable.atomicReplace(spark, path,
      df(Row(1, "LOSER", "d1")), Nil, Some("app" -> 7L))
    assert(r === -1L)
    assert(ParquetTable.currentVersion(spark, path) === Some(1L))
    val dirs = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("_d"))
    assert(dirs.length === 1) // only v1's data dir remains
  }

  test("invalid appIds are rejected before any work") {
    val path = tmpDir("txn-appid") + "/t"
    intercept[IllegalArgumentException] {
      ParquetTable.merge(spark, path, df(Row(1, "a", "d1")), Seq("id"),
        txn = Some("bad:app" -> 1L))
    }
  }
}
