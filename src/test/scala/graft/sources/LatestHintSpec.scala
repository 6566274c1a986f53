package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `_latest` version hint (Delta `_last_checkpoint` shape): snapshot
  * resolution probes forward from a hinted floor instead of listing the
  * manifest dir. The hint is ADVISORY — every stale/corrupt/missing shape
  * must still resolve the true latest version, because correctness rides
  * the CAS-committed manifests alone.
  */
class LatestHintSpec extends SparkSpec {
  import spark.implicits._

  private def hintPath(table: String) =
    Paths.get(table, "_graft_manifest", "_latest")

  private def mkTable(): String = {
    val path = tmpDir("latesthint") + "/t"
    ParquetTable.create(Seq((1L, "a")).toDF("id", "v"), path)
    ParquetTable.merge(spark, path, Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    ParquetTable.merge(spark, path, Seq((3L, "c")).toDF("id", "v"), Seq("id"))
    path
  }

  test("every commit advances the hint to the committed version") {
    val path = mkTable()
    assert(ParquetTable.currentVersion(spark, path) === Some(3L))
    assert(new String(Files.readAllBytes(hintPath(path)), "UTF-8") === "3")
  }

  test("stale hint is a lower bound: forward probe still finds the latest") {
    val path = mkTable()
    Files.write(hintPath(path), "1".getBytes("UTF-8"))
    assert(ParquetTable.currentVersion(spark, path) === Some(3L))
    // and reads resolve the latest image through the stale hint
    assert(ParquetTable.read(spark, path).count() === 3L)
  }

  test("corrupt, empty and missing hints fall back to the listing") {
    val path = mkTable()
    Files.write(hintPath(path), "not-a-number".getBytes("UTF-8"))
    assert(ParquetTable.currentVersion(spark, path) === Some(3L))
    Files.write(hintPath(path), Array.emptyByteArray)
    assert(ParquetTable.currentVersion(spark, path) === Some(3L))
    Files.delete(hintPath(path))
    assert(ParquetTable.currentVersion(spark, path) === Some(3L))
  }

  test("hint pointing at a nonexistent version falls back to the listing") {
    val path = mkTable()
    // simulates a hinted version vacuumed away (or a torn-but-numeric hint)
    Files.write(hintPath(path), "99".getBytes("UTF-8"))
    assert(ParquetTable.currentVersion(spark, path) === Some(3L))
  }

  test("the hint never masks a concurrent commit: CAS loop lands v+1 of the TRUE latest") {
    val path = mkTable()
    // poison the hint low, then merge: the commit loop must still CAS
    // past v3 (a hint-trusting writer would try v2 and livelock)
    Files.write(hintPath(path), "1".getBytes("UTF-8"))
    ParquetTable.merge(spark, path, Seq((4L, "d")).toDF("id", "v"), Seq("id"))
    assert(ParquetTable.currentVersion(spark, path) === Some(4L))
    assert(ParquetTable.read(spark, path).count() === 4L)
  }
}
