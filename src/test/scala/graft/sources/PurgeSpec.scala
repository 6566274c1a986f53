package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The GDPR purge verb: erased means erased — not "absent from the
  * current snapshot". Every test verifies against the BYTES (raw reads
  * of whatever parquet survives under the table dir), because that is
  * the promise the verb makes.
  */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  /** Every id readable from ANY surviving data file, bypassing the
    * manifest AND deletion vectors — the attacker's view of the dir.
    */
  private def rawIds(path: String): Set[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new Path(path)).filter(st =>
      st.isDirectory && (st.getPath.getName.startsWith("_d") ||
        st.getPath.getName.startsWith("_v"))).map(_.getPath.toString)
    if (dirs.isEmpty) Set.empty
    else dirs.map(d => spark.read.parquet(d).select("id").as[Long]
      .collect().toSet).reduce(_ ++ _)
  }

  test("purge erases rows from the current image, history, and the bytes") {
    val path = tmpDir("purge") + "/t"
    ParquetTable.create((1L to 20L).map(i => (i, s"u$i")).toDF("id", "v"), path)
    ParquetTable.merge(spark, path, Seq((21L, "u21")).toDF("id", "v"), Seq("id"))
    assert(ParquetTable.versions(spark, path).length === 2)
    val n = ParquetTable.purge(spark, path, col("id") % 5 === 0)
    assert(n === 4L) // 5, 10, 15, 20
    assert(ParquetTable.read(spark, path).count() === 17L)
    // history is gone: only post-purge versions remain, none match
    ParquetTable.versions(spark, path).foreach { v =>
      assert(ParquetTable.readAt(spark, path, v)
        .filter(col("id") % 5 === 0).count() === 0L, s"version $v")
    }
    // and the surviving BYTES contain no purged id
    assert(rawIds(path).intersect(Set(5L, 10L, 15L, 20L)) === Set.empty)
    assert(ParquetTable.fsck(spark, path).isEmpty)
  }

  test("purge materializes DVs: bytes of previously-DV-deleted matching rows leave too") {
    val path = tmpDir("purge-dv") + "/t"
    ParquetTable.create((1L to 60L).map(i => (i, s"u$i")).toDF("id", "v"), path)
    // DV-delete id 7: masked, but its bytes still sit in the data file
    ParquetTable.deleteVectors(spark, path, col("id") === 7L)
    assert(rawIds(path).contains(7L), "precondition: DV leaves bytes behind")
    // purge a condition COVERING id 7 (it is not live, but its bytes match)
    val n = ParquetTable.purge(spark, path, col("id") <= 10L)
    assert(n === 9L) // 1..10 minus the already-masked 7
    assert(ParquetTable.read(spark, path).count() === 50L)
    assert(rawIds(path).intersect((1L to 10L).toSet) === Set.empty,
      "DV-masked bytes must not survive a covering purge")
  }

  test("partitioned table: purge is partition-scoped + verified") {
    val path = tmpDir("purge-part") + "/t"
    ParquetTable.createVersioned(
      (1L to 30L).map(i => (i, s"d${i % 3}")).toDF("id", "day"), path, Seq("day"))
    val n = ParquetTable.purge(spark, path, col("id") === 9L)
    assert(n === 1L)
    assert(ParquetTable.read(spark, path).count() === 29L)
    assert(!rawIds(path).contains(9L))
    assert(ParquetTable.fsck(spark, path).isEmpty)
  }

  test("a change feed blocks purge unless explicitly surrendered") {
    val path = tmpDir("purge-cdf") + "/t"
    ParquetTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    ParquetTable.merge(spark, path, Seq((3L, "c")).toDF("id", "v"), Seq("id"),
      cdf = true)
    val e = intercept[IllegalArgumentException] {
      ParquetTable.purge(spark, path, col("id") === 1L)
    }
    assert(e.getMessage.contains("change feed"))
    // explicit surrender: purge succeeds and the feed dir is gone
    ParquetTable.purge(spark, path, col("id") === 1L, dropChangeFeed = true)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(path, "_graft_changes")))
    assert(!rawIds(path).contains(1L))
  }

  test("purge refuses a shallow clone: the source's bytes are unreachable (review fix)") {
    val dir = tmpDir("purge-clone")
    val src = s"$dir/src"; val clone = s"$dir/clone"
    ParquetTable.create(Seq((1L, "pii"), (2L, "ok")).toDF("id", "v"), src)
    ParquetTable.shallowClone(spark, src, clone)
    val e = intercept[IllegalArgumentException] {
      ParquetTable.purge(spark, clone, col("id") === 1L)
    }
    assert(e.getMessage.contains("shallow clone"))
    // the bytes in the SOURCE are indeed still there — the refusal is honest
    assert(rawIds(src).contains(1L))
    // compacting the clone localizes its data; purge then succeeds
    ParquetTable.compact(spark, clone)
    assert(ParquetTable.purge(spark, clone, col("id") === 1L) === 1L)
    assert(!rawIds(clone).contains(1L))
  }

  test("purge of a no-match condition erases nothing but still truncates history") {
    val path = tmpDir("purge-nomatch") + "/t"
    ParquetTable.create(Seq((1L, "a")).toDF("id", "v"), path)
    ParquetTable.merge(spark, path, Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    assert(ParquetTable.purge(spark, path, col("id") === 99L) === 0L)
    assert(ParquetTable.versions(spark, path).length === 1)
    assert(ParquetTable.read(spark, path).count() === 2L)
  }

  test("purge through an active column mapping: logical condition, physical erasure") {
    val path = tmpDir("purge-colmap") + "/t"
    ParquetTable.createVersioned(
      Seq((1L, "keep", "d1"), (2L, "secret", "d1"), (3L, "keep", "d2"))
        .toDF("id", "v", "day"), path, Seq("day"))
    ParquetTable.renameColumn(spark, path, "v", "payload")
    // the condition names the LOGICAL column; the bytes carry the
    // physical one — purge must erase them anyway
    assert(ParquetTable.purge(spark, path, col("payload") === "secret") === 1L)
    assert(!rawIds(path).contains(2L), "purged row's bytes survive on disk")
    assert(ParquetTable.read(spark, path).count() === 2L)
    // the verification pass ran against every surviving version's
    // logical view — and the mapping itself survives the purge
    val vNow = ParquetTable.currentVersion(spark, path).get
    assert(ParquetTable.columnMapping(spark, path, vNow)._1 === Map("v" -> "payload"))
  }
}
