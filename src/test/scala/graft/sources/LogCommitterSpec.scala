package graft.sources

import java.util.concurrent.{Callable, CyclicBarrier, Executors, TimeUnit}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Proof of the [[LogCommitter]] exclusivity contract: of N concurrent
  * committers of one target, exactly one returns true and its full content
  * is what readers see. RenameCommitter cannot give this on local FS
  * (POSIX rename replaces — see its scaladoc); the hard-link CAS can, and
  * is what [[DefaultCommitter]] routes `file:` deployments through.
  */
class LogCommitterSpec extends SparkSpec {

  private def localFs(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  test("HardLinkCasCommitter: N racing writers at one version, exactly one wins") {
    val dir = tmpDir("cas-race")
    val n = 8
    val pool = Executors.newFixedThreadPool(n)
    try {
      // many rounds so a genuine in-kernel race is actually exercised
      for (round <- 0 until 25) {
        val target = new Path(s"$dir/_graft_manifest", f"v$round%020d")
        val fs = localFs(target)
        val barrier = new CyclicBarrier(n)
        val results = (0 until n).map { i =>
          pool.submit(new Callable[(Int, Boolean)] {
            override def call(): (Int, Boolean) = {
              barrier.await(10, TimeUnit.SECONDS)
              (i, HardLinkCasCommitter.commit(fs, target, s"writer-$i".getBytes("UTF-8")))
            }
          })
        }.map(_.get(30, TimeUnit.SECONDS))
        val winners = results.filter(_._2)
        assert(winners.size === 1, s"round $round: ${winners.size} committers won")
        val content = new String(
          java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(target.toUri.getPath)), "UTF-8")
        assert(content === s"writer-${winners.head._1}",
          s"round $round: published content is not the winner's")
        // losers' temp files are cleaned up: only manifests remain
        val leftovers = fs.listStatus(target.getParent).map(_.getPath.getName)
          .filterNot(_.matches("v\\d+"))
        assert(leftovers.isEmpty, s"round $round: stray files ${leftovers.mkString(",")}")
      }
    } finally pool.shutdown()
  }

  test("HardLinkCasCommitter: second commit of the same version is rejected, first content kept") {
    val dir = tmpDir("cas-twice")
    val target = new Path(s"$dir/m", "v00000000000000000001")
    val fs = localFs(target)
    assert(HardLinkCasCommitter.commit(fs, target, "first".getBytes))
    assert(!HardLinkCasCommitter.commit(fs, target, "second".getBytes))
    val content = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(target.toUri.getPath)), "UTF-8")
    assert(content === "first")
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  test("versioned table ops run correctly with the CAS committer swapped in") {
    val path = tmpDir("cas-table") + "/t"
    val prev = ParquetTable.logCommitter
    ParquetTable.logCommitter = HardLinkCasCommitter
    try {
      ParquetTable.create(frame(schema, Seq(Row(1, "a"), Row(2, "b"))), path) // v1
      ParquetTable.merge(spark, path,
        frame(schema, Seq(Row(2, "B"), Row(3, "c"))), Seq("id")) // v2
      assert(ParquetTable.versions(spark, path) === Seq(1L, 2L))
      assert(ParquetTable.read(spark, path).collect().map(r => r.getInt(0) -> r.getString(1))
        .toMap === Map(1 -> "a", 2 -> "B", 3 -> "c"))
      assert(ParquetTable.readAt(spark, path, 1L).count() === 2)
    } finally ParquetTable.logCommitter = prev
  }

  test("concurrent mergeVersioned to DISJOINT partitions: both land, no lost update") {
    // the scaladoc claim under real exclusivity: the loser re-reads the
    // winner's manifest and retries, so BOTH partition updates survive
    val pschema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType),
      StructField("day", StringType)))
    val path = tmpDir("cas-disjoint") + "/t"
    ParquetTable.createVersioned(
      frame(pschema, Seq(Row(1, "a", "d1"), Row(2, "b", "d2"))), path, Seq("day"))
    val pool = Executors.newFixedThreadPool(2)
    try {
      val barrier = new CyclicBarrier(2)
      val futures = Seq(("d1", 1, "A1"), ("d2", 2, "B2")).map { case (day, id, v) =>
        pool.submit(new Callable[Unit] {
          override def call(): Unit = {
            barrier.await(10, TimeUnit.SECONDS)
            ParquetTable.mergeVersioned(spark, path,
              frame(pschema, Seq(Row(id, v, day))), Seq("id"), Seq("day"))
          }
        })
      }
      futures.foreach(_.get(120, TimeUnit.SECONDS))
      assert(ParquetTable.versions(spark, path) === Seq(1L, 2L, 3L))
      val got = ParquetTable.read(spark, path).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(got === Map(1 -> "A1", 2 -> "B2"), "a racing update was lost")
    } finally pool.shutdown()
  }

  test("concurrent atomicReplace writers both land, on distinct versions") {
    val path = tmpDir("cas-concurrent") + "/t"
    ParquetTable.create(frame(schema, Seq(Row(0, "seed"))), path) // v1
    val pool = Executors.newFixedThreadPool(2)
    try {
      val barrier = new CyclicBarrier(2)
      val futures = Seq("x", "y").map { tag =>
        pool.submit(new Callable[Unit] {
          override def call(): Unit = {
            barrier.await(10, TimeUnit.SECONDS)
            ParquetTable.atomicReplace(spark, path,
              frame(schema, Seq(Row(1, tag))), Nil)
          }
        })
      }
      futures.foreach(_.get(120, TimeUnit.SECONDS))
      // exactly one committer per version: three distinct versions exist and
      // the two replacement images each occupy exactly one of v2..vN
      val vs = ParquetTable.versions(spark, path)
      assert(vs.head === 1L && vs.size === 3, s"versions: $vs")
      val images = vs.drop(1).map { v =>
        ParquetTable.readAt(spark, path, v).collect().map(_.getString(1)).toSeq
      }
      assert(images.flatten.sorted === Seq("x", "y"))
    } finally pool.shutdown()
  }
}
