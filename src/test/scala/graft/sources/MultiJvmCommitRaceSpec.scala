package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The CAS claim, tested between PROCESSES: LogCommitterContractSpec and
  * ConcurrentMergeSpec race threads inside one JVM, but the hard-link
  * put-if-absent committer is a statement about SEPARATE writers —
  * separate JVMs, separate FileSystem instances, nothing shared but the
  * directory. This spec spawns two real `java -cp` workers
  * ([[graft.tools.CommitRace]]) released together by a start file, each
  * landing merges into one versioned table — half the ops contend on a
  * shared-partition row (recompute path), half are disjoint (rebase
  * path). Exactly-one-winner-per-version falls out of arithmetic: every
  * version file on disk is distinct by name, so IF both processes had
  * ever claimed the same version, the chain would end below
  * 1 + opsA + opsB.
  */
class MultiJvmCommitRaceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("p", StringType, nullable = false),
    StructField("v", StringType, nullable = false)))

  // build.sbt's jdk17AddOpens, needed by any child JVM creating a
  // SparkSession outside spark-submit
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawnWorker(
      path: String, id: Int, nOps: Int, mode: String): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(
      (Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
        "graft.tools.CommitRace", path, id.toString, nOps.toString,
        mode)): _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(new java.io.File(s"$path.worker$id.log"))
    pb.start()
  }

  private def awaitWorkers(path: String, p1: Process, p2: Process,
      nOps: Int): Unit = {
    java.nio.file.Files.createFile(java.nio.file.Paths.get(path + ".start"))
    assert(p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "worker 1 hung")
    assert(p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "worker 2 hung")
    def log(id: Int) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path.worker$id.log")), "UTF-8")
    assert(p1.exitValue() == 0, s"worker 1 failed:\n${log(1)}")
    assert(p2.exitValue() == 0, s"worker 2 failed:\n${log(2)}")
    assert(log(1).contains(s"RACE_OK worker=1 ops=$nOps"), log(1))
    assert(log(2).contains(s"RACE_OK worker=2 ops=$nOps"), log(2))
  }

  test("two JVMs racing atomicReplace: dense chain, every version untorn") {
    val path = tmpDir("mjvm-replace") + "/t"
    val nOps = 4
    ParquetTable.create(frame(schema, Seq(Row(0, "s", "seed"))), path) // v1
    val p1 = spawnWorker(path, 1, nOps, "replace")
    val p2 = spawnWorker(path, 2, nOps, "replace")
    awaitWorkers(path, p1, p2, nOps)

    // every replace landed on its own fresh version — a duplicate CAS
    // claim would shorten the chain
    assert(ParquetTable.currentVersion(spark, path) === Some(1L + 2 * nOps))
    // every version is EXACTLY one worker's one-row image, never a torn
    // mixture or a half-visible directory
    (2L to (1L + 2 * nOps)).foreach { v =>
      val rows = ParquetTable.readAt(spark, path, v).collect()
        .map(r => (r.getInt(r.fieldIndex("id")),
          r.getString(r.fieldIndex("v"))))
      assert(rows.length === 1, s"v$v has ${rows.length} rows")
      val (id, value) = rows.head
      assert(value.matches(s"w$id-[0-3]"), s"v$v: $rows")
    }
    // last-writer-wins: the final image is SOME worker's final op
    val fin = ParquetTable.read(spark, path).collect()
      .map(r => r.getString(r.fieldIndex("v")))
    assert(fin.length === 1 && fin.head.matches(s"w[12]-${nOps - 1}"), fin.toSeq)
  }

  test("two JVMs: maintenance (compact/OPTIMIZE) racing merges loses no committed row") {
    val path = tmpDir("mjvm-maint") + "/t"
    val nOps = 4
    ParquetTable.createVersioned(
      frame(schema, Seq(Row(1, "s", "seed"), Row(2, "s", "keep"))),
      path, Seq("p")) // v1

    // worker 1 lands merges; worker 2 alternates compact/OPTIMIZE — each
    // maintenance op derives a full image from the head it read, so a
    // merge committing under the rewrite must survive via the loser's
    // recompute (the lost-update this spec exists to refute: a stale
    // image republished onto a later version would erase merged rows)
    val p1 = spawnWorker(path, 1, nOps, "merge")
    val p2 = spawnWorker(path, 2, nOps, "maintain")
    awaitWorkers(path, p1, p2, nOps)

    // dense chain: nOps merge commits + nOps maintenance commits on v1 —
    // a maintenance retry that double-committed (or a lost CAS claimed
    // twice) would break the arithmetic
    assert(ParquetTable.currentVersion(spark, path) === Some(1L + 2 * nOps))
    val versions = ParquetTable.history(spark, path)
      .select("version").collect().map(_.getLong(0)).sorted.toSeq
    assert(versions === (1L to (1L + 2 * nOps)))

    // ZERO lost updates: every merged row is present with its final value
    // no matter how the rewrites interleaved. Worker 1 runs ops in order,
    // so the contested row's final value is its LAST even op.
    val rows = ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(r.fieldIndex("id")) -> r.getString(r.fieldIndex("v")))
      .toMap
    (0 until nOps).foreach(i => assert(rows(1000 + i) === s"w1-$i"))
    assert(rows(1) === s"w1-${((nOps - 1) / 2) * 2}")
    assert(rows(2) === "keep")
    assert(rows.size === 2 + nOps)

    // every intermediate version reads cleanly and no version ever has
    // fewer rows than the versions before it (a stale maintenance image
    // would dip the count by erasing merged rows)
    val counts = (1L to (1L + 2 * nOps)).map(v =>
      ParquetTable.readAt(spark, path, v).count())
    assert(counts.head === 2L)
    assert(counts.last === (2L + nOps))
    counts.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
  }

  test("two JVMs racing merges: every op lands, one winner per version") {
    val path = tmpDir("mjvm-race") + "/t"
    val nOps = 4
    ParquetTable.createVersioned(
      frame(schema, Seq(Row(1, "s", "seed"), Row(2, "s", "keep"))),
      path, Seq("p")) // v1

    val p1 = spawnWorker(path, 1, nOps, "merge")
    val p2 = spawnWorker(path, 2, nOps, "merge")
    awaitWorkers(path, p1, p2, nOps)

    // exactly one winner per version: 2·nOps commits on top of v1, a
    // DENSE chain (duplicate claims would shorten it; a torn CAS would
    // break a read below)
    assert(ParquetTable.currentVersion(spark, path) === Some(1L + 2 * nOps))
    val versions = ParquetTable.history(spark, path)
      .select("version").collect().map(_.getLong(0)).sorted.toSeq
    assert(versions === (1L to (1L + 2 * nOps)))

    // no lost updates: every worker's own-partition rows survive with
    // their final values, the contested row holds SOME worker's write,
    // and the untouched seed row is intact
    val rows = ParquetTable.read(spark, path).collect()
      .map(r => r.getInt(r.fieldIndex("id")) -> r.getString(r.fieldIndex("v")))
      .toMap
    (0 until nOps).foreach { i =>
      assert(rows(1000 + i) === s"w1-$i")
      assert(rows(2000 + i) === s"w2-$i")
    }
    assert(rows(1).matches("w[12]-[02]"), rows(1)) // even ops contend on id=1
    assert(rows(2) === "keep")
    assert(rows.size === 2 + 2 * nOps)

    // every intermediate version still reads cleanly (no torn manifest
    // anywhere in the trail), and row counts never decrease
    val counts = (1L to (1L + 2 * nOps)).map(v =>
      ParquetTable.readAt(spark, path, v).count())
    assert(counts.head === 2L)
    assert(counts.last === (2L + 2 * nOps))
    counts.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
  }
}
