package graft.sources

import java.util.concurrent.{Callable, ConcurrentHashMap, CyclicBarrier, Executors, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

import graft.SparkSpec

/** Reusable conformance battery for the [[LogCommitter]] contract
  * (atomic + exclusive put-if-absent), run over every committer the
  * library ships plus an in-memory conditional-PUT fake standing in for
  * an object store with `If-None-Match` semantics (S3, GCS, ABFS).
  *
  * Each fixture supplies commit + read through ITS medium; the battery is
  * committer-agnostic:
  *   1. N racing writers of one target → exactly one returns true, and
  *      the published bytes are the winner's, complete.
  *   2. A second commit of the same target is rejected and the first
  *      content is untouched.
  *   3. Readers polling DURING the race never observe partial content —
  *      every non-empty read is some writer's full payload.
  *
  * A real S3 committer is therefore "implement [[LogCommitter]] with a
  * conditional PUT, add a fixture here, pass the battery" — the same
  * drop-in seam the scaladoc on [[LogCommitter]] promises.
  */
class LogCommitterContractSpec extends SparkSpec {

  /** A committer under test plus how to read back what it published. */
  trait Fixture {
    def name: String
    /** A fresh, unique target for one race round. */
    def freshTarget(round: Int): Path
    def commit(target: Path, content: Array[Byte]): Boolean
    /** None when nothing is published yet; Some(full bytes) after. */
    def read(target: Path): Option[Array[Byte]]
  }

  /** The local-FS production committer, exercised end-to-end on disk. */
  private def hardLinkFixture: Fixture = new Fixture {
    private val dir = tmpDir("contract-cas")
    private val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val name = "HardLinkCasCommitter(local fs)"
    def freshTarget(round: Int) = new Path(s"$dir/_m", f"v$round%020d")
    def commit(t: Path, c: Array[Byte]) = HardLinkCasCommitter.commit(fs, t, c)
    def read(t: Path): Option[Array[Byte]] = {
      val p = java.nio.file.Paths.get(t.toUri.getPath)
      if (java.nio.file.Files.exists(p)) Some(java.nio.file.Files.readAllBytes(p))
      else None
    }
  }

  /** RenameCommitter is exclusive only where rename REFUSES an existing
    * destination (HDFS: the NameNode arbitrates). Local rename(2) replaces,
    * so to conformance-test the committer itself we run it on a local FS
    * whose rename is wrapped with HDFS semantics — one JVM-wide lock
    * standing in for the NameNode's single-writer metadata op.
    */
  private def renameOnNoReplaceFsFixture: Fixture = new Fixture {
    private val dir = tmpDir("contract-rename")
    private val fs: FileSystem = {
      val f = new RawLocalFileSystem {
        override def rename(src: Path, dst: Path): Boolean =
          LogCommitterContractSpec.renameLock.synchronized {
            if (exists(dst)) false else super.rename(src, dst)
          }
      }
      f.initialize(f.getUri, spark.sessionState.newHadoopConf())
      f
    }
    val name = "RenameCommitter(no-replace-rename fs)"
    def freshTarget(round: Int) = new Path(s"$dir/_m", f"v$round%020d")
    def commit(t: Path, c: Array[Byte]) = RenameCommitter.commit(fs, t, c)
    def read(t: Path): Option[Array[Byte]] = {
      val p = java.nio.file.Paths.get(t.toUri.getPath)
      if (java.nio.file.Files.exists(p)) Some(java.nio.file.Files.readAllBytes(p))
      else None
    }
  }

  /** What an object-store deployment implements: a conditional PUT
    * (`If-None-Match: *`). The store here is a ConcurrentHashMap whose
    * putIfAbsent IS the conditional PUT — all-or-nothing by construction,
    * exactly the atomicity S3/GCS/ABFS give a single PUT.
    */
  private def conditionalPutFixture: Fixture = new Fixture {
    private val store = new ConcurrentHashMap[String, Array[Byte]]()
    private val committer: LogCommitter = new LogCommitter {
      override def commit(fs: FileSystem, target: Path, content: Array[Byte]): Boolean =
        store.putIfAbsent(target.toString, content.clone()) == null
    }
    val name = "ConditionalPutCommitter(in-memory object store)"
    def freshTarget(round: Int) = new Path("graftstore://bucket/_m", f"v$round%020d")
    def commit(t: Path, c: Array[Byte]) = committer.commit(null, t, c)
    def read(t: Path): Option[Array[Byte]] = Option(store.get(t.toString))
  }

  private def fixtures = Seq(hardLinkFixture, renameOnNoReplaceFsFixture,
    conditionalPutFixture)

  for (fx <- fixtures) {
    test(s"${fx.name}: N racing writers, exactly one wins, full winner content") {
      val n = 8
      val pool = Executors.newFixedThreadPool(n)
      try {
        for (round <- 0 until 25) {
          val target = fx.freshTarget(round)
          val barrier = new CyclicBarrier(n)
          val results = (0 until n).map { i =>
            pool.submit(new Callable[(Int, Boolean)] {
              override def call(): (Int, Boolean) = {
                barrier.await(10, TimeUnit.SECONDS)
                (i, fx.commit(target, s"writer-$i-payload".getBytes("UTF-8")))
              }
            })
          }.map(_.get(30, TimeUnit.SECONDS))
          val winners = results.filter(_._2)
          assert(winners.size === 1, s"round $round: ${winners.size} committers won")
          val published = new String(fx.read(target).getOrElse(
            fail(s"round $round: nothing published")), "UTF-8")
          assert(published === s"writer-${winners.head._1}-payload",
            s"round $round: published content is not the winner's")
        }
      } finally pool.shutdown()
    }

    test(s"${fx.name}: second commit rejected, first content kept") {
      val target = fx.freshTarget(999)
      assert(fx.commit(target, "first".getBytes("UTF-8")))
      assert(!fx.commit(target, "second".getBytes("UTF-8")))
      assert(new String(fx.read(target).get, "UTF-8") === "first")
    }

    test(s"${fx.name}: racing readers never observe partial content") {
      val writers = 4
      val pool = Executors.newFixedThreadPool(writers + 1)
      try {
        for (round <- 0 until 10) {
          val target = fx.freshTarget(1000 + round)
          // payload big enough that a non-atomic publish WOULD be caught
          // mid-write by the polling reader
          def payload(i: Int) = (s"writer-$i:" + ("x" * 65536)).getBytes("UTF-8")
          val barrier = new CyclicBarrier(writers + 1)
          @volatile var done = false
          val reader = pool.submit(new Callable[Option[String]] {
            override def call(): Option[String] = {
              barrier.await(10, TimeUnit.SECONDS)
              var bad: Option[String] = None
              while (!done && bad.isEmpty) {
                fx.read(target).foreach { bytes =>
                  val s = new String(bytes, "UTF-8")
                  val ok = (0 until writers).exists(i =>
                    s == new String(payload(i), "UTF-8"))
                  if (!ok) bad = Some(s.take(40) + s"... (${bytes.length} bytes)")
                }
              }
              bad
            }
          })
          val commits = (0 until writers).map { i =>
            pool.submit(new Callable[Boolean] {
              override def call(): Boolean = {
                barrier.await(10, TimeUnit.SECONDS)
                fx.commit(target, payload(i))
              }
            })
          }.map(_.get(30, TimeUnit.SECONDS))
          done = true
          assert(commits.count(identity) === 1)
          assert(reader.get(30, TimeUnit.SECONDS).isEmpty,
            s"round $round: reader saw partial content")
        }
      } finally pool.shutdown()
    }
  }
}

object LogCommitterContractSpec {
  /** Stands in for the HDFS NameNode: rename-exclusivity arbitration is a
    * single metadata-server op, modeled as one JVM-wide lock.
    */
  private val renameLock = new Object
}
