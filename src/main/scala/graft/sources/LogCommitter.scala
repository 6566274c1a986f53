package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single atomicity primitive under the versioned-table layer: publish
  * manifest `content` at `target` iff no other writer got there first.
  * Everything else in [[ParquetTable]] (snapshot isolation, time travel,
  * merge retries) is built on this one put-if-absent, so swapping the
  * implementation is all an object-store deployment needs — the same
  * factoring as Delta's `LogStore` (the reference configures
  * `S3SingleDriverLogStore` for exactly this, reference:
  * terraform/glue-job/main.tf:38).
  *
  * Contract:
  *   - MUST be atomic: a concurrent reader sees either no file or the full
  *     content, never a partial write.
  *   - MUST be exclusive: of N concurrent committers of the same `target`,
  *     exactly one returns true; the rest return false (and the caller
  *     retries onto the next version number).
  *
  * Conformance: LogCommitterContractSpec runs a reusable battery (N-writer
  * race, reject-second-commit, no-partial-reads) over every shipped
  * committer AND an in-memory conditional-PUT fake. Deploying on an object
  * store is therefore: implement this trait with the store's conditional
  * PUT (`If-None-Match: *` on S3/GCS/ABFS) or an external CAS (the DynamoDB
  * pattern Delta uses where conditional PUT is unavailable), add a fixture
  * to the contract spec, pass the battery.
  */
trait LogCommitter {
  def commit(fs: FileSystem, target: Path, content: Array[Byte]): Boolean
}

/** Default committer: dispatches on the filesystem scheme so each deployment
  * gets the strongest primitive its store offers —
  * `file` → [[HardLinkCasCommitter]] (POSIX link(2) put-if-absent),
  * anything else → [[RenameCommitter]] (atomic no-replace rename on HDFS).
  * Plain S3 satisfies neither contract; deploy there with a conditional-PUT
  * or external-CAS committer implementing this same trait.
  */
object DefaultCommitter extends LogCommitter {
  override def commit(fs: FileSystem, target: Path, content: Array[Byte]): Boolean =
    if (fs.getScheme == "file") HardLinkCasCommitter.commit(fs, target, content)
    else RenameCommitter.commit(fs, target, content)
}

/** Write a temp file, then one rename. Atomicity holds everywhere rename is
  * atomic; EXCLUSIVITY holds only on HDFS, whose rename refuses an existing
  * destination at the NameNode. On local FS, Hadoop's
  * `RawLocalFileSystem.rename` delegates to `File.renameTo` → POSIX
  * rename(2), which silently REPLACES an existing destination — two racing
  * writers of the same version can both return true and one manifest is
  * lost, so local deployments must use [[HardLinkCasCommitter]] instead
  * (the [[DefaultCommitter]] does). NOT safe on plain S3 either (rename =
  * copy+delete, last-writer-wins): deploy there with a CAS committer —
  * conditional PUT (`If-None-Match`) where the store supports it, or an
  * external lock/CAS service (the DynamoDB pattern Delta uses for S3).
  */
object RenameCommitter extends LogCommitter {
  override def commit(fs: FileSystem, target: Path, content: Array[Byte]): Boolean = {
    fs.mkdirs(target.getParent)
    val tmp = new Path(target.getParent, s".tmp_commit_${System.nanoTime()}")
    val out = fs.create(tmp, false)
    try out.write(content)
    finally out.close()
    if (fs.rename(tmp, target)) true
    else { fs.delete(tmp, false); false }
  }
}

/** Put-if-absent for LOCAL filesystems: stage the full content in a temp
  * file in the target's directory, then publish with
  * `Files.createLink(target, tmp)`. POSIX link(2) fails atomically with
  * EEXIST when the target exists — the kernel, not a check-then-act in user
  * space, arbitrates the race — so of N concurrent committers exactly one
  * returns true, and any reader of `target` sees the complete staged bytes
  * (the link IS the fully-written inode; there is no moment where `target`
  * names partial content). The temp file is always removed: on the winner
  * the data survives under `target` (hard link), on losers nothing is
  * published.
  *
  * Local (`file:` scheme) paths only — this is the committer that makes the
  * versioned-table ACID claim actually hold in tests and single-node
  * deployments, and the concrete proof of the [[LogCommitter]] contract
  * (see LogCommitterSpec: N racing threads, exactly one winner).
  */
object HardLinkCasCommitter extends LogCommitter {
  override def commit(fs: FileSystem, target: Path, content: Array[Byte]): Boolean = {
    val uri = fs.makeQualified(target).toUri
    require(uri.getScheme == null || uri.getScheme == "file",
      s"HardLinkCasCommitter is local-FS only, got scheme ${uri.getScheme}")
    val t = Paths.get(uri.getPath)
    Files.createDirectories(t.getParent)
    val tmp = Files.createTempFile(t.getParent, ".tmp_commit_", "")
    try {
      Files.write(tmp, content)
      try { Files.createLink(t, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }
}
