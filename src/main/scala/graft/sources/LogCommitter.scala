package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single atomicity primitive under the versioned-table layer: publish
  * manifest `content` at `target` iff no other writer got there first.
  * Everything else in [[ParquetTable]] (snapshot isolation, time travel,
  * merge retries) is built on this one put-if-absent, so swapping the
  * implementation is all an object-store deployment needs — the same
  * factoring as Delta's `LogStore`.
  *
  * Contract:
  *   - MUST be atomic: a concurrent reader sees either no file or the full
  *     content, never a partial write.
  *   - MUST be exclusive: of N concurrent committers of the same `target`,
  *     exactly one returns true; the rest return false (and the caller
  *     retries onto the next version number).
  */
trait LogCommitter {
  def commit(fs: FileSystem, target: Path, content: Array[Byte]): Boolean
}

/** Default: write a temp file, then one atomic rename. Correct on HDFS and
  * local FS, where rename is atomic and refuses an existing destination.
  * NOT safe on plain S3 (rename = copy+delete, last-writer-wins): deploy
  * there with a CAS committer instead — conditional PUT (`If-None-Match`)
  * where the store supports it, or an external lock/CAS service (the
  * DynamoDB pattern Delta uses for S3) — implementing this same trait.
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
