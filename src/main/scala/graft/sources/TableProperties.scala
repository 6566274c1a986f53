package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table properties — Delta's `TBLPROPERTIES` tier: free-form key/value
  * metadata on a table, plus the one property this engine ENFORCES:
  *
  *   `graft.appendOnly = true` (Delta's `delta.appendOnly`) — every
  *   row-mutating verb (DELETE / UPDATE / MERGE in all tiers / APPLY
  *   CHANGES / purge) refuses; appends, inserts, OPTIMIZE / compact
  *   (content-preserving rewrites) and reads are untouched. The
  *   immutability contract audit/compliance pipelines pin on their raw
  *   ingest tables.
  *
  * Storage: `<table>/_graft_properties`, the [[Constraints]] file
  * format (key\tvalue per line, temp+rename replace). DDL is
  * last-writer-wins like the other DDL files; clones carry properties
  * (Delta clones them too).
  */
object TableProperties {

  private val FileName = "_graft_properties"

  /** The enforced immutability property. */
  val AppendOnlyKey = "graft.appendOnly"

  private def filePath(table: String) = new Path(table, FileName)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** All properties, insertion order. Empty for no file. */
  def list(spark: SparkSession, table: String): Seq[(String, String)] = {
    val f = filePath(table)
    val hfs = fs(spark, f)
    if (!hfs.exists(f)) Nil
    else {
      val len = hfs.getFileStatus(f).getLen.toInt
      val buf = new Array[Byte](len)
      val in = hfs.open(f)
      try in.readFully(0, buf)
      finally in.close()
      new String(buf, "UTF-8").linesIterator.filter(_.nonEmpty).map { line =>
        val i = line.indexOf('\t')
        (line.substring(0, i), line.substring(i + 1))
      }.toSeq
    }
  }

  def get(spark: SparkSession, table: String, key: String): Option[String] =
    list(spark, table).collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v
    }

  private def write(
      spark: SparkSession, table: String, props: Seq[(String, String)]): Unit = {
    val f = filePath(table)
    val hfs = fs(spark, f)
    if (props.isEmpty) { hfs.delete(f, false); return }
    val tmp = new Path(table, s"._graft_properties.tmp${System.nanoTime()}")
    val out = hfs.create(tmp, true)
    try out.write(props.map { case (k, v) => s"$k\t$v" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!hfs.rename(tmp, f)) {
      hfs.delete(f, false)
      require(hfs.rename(tmp, f), s"TBLPROPERTIES DDL: rename failed at $f")
    }
  }

  /** Set (upsert) properties. Keys/values must not contain control
    * characters (the line format).
    */
  def set(spark: SparkSession, table: String, props: Map[String, String]): Unit = {
    props.foreach { case (k, v) =>
      require(k.nonEmpty && !(k + v).exists(c => c == '\n' || c == '\r' || c == '\t'),
        s"TBLPROPERTIES: key/value must be non-empty and free of control chars ('$k')")
    }
    val cur = list(spark, table).filterNot { case (k, _) =>
      props.keys.exists(_.equalsIgnoreCase(k))
    }
    write(spark, table, cur ++ props.toSeq)
  }

  /** Unset properties; missing keys are ignored (Delta's UNSET IF EXISTS
    * behavior — and its plain UNSET never throws on missing keys either).
    */
  def unset(spark: SparkSession, table: String, keys: Seq[String]): Unit =
    write(spark, table, list(spark, table).filterNot { case (k, _) =>
      keys.exists(_.equalsIgnoreCase(k))
    })

  /** Clone carry-over, like [[Constraints.copy]]. */
  private[sources] def copy(spark: SparkSession, from: String, to: String): Unit = {
    val props = list(spark, from)
    if (props.nonEmpty) write(spark, to, props)
  }

  /** Refuses when `graft.appendOnly = true` — called by every
    * row-mutating verb before any work.
    */
  private[sources] def requireNotAppendOnly(
      spark: SparkSession, table: String, verb: String): Unit =
    require(!get(spark, table, AppendOnlyKey).exists(_.equalsIgnoreCase("true")),
      s"$verb: $table has $AppendOnlyKey = true — row mutations are refused " +
        "(UNSET the property to mutate)")
}
