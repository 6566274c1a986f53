package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, not}

/** CHECK constraints on graft tables — Delta's
  * `ALTER TABLE … ADD CONSTRAINT name CHECK (expr)` tier (the reference
  * gets this from Delta; the lakehouse's write-side data-quality gate,
  * complementing the row-routing [[graft.operators.Validator]] which
  * quarantines instead of failing).
  *
  * Storage: one small text file `<table>/_graft_constraints`
  * (`name\texprSql` per line), replaced atomically via temp+rename on
  * DDL. DDL is last-writer-wins (like any catalog property update);
  * writers read the constraint set once per commit.
  *
  * Enforcement: every versioned commit validates the DATA DIR IT JUST
  * WROTE before publishing the manifest ([[ParquetTable]] calls
  * [[validateWritten]] between the parquet write and the CAS commit).
  * Reading back the written files costs one extra scan of the commit's
  * new data — never a recompute of the producing plan, never a scan of
  * untouched data — and zero when the table has no constraints (probe =
  * one file-existence check). A violation deletes the orphan dir and
  * fails the commit; concurrent readers never see it (the manifest was
  * never published). Rows already in the table are validated by
  * induction: [[add]] scans existing data once, Delta-style, and every
  * later commit validated its own writes.
  *
  * Restore is metadata-only and can republish data that predates a
  * constraint — same as Delta, where RESTORE does not re-validate
  * either; drop the constraint or re-add it (re-validating) after
  * restoring across an ADD CONSTRAINT boundary if in doubt.
  */
object Constraints {

  private val FileName = "_graft_constraints"

  private def filePath(table: String) = new Path(table, FileName)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** The table's constraints, oldest first. Empty for no file. */
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

  private def write(
      spark: SparkSession, table: String, cs: Seq[(String, String)]): Unit = {
    val f = filePath(table)
    val hfs = fs(spark, f)
    if (cs.isEmpty) { hfs.delete(f, false); return }
    val tmp = new Path(table, s"._graft_constraints.tmp${System.nanoTime()}")
    val out = hfs.create(tmp, true)
    try out.write(cs.map { case (n, e) => s"$n\t$e" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // replace-by-rename first: on local FS rename(2) replaces atomically,
    // so concurrent readers always see a complete file. HDFS refuses an
    // existing destination, so fall back to delete+rename there — a
    // small no-constraints window on HDFS DDL only, never on commits.
    if (!hfs.rename(tmp, f)) {
      hfs.delete(f, false)
      require(hfs.rename(tmp, f), s"constraint DDL: rename failed at $f")
    }
  }

  /** Add a CHECK constraint. Existing data must already satisfy it
    * (one scan, Delta semantics); the name must be new and
    * `[A-Za-z0-9_]+`. NULL expression results pass, like SQL CHECK.
    */
  def add(spark: SparkSession, table: String, name: String, exprSql: String): Unit = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"constraint name must be [A-Za-z0-9_]+, got '$name'")
    // the storage format is line-per-constraint with a tab separator —
    // control characters in the expression would corrupt it for every
    // later reader (and every later commit's validation)
    require(!exprSql.exists(c => c == '\n' || c == '\r' || c == '\t'),
      s"constraint $name: CHECK expression must not contain newlines or tabs")
    val cur = list(spark, table)
    require(!cur.exists(_._1.equalsIgnoreCase(name)),
      s"constraint $name already exists on $table")
    if (ParquetTable.exists(spark, table)) {
      val bad = firstViolation(ParquetTable.read(spark, table), Seq(name -> exprSql))
      require(bad.isEmpty,
        s"cannot add constraint $name: existing row violates CHECK ($exprSql): " +
          bad.get)
    }
    write(spark, table, cur :+ (name -> exprSql))
  }

  /** Drop a constraint by name (case-insensitive); missing names throw. */
  def drop(spark: SparkSession, table: String, name: String): Unit = {
    val cur = list(spark, table)
    require(cur.exists(_._1.equalsIgnoreCase(name)),
      s"no constraint named $name on $table " +
        s"(have: ${cur.map(_._1).mkString(", ") match { case "" => "none"; case s => s }})")
    write(spark, table, cur.filterNot(_._1.equalsIgnoreCase(name)))
  }

  /** Copy the constraint set from one table to another (SHALLOW CLONE
    * carries constraints, like Delta clones table properties).
    */
  private[sources] def copy(spark: SparkSession, from: String, to: String): Unit = {
    val cs = list(spark, from)
    if (cs.nonEmpty) write(spark, to, cs)
  }

  /** First violating row rendered for an error message, if any. Probes
    * ALL constraints in one pass first (the green path costs one scan);
    * only a failure pays per-constraint probes to name the culprit.
    */
  private def firstViolation(
      df: DataFrame, cs: Seq[(String, String)]): Option[String] = {
    if (cs.isEmpty) return None
    // SQL CHECK semantics: NULL passes, so violation = (expr) IS FALSE
    def violated(e: String) = expr(e).isNotNull && not(expr(e))
    val combined = cs.map(c => violated(c._2)).reduce(_ || _)
    val hit = df.filter(combined).limit(1).collect()
    if (hit.isEmpty) None
    else {
      val culprit = cs.find { case (_, e) =>
        df.filter(violated(e)).limit(1).collect().nonEmpty
      }
      Some(s"${hit.head} (constraint ${culprit.map(_._1).getOrElse(cs.head._1)})")
    }
  }

  /** Validate a frame about to be written outside the versioned-commit
    * path (plain appends). No-op without constraints.
    */
  private[sources] def validateFrame(
      spark: SparkSession, table: String, df: DataFrame): Unit = {
    val cs = list(spark, table)
    val bad = firstViolation(df, cs)
    require(bad.isEmpty,
      s"write to $table violates CHECK constraint: ${bad.getOrElse("")}")
  }

  /** Validate the data dir a commit just wrote, before its manifest is
    * published. Reads the files back (partition columns recovered from
    * the dir layout); throws on the first violating row, leaving the
    * commit unpublished. No-op without constraints.
    */
  private[sources] def validateWritten(
      spark: SparkSession, table: String, dataDir: String): Unit = {
    val cs = list(spark, table)
    if (cs.isEmpty) return
    val bad = firstViolation(spark.read.parquet(dataDir), cs)
    require(bad.isEmpty,
      s"commit to $table violates CHECK constraint: ${bad.getOrElse("")}")
  }
}
