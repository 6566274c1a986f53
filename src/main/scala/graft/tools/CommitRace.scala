package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.ParquetTable

/** Worker main for the MULTI-PROCESS commit-race check
  * (MultiJvmCommitRaceSpec): the in-JVM races (ConcurrentMergeSpec,
  * LogCommitterContractSpec) prove the OCC semantics between threads,
  * but the CAS claim — hard-link put-if-absent on the version file —
  * is about SEPARATE writers with separate JVMs, separate Hadoop
  * FileSystem instances and no shared locks. This main is one such
  * writer: it spin-waits on a start file (so two JVMs begin their
  * merge storm together after both have paid SparkSession startup),
  * then lands `nOps` merges against the shared table, each a fresh
  * version. Even ops also update a CONTESTED row in the shared
  * partition `s` (cross-process recompute path); odd ops touch only
  * this worker's own partition (cross-process rebase path).
  *
  * Exit 0 ⟺ every op committed; any lost update, torn manifest, or
  * OCC failure (10 exhausted attempts) throws and exits nonzero.
  * Prints `RACE_OK worker=<id> ops=<n>` for the spec to parse.
  */
object CommitRace {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("p", StringType, nullable = false),
    StructField("v", StringType, nullable = false)))

  def main(args: Array[String]): Unit = {
    val Array(path, idS, nOpsS) = args.take(3)
    val workerId = idS.toInt
    val nOps = nOpsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val start = new java.io.File(path + ".start")
    val deadline = System.currentTimeMillis() + 120000
    while (!start.exists()) {
      require(System.currentTimeMillis() < deadline,
        s"CommitRace worker $workerId: start file never appeared")
      Thread.sleep(50)
    }

    val mode = args.lift(3).getOrElse("merge")
    (0 until nOps).foreach { i =>
      mode match {
        case "merge" =>
          val own = Row(1000 * workerId + i, s"w$workerId", s"w$workerId-$i")
          val rows = if (i % 2 == 0) Seq(own, Row(1, "s", s"w$workerId-$i"))
                     else Seq(own)
          val upd = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema)
          ParquetTable.merge(spark, path, upd, Seq("id"), Seq("p"))
        case "replace" =>
          // full-image replace: last writer wins EXPLICITLY; the race
          // invariant is that every committed version is exactly ONE
          // worker's untorn image on its own fresh version number
          val img = spark.createDataFrame(
            spark.sparkContext.parallelize(
              Seq(Row(workerId, "s", s"w$workerId-$i")), 1), schema)
          val v = ParquetTable.atomicReplace(spark, path, img, Nil)
          require(v > 0, s"atomicReplace returned $v without a txn marker")
        case "maintain" =>
          // table MAINTENANCE racing the other worker's merges — the
          // classic lakehouse lost-update: compact/OPTIMIZE derive a
          // full image from the head they read, so a merge committing
          // under the rewrite must force a recompute, never be erased
          // by a stale image republished onto a later version. Alternate
          // both full-image maintenance verbs; each commits exactly one
          // version (retries recompute, they never double-commit).
          if (i % 2 == 0) ParquetTable.compact(spark, path)
          else { ParquetTable.optimize(spark, path, Seq("id")); () }
        case other => sys.error(s"CommitRace: unknown mode $other")
      }
    }
    println(s"RACE_OK worker=$workerId ops=$nOps")
    spark.stop()
  }
}
