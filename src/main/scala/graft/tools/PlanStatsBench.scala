package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.StatsSketch
import graft.sources.{ParquetTable, PlanStats}

/** Bench pair for the read-path plan statistics (VERDICT r13 item 1):
  * the SAME aggregate-then-join query over the SAME ANALYZEd table,
  * once with the statistics attach enabled and once with the kill
  * switch off, under the CBO conf the reference's query layer sets
  * (glue_etl.py:407-408). The shape is the classic NDV unlock: a
  * rollup of a big dim joins a bigger fact — statically the rollup is
  * sized from its INPUT (megabytes, refuses broadcast → the fact
  * shuffles), while its true output is NDV(keys) rows (kilobytes,
  * broadcasts → the fact never moves).
  *
  * Usage: PlanStatsBench [factRows] [dimRows] [keys] [reps]
  * Prints one JSON line with steady-state seconds AND shuffle bytes
  * per mode — bytes are the at-scale metric (see ShuffleBytes; AQE's
  * runtime rescue only converts the join after the fact's map side is
  * already written, and locally the page cache hides that cost).
  */
object PlanStatsBench {

  def main(args: Array[String]): Unit = {
    val factRows = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val dimRows = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val keys = args.lift(2).map(_.toInt).getOrElse(200)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-stats-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // the reference's query-layer opt-in; the bench measures what the
      // statistics buy a session that HAS opted in
      .config("spark.sql.cbo.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("plan_stats_bench").toString
    val dimPath = s"$work/dim"
    val factPath = s"$work/fact"
    // dim: high-entropy payload so file bytes sit far above the
    // broadcast threshold; its k-rollup is `keys` rows
    ParquetTable.atomicReplace(spark, dimPath,
      spark.range(dimRows).select(
        (col("id") % keys).as("k"),
        sha2(col("id").cast("string"), 256).as("payload")), Nil)
    ParquetTable.atomicReplace(spark, factPath,
      spark.range(factRows).select(
        (col("id") % keys).as("k"),
        col("id").as("amount")), Nil)
    StatsSketch.analyze(spark, dimPath, Seq("k"), ParquetTable.statsDir(dimPath))

    ShuffleBytes.install(spark)

    def query() = ParquetTable.read(spark, factPath).join(
      ParquetTable.read(spark, dimPath).groupBy("k")
        .agg(count(lit(1)).as("dim_n")), "k")
      .agg(sum("amount"), sum("dim_n"))

    def run(mode: String, attach: Boolean): (Seq[Double], Long, String) = {
      spark.conf.set(PlanStats.Conf, attach.toString)
      val plan = query().queryExecution.sparkPlan.toString
      val join =
        if (plan.contains("BroadcastHashJoin")) "broadcast"
        else if (plan.contains("SortMergeJoin")) "sort-merge"
        else "other"
      var bytes = 0L
      val times = (0 to reps).map { _ =>
        val m = ShuffleBytes.mark(spark)
        val t0 = System.nanoTime()
        query().head()
        val t = (System.nanoTime() - t0) / 1e9
        bytes = ShuffleBytes.since(spark, m)._1
        t
      }.drop(1) // first rep is codegen/JIT warmup
      (times, bytes, join)
    }

    val (off, offBytes, offJoin) = run("off", attach = false)
    val (on, onBytes, onJoin) = run("on", attach = true)
    def stat(xs: Seq[Double]) = f"""{"min":${xs.min}%.3f,"med":${
      xs.sorted.apply(xs.size / 2)}%.3f}"""
    println(s"""{"bench":"plan_stats","factRows":$factRows,""" +
      s""""dimRows":$dimRows,"keys":$keys,"reps":$reps,""" +
      s""""stats_off":${stat(off)},"stats_on":${stat(on)},""" +
      s""""join_off":"$offJoin","join_on":"$onJoin",""" +
      f""""speedup_med":${off.sorted.apply(off.size / 2) /
        on.sorted.apply(on.size / 2)}%.2f,""" +
      s""""shuffle_mb_off":${offBytes / 1048576},""" +
      s""""shuffle_mb_on":${onBytes / 1048576}}""")
    spark.stop()
  }
}
