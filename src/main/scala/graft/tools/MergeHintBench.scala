package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.StatsSketch
import graft.sources.ParquetTable

/** Bench pair for the stats-informed merge planner (VERDICT r12 item 1):
  * the SAME merge on the SAME table, once with the ANALYZE-driven key
  * hint enabled and once with the kill switch off, on the skewed case
  * the planner exists for — a CDC-shaped update feed (many events, few
  * keys) whose static size estimate forbids the broadcast that its
  * cardinality earns.
  *
  * Usage: MergeHintBench [targetRows] [events] [keys] [reps]
  * Prints one JSON line with steady-state seconds per mode.
  *
  * Why the win survives AQE: AQE can only convert the anti-join to
  * broadcast AFTER both shuffle map sides are written — the target's
  * map-side shuffle write (the whole table) has already happened. The
  * stats hint removes that exchange from the plan entirely; at 100 TB
  * the exchange IS the cost.
  */
object MergeHintBench {

  def main(args: Array[String]): Unit = {
    val targetRows = args.lift(0).map(_.toInt).getOrElse(600000)
    val events = args.lift(1).map(_.toInt).getOrElse(600000)
    val keys = args.lift(2).map(_.toInt).getOrElse(2000)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-merge-hint-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("merge_hint_bench").toString
    // target: a wide-ish high-entropy row (~200 B payload) so the
    // rewrite is IO-realistic
    val base = spark.range(targetRows.toLong).select(
      col("id"),
      concat_ws(" ", sha2(col("id").cast("string"), 256),
        sha2(concat(lit("x"), col("id")), 256),
        sha2(concat(lit("y"), col("id")), 256)).as("payload"),
      (col("id") % 97).as("bucket"))
    // CDC feed: `events` rows over `keys` distinct ids, LANDED AS
    // PARQUET (how a CDC batch actually arrives) with a PER-EVENT
    // high-entropy payload (every event is a distinct observation) — the
    // key-column scan's static estimate then sits well above the 10 MB
    // broadcast threshold, so without the planner Catalyst refuses the
    // broadcast the 2k-key cardinality earns.
    spark.range(events.toLong).select(
      (col("id") % keys).as("id"),
      sha2(concat(lit("updated_"), col("id")), 256).as("payload"),
      (col("id") % keys % 97).as("bucket"))
      .write.mode("overwrite").parquet(s"$work/cdc")
    val cdc = spark.read.parquet(s"$work/cdc")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // shuffle-write accounting: locally a 32-thread page-cache shuffle
    // hides most of the exchange's cost, so wall seconds UNDERSTATE the
    // decision's value — the bytes NOT shuffled are the metric that
    // scales to a real cluster (disk + network + replication)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    })

    // one table per mode (the merge is a pure update — all CDC keys
    // exist — so the table image size is invariant across reps)
    def run(mode: String, hints: Boolean): (Seq[Double], Long) = {
      spark.conf.set(ParquetTable.StatsHintsConf, hints.toString)
      val path = s"$work/t_$mode"
      ParquetTable.atomicReplace(spark, path, base, Nil)
      StatsSketch.analyze(spark, path, Seq("id"), ParquetTable.statsDir(path))
      val times = (0 to reps).map { i =>
        if (i == 1) { Thread.sleep(2000); shuffleBytes.set(0) } // post-warmup
        timed { ParquetTable.merge(spark, path, cdc, Seq("id"),
          mergeOnRead = Some(false)) }
      }.drop(1) // first rep is the codegen/JIT warmup
      Thread.sleep(2000) // listener bus drain
      (times, shuffleBytes.get)
    }

    val (off, offShuffle) = run("off", hints = false)
    val (on, onShuffle) = run("on", hints = true)
    def stat(xs: Seq[Double]) = f"""{"min":${xs.min}%.3f,"med":${
      xs.sorted.apply(xs.size / 2)}%.3f}"""
    println(s"""{"bench":"merge_hint","targetRows":$targetRows,""" +
      s""""events":$events,"keys":$keys,"reps":$reps,""" +
      s""""hints_off":${stat(off)},"hints_on":${stat(on)},""" +
      f""""speedup_med":${off.sorted.apply(off.size / 2) /
        on.sorted.apply(on.size / 2)}%.2f,""" +
      s""""shuffle_mb_off":${offShuffle / 1048576},""" +
      s""""shuffle_mb_on":${onShuffle / 1048576}}""")
    spark.stop()
  }
}
