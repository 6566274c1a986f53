package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch perf harness: time one named query at a given SF, repeated,
  * with per-stage durations/task counts (SPARK_GRAFT_STAGES=1).
  */
object TimeQ1 {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q03_topk_join_agg"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          if (ms.exists(_ > 300)) {
            val tm = si.taskMetrics
            println(f"    stage ${si.stageId}%3d: wall=${ms.get / 1000.0}%7.2f s  " +
              f"tasks=${si.numTasks}%4d  cpuSum=${tm.executorCpuTime / 1e9}%7.2f s  " +
              f"runSum=${tm.executorRunTime / 1000.0}%7.2f s  " +
              f"gc=${tm.jvmGCTime / 1000.0}%6.2f s  " +
              f"deser=${tm.executorDeserializeTime / 1000.0}%6.2f s")
          }
        }
      })
    graft.tools.ShuffleBytes.install(spark)
    for (i <- 1 to reps) {
      val m = graft.tools.ShuffleBytes.mark(spark)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      val t = (System.nanoTime() - t0) / 1e9
      // bytes beside wall on every probe: a plan shift (lost broadcast,
      // surplus exchange) shows here even when the page cache hides it
      val (w, r) = graft.tools.ShuffleBytes.since(spark, m)
      println(f"$name rep$i: $t%.2f s ($n rows, " +
        f"shuffle ${w / 1048576.0}%.1f MB w / ${r / 1048576.0}%.1f MB r)")
    }
    if (args.length > 3 && args(3) == "explain")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    spark.stop()
  }
}
