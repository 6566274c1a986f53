package graft
import org.apache.spark.sql.SparkSession

/** Scratch perf harness: time one named query at a given SF, repeated. */
object TimeQ1 {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q03_topk_join_agg"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (args.length > 3 && args(3) == "explain")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    spark.stop()
  }
}
