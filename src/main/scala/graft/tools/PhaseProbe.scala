// Scratch profiler (optimization rounds): replay a heavy scenario query
// phase by phase with a wall timer + job/stage counts per phase, so the
// expensive operator inside a multi-commit scenario is named instead of
// guessed. Usage:
//   java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
//     graft.tools.PhaseProbe <scenario> <sfDir> [reps]
package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PhaseProbe {

  private val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val jobLog = java.util.Collections.synchronizedList(
    new java.util.ArrayList[(Int, Long, Long, String)]())

  def main(args: Array[String]): Unit = {
    val scenario = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cores = sys.env.getOrElse("PHASE_PROBE_CORES", "32")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.broadcastTimeout", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        val names = js.stageInfos.map(_.name.takeWhile(_ != '+')).distinct
          .mkString(" | ")
        starts.put(js.jobId, (js.time, names)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, names) =>
          jobLog.add((je.jobId, t0, je.time, names))
        }; ()
      }
    })
    for (r <- 1 to reps) {
      println(s"== $scenario rep$r")
      run(spark, scenario, d)
    }
    spark.stop()
  }

  private def phase[T](name: String)(body: => T): T = {
    jobLog.clear()
    val j0 = jobCount.get()
    val t0 = System.nanoTime()
    val out = body
    val t = (System.nanoTime() - t0) / 1e9
    println(f"  $name%-28s $t%7.2f s  jobs=${jobCount.get() - j0}")
    if (sys.env.contains("PHASE_PROBE_JOBS")) {
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      jobLog.asScala.toSeq.sortBy(_._2).foreach { case (id, s, e, names) =>
        println(f"      job $id%3d ${(e - s) / 1000.0}%6.2f s  ${names.take(110)}")
      }
    }
    out
  }

  private def run(spark: SparkSession, scenario: String, d: String): Unit = {
    import graft.operators.StatsSketch
    import graft.sources.ParquetTable
    val l = graft.queries.Tables.lineitem(spark, d)
    val pk = Seq("l_orderkey", "l_linenumber")
    scenario match {
      case "q148" =>
        val cols = Seq("l_partkey", "l_suppkey", "l_returnflag")
        val root = java.nio.file.Files.createTempDirectory("graft_pp148").toString
        val table = root + "/t"; val sk = root + "/sketch"
        phase("merge v1 (evens)") {
          ParquetTable.merge(spark, table, l.filter(col("l_orderkey") % 2 === 0), pk)
        }
        phase("analyze full v1") { StatsSketch.analyze(spark, table, cols, sk) }
        phase("merge v2 cdf (odds)") {
          ParquetTable.merge(spark, table, l.filter(col("l_orderkey") % 2 =!= 0), pk, cdf = true)
        }
        phase("update v3 cdf (%4)") {
          ParquetTable.update(spark, table, col("l_orderkey") % 4 === 0,
            Map("l_suppkey" -> (col("l_suppkey") + lit(1000000))), cdf = true)
        }
        phase("dv delete v4 cdf (%8)") {
          ParquetTable.deleteVectors(spark, table, col("l_orderkey") % 8 === 0, cdf = true)
        }
        phase("analyzeIncremental") { StatsSketch.analyzeIncremental(spark, table, pk, sk) }
        phase("estimate+count") {
          StatsSketch.estimate(spark, sk)
            .withColumn("exact", lit(StatsSketch.isExact(spark, sk)))
            .orderBy(col("column")).count()
        }
      case "q145" =>
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
        val root = java.nio.file.Files.createTempDirectory("graft_pp145").toString
        val table = root + "/t"; val sk = root + "/sketch"
        phase("merge v1 (evens)") {
          ParquetTable.merge(spark, table, l.filter(col("l_orderkey") % 2 === 0), pk)
        }
        phase("analyze full v1") { StatsSketch.analyze(spark, table, cols, sk) }
        phase("merge v2 (odds)") {
          ParquetTable.merge(spark, table, l.filter(col("l_orderkey") % 2 =!= 0), pk)
        }
        phase("analyzeIncremental") { StatsSketch.analyzeIncremental(spark, table, pk, sk) }
        phase("estimate+count") { StatsSketch.estimate(spark, sk).orderBy(col("column")).count() }
      case "q149" =>
        val cols = Seq("l_partkey", "l_suppkey", "l_returnflag")
        val root = java.nio.file.Files.createTempDirectory("graft_pp149").toString
        val table = root + "/t"; val sk = root + "/sketch"
        phase("merge v1 (evens)") {
          ParquetTable.merge(spark, table, l.filter(col("l_orderkey") % 2 === 0), pk)
        }
        phase("analyze full v1") { StatsSketch.analyze(spark, table, cols, sk) }
        phase("merge v2 (%4 remap)") {
          ParquetTable.merge(spark, table, l.filter(col("l_orderkey") % 4 === 0)
            .withColumn("l_suppkey", col("l_suppkey") + lit(1000000)), pk)
        }
        phase("dv delete (%8)") {
          ParquetTable.deleteVectors(spark, table, col("l_orderkey") % 8 === 0)
        }
        phase("analyzeIncremental") { StatsSketch.analyzeIncremental(spark, table, pk, sk) }
        phase("analyze full v4") { StatsSketch.analyze(spark, table, cols, sk) }
        phase("estimate+count") { StatsSketch.estimate(spark, sk).orderBy(col("column")).count() }
      case other => sys.error(s"unknown scenario $other")
    }
  }
}
