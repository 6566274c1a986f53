// Scratch profiler (not part of the library build — compiled ad hoc):
// run one query and print every Spark JOB with wall, stage count, task
// count — separating cluster work from driver/fs gaps. Usage:
//   java -cp "target/scala-2.13/classes:tools_classes:/opt/spark/jars/*" \
//     graft.tools.JobProbe <queryName> <sfDir> [reps]
package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Long, Long, String, Int)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (js.time, desc, js.stageInfos.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc, nst) =>
          done.add((je.jobId, t0, je.time, desc, nst))
        }
      }
    })
    for (r <- 1 to reps) {
      done.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      import scala.jdk.CollectionConverters._
      val ds = done.asScala.toSeq.sortBy(_._2)
      val jobSum = ds.map(j => j._3 - j._2).sum / 1000.0
      println(f"== $name rep$r: wall=$wall%.2f s, jobs=${ds.size}, jobSum=$jobSum%.2f s, gap=${wall - jobSum}%.2f s ($n rows)")
      if (r == reps) {
        var prevEnd = 0L
        ds.foreach { case (id, s, e, desc, nst) =>
          val gap = if (prevEnd == 0) 0.0 else (s - prevEnd) / 1000.0
          prevEnd = e
          println(f"  job $id%3d ${(e - s) / 1000.0}%6.2f s  (gap before: $gap%5.2f s, stages=$nst) ${desc.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
