package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The size-guarded broadcast hint: hints when the optimizer's estimate
  * fits the cap, silently degrades to a shuffle join when it doesn't.
  */
class BroadcastingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** Parquet-backed so the optimizer has a REAL size estimate — frames
    * over bare RDDs report defaultSizeInBytes (Long.MaxValue) and the
    * guard correctly refuses to broadcast an unknown size (asserted
    * below).
    */
  private def df(n: Int) = {
    val path = tmpDir("bcast") + "/t"
    frame(schema, (1 to n).map(i => Row(i.toLong, i.toLong * 10)))
      .write.parquet(path)
    spark.read.parquet(path)
  }

  test("small frame gets the hint → broadcast join") {
    val plan = df(1000)
      .join(Broadcasting.broadcastIfSmall(df(10)), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("unknown size (no file stats) is never broadcast by the guard") {
    val unknown = frame(schema, Seq(Row(1L, 1L))) // ExistingRDD: size unknown
    val est = unknown.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est > BigInt(Long.MaxValue) / 2) // defaultSizeInBytes sentinel
    val before = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = df(100).join(Broadcasting.broadcastIfSmall(unknown), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("frame over the cap is left unhinted → planner picks a shuffle join") {
    val big = df(5000)
    val guarded = Broadcasting.broadcastIfSmall(big, maxBytes = 1L)
    val before = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = df(1000).join(guarded, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
