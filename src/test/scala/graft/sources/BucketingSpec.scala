package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Bucketed co-located join: correctness AND the plan property that is
  * its whole point — no Exchange on either side of the join.
  */
class BucketingSpec extends SparkSpec {

  private val factSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def facts(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    frame(factSchema, Seq.fill(n)(Row(rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong)))
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val before = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("identically-bucketed join: zero exchanges, same result as plain join") {
    val root = tmpDir("bucketed")
    val a = facts(1, 500)
    val b = facts(2, 400)
    Bucketing.writeBucketed(a, "bkt_a", Seq("k"), 8, Some(s"$root/a"))
    Bucketing.writeBucketed(b, "bkt_b", Seq("k"), 8, Some(s"$root/b"))
    // force the join strategy decision away from broadcast so the test
    // demonstrates the co-located SMJ (the 100 TB fact-fact shape)
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = Bucketing.colocatedJoin(spark, "bkt_a", "bkt_b", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      val expected = a.join(b, Seq("k")).count()
      assert(joined.count() === expected)
    }
  }

  test("mismatched bucket counts still join correctly (planner re-shuffles one side)") {
    val root = tmpDir("bucketed_mis")
    Bucketing.writeBucketed(facts(3, 300), "bkt_c", Seq("k"), 8, Some(s"$root/c"))
    Bucketing.writeBucketed(facts(4, 300), "bkt_d", Seq("k"), 4, Some(s"$root/d"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = Bucketing.colocatedJoin(spark, "bkt_c", "bkt_d", Seq("k"))
      val expected = facts(3, 300).join(facts(4, 300), Seq("k")).count()
      assert(joined.count() === expected)
    }
  }
}
