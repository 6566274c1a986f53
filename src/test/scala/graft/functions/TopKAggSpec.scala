package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Ann

class TopKAggSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("__cos", DoubleType, nullable = false)))

  /** 2000 scored rows over 4 queries across 8 partitions — partial
    * buffers MUST serialize + merge, exercising every TopKAgg path.
    */
  private def scored() = {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 2000).map { i =>
      Row((i % 4).toLong, i.toLong, rnd.nextDouble())
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
  }

  test("top_k agg equals the window-rank formulation exactly") {
    val df = scored()
    
    val agg = invokeRank(df, 7)
    val win = Ann.topKWindow(df, 7)
    val a = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val w = win.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a === w)
    assert(a.size === 28) // 4 queries × 7
  }

  private def invokeRank(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val m = Ann.getClass.getDeclaredMethod("rankTopK",
      classOf[org.apache.spark.sql.DataFrame], classOf[Int])
    m.setAccessible(true)
    m.invoke(Ann, df, Int.box(k)).asInstanceOf[org.apache.spark.sql.DataFrame]
  }

  test("top_k handles ties deterministically (score desc, id asc)") {
    val rows = Seq(
      Row(1L, 10L, 0.5), Row(1L, 3L, 0.5), Row(1L, 7L, 0.5), Row(1L, 1L, 0.9))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = invokeRank(df, 3).collect()
      .sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq === Seq((1L, 1), (3L, 2), (7L, 3))) // 0.9 first, then ties by id
  }

  test("top_k with fewer rows than k returns all, ranked") {
    val rows = Seq(Row(1L, 5L, 0.2), Row(1L, 6L, 0.8))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = invokeRank(df, 10).collect().sortBy(_.getInt(3))
    assert(out.map(_.getLong(1)).toSeq === Seq(6L, 5L))
  }
}
