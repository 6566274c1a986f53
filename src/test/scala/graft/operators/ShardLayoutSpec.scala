package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class ShardLayoutSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType)))
  private def ids(n: Int) = frame(schema, (0 until n).map(i => Row(i.toLong)))

  test("deterministic: same seed same layout; input order irrelevant") {
    val a = ShardLayout.assign(ids(200), "id", nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val shuffled = frame(schema,
      new scala.util.Random(7).shuffle((0 until 200).toList)
        .map(i => Row(i.toLong)))
    val b = ShardLayout.assign(shuffled, "id", nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(a === b)
  }

  test("different seeds give different permutations") {
    val a = ShardLayout.assign(ids(100), "id", 4, seed = "s1").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val b = ShardLayout.assign(ids(100), "id", 4, seed = "s2").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(a !== b)
  }

  test("positions are dense 1..k per shard and shards are balanced") {
    val rows = ShardLayout.assign(ids(400), "id", nShards = 4).collect()
      .map(r => (r.getInt(1), r.getInt(2)))
    val byShard = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byShard.keySet === Set(0, 1, 2, 3))
    byShard.foreach { case (s, ps) =>
      assert(ps === (1 to ps.size).toArray.toSeq, s"shard $s positions")
    }
    // hash balance: no shard under half or over double the fair share
    val sizes = byShard.values.map(_.size)
    assert(sizes.min > 50 && sizes.max < 200, byShard.view.mapValues(_.size).toMap)
  }
}
