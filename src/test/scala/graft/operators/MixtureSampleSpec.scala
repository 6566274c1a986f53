package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class MixtureSampleSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("grp", StringType, nullable = false),
    StructField("id", LongType, nullable = false)))

  private def docs(rows: (String, Long)*) =
    frame(schema, rows.map(r => Row(r._1, r._2)))

  test("quotas follow the weights with the scarcest group as bottleneck") {
    val df = docs((1L to 10L).map(("a", _)) ++ (1L to 4L).map(("b", _)): _*)
    // W=4; N = min(floor(10*4/3)=13, floor(4*4/1)=16) = 13
    // quota_a = floor(3*13/4) = 9, quota_b = floor(1*13/4) = 3
    val out = MixtureSample.toWeights(df, "grp", "id", Map("a" -> 3L, "b" -> 1L))
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 9L, "b" -> 3L))
  }

  test("a weighted group with zero corpus rows makes the mixture unserveable") {
    val df = docs((1L to 10L).map(("a", _)): _*)
    val out = MixtureSample.toWeights(df, "grp", "id",
      Map("a" -> 5L, "missing" -> 1L))
    assert(out.count() === 0L) // N = 0: no sample can honor the mixture
  }

  test("selection is deterministic and drops unweighted groups") {
    val df = docs((1L to 8L).map(("a", _)) ++ (1L to 8L).map(("b", _)) ++
      (1L to 5L).map(("junk", _)): _*)
    def run() = MixtureSample.toWeights(df, "grp", "id", Map("a" -> 1L, "b" -> 1L))
      .select("grp", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val r1 = run()
    assert(r1 === run()) // hash-rank, no RNG
    assert(!r1.exists(_._1 == "junk"))
    assert(r1.count(_._1 == "a") === r1.count(_._1 == "b")) // equal weights
  }
}
