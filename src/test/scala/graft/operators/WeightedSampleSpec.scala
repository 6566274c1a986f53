package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 400L).map { id =>
    // ids 1..200 weight 1, 201..400 weight 20 — heavy items should
    // dominate the sample
    (if (id <= 200) "g" else "g", id, if (id <= 200) 1.0 else 20.0)
  }.toDF("grp", "id", "w")

  test("heavier weights are sampled far more often") {
    val sampled = WeightedSample.topKPerGroup(rows, "grp", "id", "w", k = 50)
      .select("id").as[Long].collect()
    val heavy = sampled.count(_ > 200L)
    assert(heavy > 35, s"expected heavy items to dominate, got $heavy/50")
  }

  test("deterministic: same seed → same sample; different seed → different") {
    def ids(seed: String) = WeightedSample
      .topKPerGroup(rows, "grp", "id", "w", k = 20, seed = seed)
      .select("id").as[Long].collect().toSet
    assert(ids("a") == ids("a"))
    assert(ids("a") != ids("b"))
  }

  test("sample is without replacement and exactly k per group (or group size)") {
    val multi = Seq(("a", 1L, 5.0), ("a", 2L, 1.0), ("a", 3L, 1.0),
      ("b", 4L, 1.0)).toDF("grp", "id", "w")
    val out = WeightedSample.topKPerGroup(multi, "grp", "id", "w", k = 2)
      .select("grp", "id").as[(String, Long)].collect()
    assert(out.map(_._2).distinct.length == out.length) // no repeats
    assert(out.count(_._1 == "a") == 2 && out.count(_._1 == "b") == 1)
  }

  test("uniform is in (0,1) so every key is finite") {
    val u = rows.select(WeightedSample.uniformOf(col("id"), "s").as("u"))
      .agg(min("u"), max("u")).head()
    assert(u.getDouble(0) > 0.0 && u.getDouble(1) < 1.0)
  }
}
