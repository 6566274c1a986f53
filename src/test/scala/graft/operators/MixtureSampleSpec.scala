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

  test("toWeights scans the corpus once: quota side is a local relation") {
    val df = docs((1L to 20L).map(("a", _)) ++ (1L to 10L).map(("b", _)): _*)
    val out = MixtureSample.toWeights(df, "grp", "id", Map("a" -> 2L, "b" -> 1L))
    // the guard's count aggregation ran ONCE, eagerly; the sample plan
    // joins a collected local quota frame, so executing it must not
    // re-run the count scan — i.e. no Aggregate survives in the plan
    val aggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.isEmpty, s"quota count aggregation re-runs in the sample plan:\n" +
      out.queryExecution.optimizedPlan.treeString)
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

  test("hot group trips the maxGroupRows guard, naming the group") {
    val df = docs((1L to 50L).map(("hot", _)) ++ (1L to 5L).map(("b", _)): _*)
    val e = intercept[IllegalArgumentException] {
      MixtureSample.toWeights(df, "grp", "id", Map("hot" -> 1L, "b" -> 1L),
        maxGroupRows = 20L)
    }
    assert(e.getMessage.contains("grp=hot") && e.getMessage.contains("50"))
    assert(e.getMessage.contains("toWeightsApprox"))
    // raising the cap is the explicit opt-in — same data then flows
    val out = MixtureSample.toWeights(df, "grp", "id",
      Map("hot" -> 1L, "b" -> 1L), maxGroupRows = Long.MaxValue)
    assert(out.count() > 0)
  }

  test("toWeightsApprox: no window in the plan, quotas hit within noise") {
    val df = docs((1L to 2000L).map(("a", _)) ++ (1L to 1000L).map(("b", _)): _*)
    val out = MixtureSample.toWeightsApprox(df, "grp", "id",
      Map("a" -> 1L, "b" -> 1L))
    // the scale path must not contain a Window (that is its whole point)
    assert(!out.queryExecution.optimizedPlan.toString.contains("Window"))
    // exact quotas: N = min(2000*2/1, 1000*2/1)=2000 → 1000 per group;
    // binomial noise at n=1000 is ~±3σ ≈ ±47 — allow a generous band
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a") - 1000L) < 150, s"a: ${counts("a")}")
    assert(math.abs(counts("b") - 1000L) < 150, s"b: ${counts("b")}")
    // deterministic replay
    assert(out.collect().map(_.toString).sorted.toSeq ===
      MixtureSample.toWeightsApprox(df, "grp", "id", Map("a" -> 1L, "b" -> 1L))
        .collect().map(_.toString).sorted.toSeq)
    // an unserveable mixture stays honestly empty on the approx path too
    assert(MixtureSample.toWeightsApprox(df, "grp", "id",
      Map("a" -> 1L, "nope" -> 1L)).count() === 0L)
  }

  test("temperatureWeights: floor(c^alpha), every group >= 1, alpha endpoints") {
    val df = docs((1L to 900L).map(("big", _)) ++ (1L to 10L).map(("small", _)) ++
      Seq(("tiny", 1L)): _*)
    // alpha 0.5: sqrt(900)=30, sqrt(10)=3.16→3, sqrt(1)=1
    assert(MixtureSample.temperatureWeights(df, "grp", 0.5) ===
      Map("big" -> 30L, "small" -> 3L, "tiny" -> 1L))
    // alpha 1: natural proportions
    assert(MixtureSample.temperatureWeights(df, "grp", 1.0) ===
      Map("big" -> 900L, "small" -> 10L, "tiny" -> 1L))
    // alpha 0: fully equalized
    assert(MixtureSample.temperatureWeights(df, "grp", 0.0) ===
      Map("big" -> 1L, "small" -> 1L, "tiny" -> 1L))
    intercept[IllegalArgumentException] {
      MixtureSample.temperatureWeights(df, "grp", 1.5)
    }
  }

  test("toTemperature == toWeights over the derived weights (exact row set)") {
    val df = docs((1L to 400L).map(("en", _)) ++ (1L to 100L).map(("de", _)) ++
      (1L to 25L).map(("fr", _)): _*)
    val viaDerived = MixtureSample.toTemperature(df, "grp", "id", 0.5)
      .collect().map(_.toString).sorted.toSeq
    val direct = MixtureSample.toWeights(df, "grp", "id",
        Map("en" -> 20L, "de" -> 10L, "fr" -> 5L)) // sqrt of 400/100/25
      .collect().map(_.toString).sorted.toSeq
    assert(viaDerived === direct && viaDerived.nonEmpty)
    // alpha 0.5 lifts the low-resource share above natural proportions:
    // natural fr share = 25/525 ≈ 4.8%; sampled share = 5/35 ≈ 14%
    val counts = MixtureSample.toTemperature(df, "grp", "id", 0.5)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    assert(counts("fr") / total > 0.10, s"fr share not lifted: $counts")
  }
}
