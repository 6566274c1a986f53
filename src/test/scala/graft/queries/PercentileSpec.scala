package graft.queries

import graft.SparkSpec

/** Bounds contract for the approx percentile tier (the 100 TB default —
  * see the q44 memory contract in ParityQueries): at the bench scale
  * factor, every approx quantile must land within a small relative error
  * of the exact tier. DuckDB can't replay Spark's t-digest, so this spec
  * IS the correctness gate for the approx tier.
  */
class PercentileSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"

  test("approx_percentile tracks exact percentiles within 0.5% at sf0.1") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"bench testdata missing at $sfDir")
    val exact = ParityQueries.queries("q44_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> Seq(1, 2, 3, 4).map(r.getDouble)).toMap
    val approx = ParityQueries.approxPercentiles(spark, sfDir)
      .collect().map(r => r.getString(0) -> Seq(1, 2, 3, 4).map(r.getDouble)).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, exactPs) <- exact; (e, a) <- exactPs.zip(approx(flag))) {
      val relErr = math.abs(a - e) / math.abs(e)
      assert(relErr <= 0.005,
        s"group $flag: approx $a vs exact $e (rel err $relErr)")
    }
  }

  test("approx tier aggregates partially (mergeable map-side state)") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"bench testdata missing at $sfDir")
    // partial_approx_percentile on the map side is what makes the state
    // bounded AND mergeable — the shuffle carries digests, not values
    val plan = ParityQueries.approxPercentiles(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_approx_percentile"), plan.take(2000))
  }
}
