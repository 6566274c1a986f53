package graft.queries

import graft.SparkSpec

/** Bounds contract for the HLL distinct-count tier (the 100 TB default —
  * see q59's scaladoc): DuckDB can't replay Spark's HyperLogLog++, so
  * this spec IS the correctness gate for the approx tier, pinned against
  * the exact oracle-checked query at the bench scale factor.
  */
class DistinctCountSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"

  test("approx_count_distinct tracks exact counts within 3×rsd at sf0.1") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"bench testdata missing at $sfDir")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> Seq(r.getLong(1), r.getLong(2))).toMap
    val exact = asMap(ParityQueries.queries("q59_distinct_counts")(spark, sfDir))
    val approx = asMap(ParityQueries.approxDistinct(spark, sfDir, rsd = 0.01))
    assert(approx.keySet === exact.keySet)
    for ((flag, es) <- exact; (e, a) <- es.zip(approx(flag))) {
      val relErr = math.abs(a - e).toDouble / e
      assert(relErr <= 0.03, // 3 standard deviations at rsd = 0.01
        s"group $flag: approx $a vs exact $e (rel err $relErr)")
    }
  }

  test("approx tier aggregates partially (mergeable HLL sketches)") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"bench testdata missing at $sfDir")
    // partial sketches on the map side: the shuffle carries HLL state,
    // never per-distinct-value rows (exact count DISTINCT expands those)
    val plan = ParityQueries.approxDistinct(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_approx_count_distinct"), plan.take(2000))
  }
}
