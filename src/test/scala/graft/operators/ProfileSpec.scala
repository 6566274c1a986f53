package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("c")),
    (None, Some("a")), (Some(5L), Some("b"))
  ).toDF("id", "s")

  test("exact tier: counts, nulls, distincts, min/max per column") {
    val p = Profile.profile(df, Seq("id", "s")).orderBy("col_name").collect()
    val byCol = p.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(byCol("id") == ((5L, 1L, 3L, "1", "5")))
    assert(byCol("s") == ((5L, 1L, 3L, "a", "c")))
  }

  test("single job: all columns profiled in one aggregation pass") {
    // one explode over one 1-row aggregate — no per-column scan: the
    // physical plan contains exactly one scan of the input
    val plan = Profile.profile(df, Seq("id", "s")).queryExecution.executedPlan.toString
    val scans = "Scan ExistingRDD".r.findAllIn(plan).length +
      "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected one input scan, got $scans:\n$plan")
  }

  test("approx tier (100 TB path): no Expand, HLL within rsd of exact") {
    val big = spark.range(0, 20000)
      .select((col("id") % 1000).as("k"), col("id").as("v"))
    val exact = Profile.profile(big, Seq("k", "v"))
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    val approx = Profile.profile(big, Seq("k", "v"), approxDistinct = true, rsd = 0.02)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    for ((c, ex) <- exact) {
      val ap = approx(c).toDouble
      assert(math.abs(ap - ex) / ex < 0.1, s"$c: approx $ap vs exact $ex")
    }
    val plan = Profile.profile(big, Seq("k", "v"), approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx tier must not Expand:\n$plan")
  }
}
