package graft.operators

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10.0)), (2L, Some(-5.0)), (3L, None), (4L, Some(2.0))
  ).toDF("id", "v")

  test("report: per-rule counts, rates, gates; null predicate counts as fail") {
    val r = Expectations.check(df, Seq(
      ("ids_positive", "id > 0", 1.0),
      ("v_positive", "v > 0", 0.9),     // 2/4 pass (null + negative fail)
      ("v_present", "v IS NOT NULL", 0.5)))
      .orderBy("rule_idx")
      .as[(Int, String, Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(r(0) == ((1, "ids_positive", 4L, 4L, 1.0, 1.0, true)))
    assert(r(1) == ((2, "v_positive", 4L, 2L, 0.5, 0.9, false)))
    assert(r(2) == ((3, "v_present", 4L, 3L, 0.75, 0.5, true)))
  }

  test("single scan for all rules") {
    val plan = Expectations.check(df, Seq(
      ("a", "id > 0", 1.0), ("b", "v > 0", 0.5), ("c", "id < 100", 0.5)))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length +
      "Scan ExistingRDD".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
  }

  test("enforce throws naming the first broken rule; passes return the report") {
    val e = intercept[IllegalStateException] {
      Expectations.enforce(df, Seq(("v_positive", "v > 0", 0.9)))
    }
    assert(e.getMessage.contains("v_positive") && e.getMessage.contains("0.5"))
    assert(Expectations.enforce(df, Seq(("ids", "id > 0", 1.0))).count() == 1L)
  }

  test("empty frame passes every rule (rate defined as 1.0)") {
    val empty = df.filter("id < 0")
    val r = Expectations.check(empty, Seq(("any", "v > 0", 1.0))).head()
    assert(r.getDouble(4) == 1.0 && r.getBoolean(6))
  }
}
