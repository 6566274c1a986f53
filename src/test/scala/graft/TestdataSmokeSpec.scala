package graft

/** Smoke gate against the REAL harness testdata.
  *
  * Every other suite builds its own fixtures, so a schema drift in
  * /root/testdata (e.g. events.ts changing physical type between testdata
  * generations) is invisible to `sbt test` and only surfaces in the
  * driver's end-of-round run — costing a full round. This spec closes that
  * blind spot: for every `SparkEntry.queries` entry it forces full
  * analysis + optimization against sf0.001 and asserts the schema is
  * non-empty. Analysis is milliseconds per query; no job is executed here
  * beyond whatever side-effecting setup a query's builder performs itself
  * (the driver's own warmup pass proves full execution fits in seconds).
  *
  * Gated: if the testdata directory is absent/unreadable (e.g. running the
  * suite outside the harness sandbox) every test is canceled, not failed.
  */
class TestdataSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean = {
    val d = new java.io.File(sfDir)
    d.isDirectory && new java.io.File(d, "lineitem.parquet").exists()
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"analyzes on real testdata: $name") {
      assume(available, s"$sfDir not readable — skipping testdata smoke")
      val df = fn(spark, sfDir)
      // analyzed catches resolution/type errors (the r5 events regression
      // died here); optimizedPlan additionally runs the rule pipeline.
      assert(df.queryExecution.optimizedPlan.schema.nonEmpty,
        s"$name produced an empty schema")
    }
  }

  test("flagship entry analyzes on real testdata") {
    assume(available, s"$sfDir not readable — skipping testdata smoke")
    assert(SparkEntry.entry(spark).queryExecution.optimizedPlan.schema.nonEmpty)
  }
}
