package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  // fact: 20k rows keyed 0..999; dim selects 10 keys
  private lazy val fact = spark.range(0, 20000)
    .select((col("id") % 1000).as("fk"), col("id").as("payload"))
  private lazy val dim = spark.range(0, 1000)
    .filter(col("id") % 100 === 0).select(col("id").as("pk"), (col("id") * 2).as("attr"))

  test("result is exactly the plain join (false positives eliminated)") {
    val bloomed = BloomJoin.join(fact, dim, "fk", "pk", expectedItems = 1000L)
      .select("fk", "payload", "pk", "attr")
    val plain = fact.join(dim, col("fk") === col("pk"))
      .select("fk", "payload", "pk", "attr")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    assert(bloomed.count() == 20 * 10) // 20 payload rows per surviving key
  }

  test("pre-filter reduces the probe side before the join") {
    val bytes = BloomJoin.buildFilter(dim, "pk", expectedItems = 1000L)
    val kept = fact.filter(BloomJoin.mightContain(bytes, col("fk"))).count()
    // 10 of 1000 keys are real; allow bloom FPs but demand a real cut
    assert(kept >= 200 && kept < 2000, s"bloom kept $kept of 20000")
  }

  test("no false negatives on adversarial key values") {
    val keys = Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 42L).toDF("k")
    val bytes = BloomJoin.buildFilter(keys, "k", expectedItems = 10L)
    val kept = keys.filter(BloomJoin.mightContain(bytes, col("k"))).count()
    assert(kept == 5L)
  }

  test("probe stays codegen'd: might_contain sits inside WholeStageCodegen") {
    val bytes = BloomJoin.buildFilter(dim, "pk", expectedItems = 1000L)
    val plan = fact.filter(BloomJoin.mightContain(bytes, col("fk")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    assert("""\*\(\d+\) Filter might_contain""".r.findFirstIn(plan).isDefined, plan)
  }
}
